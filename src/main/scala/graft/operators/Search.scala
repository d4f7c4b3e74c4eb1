package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus ranking for training-data curation: BM25 keyword retrieval over a
  * document table. Curation pipelines use ranked retrieval to pull topical
  * subsets out of a web-scale corpus (e.g. "collect the top-N docs about X
  * for a domain mix"), so the ranking has to run as a distributed scan-side
  * pass, not a search-engine round trip.
  *
  * Scoring is classic Okapi BM25 (Robertson & Zaragoza 2009, "The
  * Probabilistic Relevance Framework: BM25 and Beyond") with the standard
  * `ln(1 + (N - df + 0.5)/(df + 0.5))` idf.
  */
object Search {

  /** BM25 top-k retrieval for one keyword query over (doc_id, text).
    *
    * Scale shape: ONE corpus scan. The tokenize+filter projection collapses
    * each document to (doc_id, dl, query-term hits) — O(|terms|) wide — and
    * that narrow frame is `localCheckpoint`ed, because three downstream
    * branches need it (corpus stats, tf, df) and Spark would otherwise
    * re-scan and RE-TOKENIZE the 100 TB text column once per branch (the
    * first formulation did exactly that — three parquet scans in the plan).
    * The query-term set is a LITERAL array (broadcast by construction), so
    * the exploded token stream is pre-filtered to query terms BEFORE its
    * only exchange — the per-(doc, term) count aggregation moves |hits|
    * rows, not |tokens|, and stays map-side combinable (a window over the
    * term partition would shuffle every hit row to |terms| tasks — the
    * classic low-cardinality skew trap this groupBy avoids). The two-scalar
    * stats frame rides a broadcast cross join (no driver collect), the
    * per-term df frame (≤ |terms| rows) a broadcast hash join, and the
    * final top-k is a TakeOrderedAndProject, never a global sort.
    *
    * Determinism contract (oracle-portable): scores are `round(x, 6)` and
    * the top-k order is (rounded score DESC, doc_id ASC), so the cut line
    * is identical across engines.
    *
    * @param docs  corpus with (doc_id, text)
    * @param terms query keywords (matched against lowercased whitespace
    *              tokens, the [[Dedup.tokens]] convention)
    * @param k     rows to return
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int = 20,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    val termsLit = lit(terms.map(_.toLowerCase).distinct.toArray)
    val toks = Dedup.tokens(col("text"))
    // one scan: per-doc length + the query-term hits only
    val base = docs.select(col("doc_id").cast("long").as("doc_id"),
        size(toks).cast("long").as("dl"),
        filter(toks, t => array_contains(termsLit, t)).as("hits"))
      .filter(col("dl") > 0)
      .localCheckpoint()
    val stats = base.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val tf = base.filter(size(col("hits")) > 0)
      .select(col("doc_id"), col("dl"), explode(col("hits")).as("term"))
      .groupBy("doc_id", "term")
      .agg(first("dl").as("dl"), count(lit(1)).cast("double").as("tf"))
      // feeds two branches (df and the scoring join) whose projections
      // differ, so without materialization the hit explode + aggregate runs
      // twice; the frame is ≤ |matching docs|·|terms| rows — tiny
      .localCheckpoint()
    val df = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
          col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
          .as("w"))
      .groupBy("doc_id")
      .agg(round(sum("w"), 6).as("score"),
        count(lit(1)).cast("long").as("n_terms_hit"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
