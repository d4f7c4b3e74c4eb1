package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators — the consolidation / selection layer that sits
  * downstream of [[Dedup]] and [[TextAnalysis]] in a training-data pipeline:
  * turn near-dup PAIRS into clusters with one surviving canonical document,
  * draw reproducible per-stratum samples, select documents greedily under a
  * per-stratum token budget, and scrub PII spans.
  *
  * All randomness is md5-derived (engine-portable, partition-independent);
  * all fractions/ordering keys are rounded identically on both engines so the
  * DuckDB oracles are bit-faithful.
  */
object Curation {

  /** Consolidate near-duplicate PAIRS into clusters and pick one canonical
    * document per cluster (the minimum doc_id — the standard deterministic
    * survivor rule). Every document appears in the output: documents touching
    * no pair are their own singleton cluster.
    *
    * Scale shape: the cluster labels come from
    * [[ConnectedComponents.auto]] (driver union-find below 2 M edges — the
    * pair table after LSH verification is tiny relative to the corpus —
    * label-prop above); the label join and the cluster-size aggregation are
    * one shuffle each on doc_id/canon_id. Nothing is quadratic: the pair
    * table is whatever the upstream dedup emitted, never all-pairs.
    *
    * @param docs  corpus with `doc_id`
    * @param pairs near-dup pairs `(doc_a, doc_b)` (e.g. [[Dedup.minhashLsh]])
    * @return (doc_id, canon_id, cluster_size, is_canonical) — `is_canonical`
    *         marks the survivor a dedup pipeline would keep.
    */
  def dedupClusters(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("doc_a").cast("long").as("src"),
      col("doc_b").cast("long").as("dst"))
    val comps = ConnectedComponents.auto(edges)
      .select(col("node").as("doc_id"), col("component"))
    val labeled = docs.select(col("doc_id").cast("long").as("doc_id"))
      .join(comps, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("canon_id"))
    val sizes = labeled.groupBy("canon_id").agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, "canon_id")
      .select(col("doc_id"), col("canon_id"),
        col("cluster_size").cast("long").as("cluster_size"),
        (col("doc_id") === col("canon_id")).as("is_canonical"))
  }

  /** md5-derived uniform priority in [0, 1) for a document id — the
    * reproducible stand-in for `rand()`: stable across runs, partitionings
    * and engines. First 12 hex chars = 48 bits, ample for ordering. */
  def hashPriority(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit("|" + salt))), 1, 12), 16, 10)
      .cast("long").cast("double") / lit((1L << 48).toDouble)

  /** Deterministic per-stratum quota sample: the `k` documents with the
    * smallest md5 priority in each stratum. Reproducible (same input → same
    * sample, any cluster size) and uniform within each stratum. The priority
    * is the md5 hex PREFIX itself — fixed-length lowercase hex orders
    * identically to its numeric value on every engine, so no base conversion
    * enters the reproducibility contract.
    *
    * Scale shape: one shuffle on the stratum key; the per-stratum sort is
    * rank-truncated at k. For rate-based sampling at scale prefer
    * [[hashPriority]] `< rate` directly — a ZERO-shuffle filter; the quota
    * form exists for exact per-stratum counts (data-mixing recipes). Strata
    * are assumed modest in count but may be any size in rows; a pathological
    * mega-stratum sorts in one task chain — salt-split it upstream if that
    * ever binds.
    *
    * @return (doc_id, stratum, priority, rk) for the k kept docs per stratum.
    */
  def stratifiedSample(docs: DataFrame, strataCol: String, k: Int,
      salt: String = "sample"): DataFrame = {
    val w = Window.partitionBy(col("stratum")).orderBy(col("priority"), col("doc_id"))
    docs.select(col("doc_id").cast("long").as("doc_id"),
        col(strataCol).as("stratum"),
        substring(md5(concat(col("doc_id").cast("string"), lit("|" + salt))), 1, 16)
          .as("priority"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Greedy per-stratum token-budget selection — the "fill each language's
    * share of the training mix with its best documents" primitive. Documents
    * are ranked inside each stratum by quality (desc, doc_id tiebreak) and
    * kept while the running token total stays within `budget`.
    *
    * The running total uses the ROUNDED quality as its ordering key — the
    * exact value both engines agree on bit-for-bit (same contract q37's
    * oracle already proves) — so the cumulative sums are reproducible.
    *
    * Scale shape: one shuffle on the stratum key (the window partition);
    * quality is a pure projection ([[TextAnalysis.qualityScore]]). The
    * cumulative sum is a running frame, not a whole-partition materialization.
    *
    * @param costCol per-document cost column (token or char count)
    * @return every doc with (stratum, quality, cost, cum_cost, selected).
    */
  def tokenBudgetSelect(docs: DataFrame, strataCol: String, costCol: String,
      budget: Long): DataFrame = {
    val quality = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("quality"))
    val w = Window.partitionBy(col("stratum"))
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id").cast("long").as("doc_id"),
        col(strataCol).as("stratum"), col(costCol).cast("long").as("cost"))
      .join(quality, "doc_id")
      .withColumn("cum_cost", sum(col("cost")).over(w).cast("long"))
      .withColumn("selected", col("cum_cost") <= budget)
      .select("doc_id", "stratum", "quality", "cost", "cum_cost", "selected")
  }

  /** PII patterns — deliberately restricted to a regex dialect Java and RE2
    * share (char classes, bounded repetition; no lookaround, no backrefs), so
    * the scrub is reproducible across engines. Redaction order matters and is
    * fixed: URL first (a URL may embed an email-shaped userinfo), then email,
    * then IPv4. */
  val UrlRe = "https?://[a-z0-9._/-]+"
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Detect + redact PII spans (URLs, emails, IPv4) in a text column.
    * Pure projection — zero shuffles; counts are taken BEFORE redaction and
    * in the same fixed order the redaction applies.
    *
    * @return input plus (n_urls, n_emails, n_ipv4, redacted) columns.
    */
  def piiScrub(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = lower(col(textCol))
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(t, UrlRe, "<URL>"),
          EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>")
    df.withColumn("n_urls", regexp_count(t, lit(UrlRe)).cast("long"))
      .withColumn("n_emails",
        regexp_count(regexp_replace(t, UrlRe, "<URL>"), lit(EmailRe)).cast("long"))
      .withColumn("n_ipv4",
        regexp_count(
          regexp_replace(regexp_replace(t, UrlRe, "<URL>"), EmailRe, "<EMAIL>"),
          lit(Ipv4Re)).cast("long"))
      .withColumn("redacted", redacted)
  }
}
