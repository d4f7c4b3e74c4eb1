package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID
  * (stopword-profile heuristic), quality scoring, token counting, and
  * document fingerprinting. Pure column expressions — codegen'd, no UDFs.
  */
object TextAnalysis {

  /** Tiny per-language stopword profiles (n-gram heuristic stand-in). */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "y", "de", "es"),
    "fr" -> Seq("le", "la", "et", "de", "est"))

  /** Language ID: count stopword hits per profile, argmax with deterministic
    * tiebreak (score desc, lang asc); 'und' when no profile scores > 0.
    *
    * Shape: a PURE PROJECTION — the profile table is tiny and static, so each
    * language's occurrence count is a codegen'd `size(filter(...))` over the
    * token array and the argmax is an `array_max` over per-language structs
    * ordered (score, −rank-in-lang-asc). Zero shuffles, zero joins, zero
    * window exchanges; scales as one embarrassing-parallel pass over docs. */
  def langId(docs: DataFrame): DataFrame = {
    val toks = Dedup.tokens(col("text"))
    // struct comparison is lexicographic: max score wins; ties fall to the
    // alphabetically-first language via the negated rank.
    val scored = langProfiles.sortBy(_._1).zipWithIndex.map { case ((l, ws), r) =>
      struct(
        size(filter(toks, t => array_contains(lit(ws.toArray), t))).cast("long").as("score"),
        lit(-r).as("neg_rank"),
        lit(l).as("lang"))
    }
    val best = array_max(array(scored: _*))
    val pred = when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
    docs.select(col("doc_id").cast("long"),
      pred.as("pred_lang"),
      best.getField("score").as("score"),
      (pred === col("lang")).as("is_correct"))
  }

  /** The composite quality score as a single column expression over a text
    * column — `round(score, 6)`, the exact value the q37 oracle locks.
    * Factored out so downstream consumers (e.g. Curation.tokenBudgetSelect)
    * can rank by quality inline instead of joining against [[qualityScore]]'s
    * output — same scan, zero extra shuffles. */
  def qualityExpr(text: Column): Column = {
    val toks = Dedup.tokens(text)
    val nTok = size(toks).cast("long")
    val nChar = length(text).cast("long")
    val stops = lit(langProfiles.flatMap(_._2).distinct.toArray)
    val nStop = size(filter(toks, t => array_contains(stops, t))).cast("long")
    val avgTokLen = (nChar - (nTok - 1)).cast("double") / nTok.cast("double")
    val stopRatio = nStop.cast("double") / nTok.cast("double")
    round(
      least(nTok.cast("double") / 100.0, lit(1.0)) * 0.5 +
        (lit(1.0) - stopRatio) * 0.3 +
        least(avgTokLen / 10.0, lit(1.0)) * 0.2, 6)
  }

  /** Quality features + composite score. All ratios are exact integer
    * divisions in double — deterministic and oracle-portable. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val toks = Dedup.tokens(col("text"))
    val nTok = size(toks).cast("long")
    val nChar = length(col("text")).cast("long")
    val punct = length(regexp_replace(col("text"), "[a-z0-9\\s]", "")).cast("long")
    val stops = lit(TextAnalysis.langProfiles.flatMap(_._2).distinct.toArray)
    val nStop = size(filter(toks, t => array_contains(stops, t))).cast("long")
    val stopRatio = nStop.cast("double") / nTok.cast("double")
    val punctRatio = punct.cast("double") / nChar.cast("double")
    docs.select(
      col("doc_id").cast("long"),
      nTok.as("n_tokens"),
      nChar.as("n_chars"),
      punct.as("n_punct"),
      nStop.as("n_stop"),
      round(stopRatio, 6).as("stop_ratio"),
      round(punctRatio, 6).as("punct_ratio"),
      qualityExpr(col("text")).as("quality"))
  }

  /** Token counting: whitespace tokens, BPE-ish regex tokens, distinct. */
  def tokenStats(docs: DataFrame): DataFrame = {
    val toks = Dedup.tokens(col("text"))
    docs.select(
      col("doc_id").cast("long"),
      size(toks).cast("long").as("n_ws_tokens"),
      regexp_count(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).cast("long")
        .as("n_re_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct"))
  }

  /** Repetition signals in the style of the public Gopher quality filters
    * (Rae et al. 2021, "Scaling Language Models: Methods, Analysis &
    * Insights from Training Gopher", App. A): per document, the share of
    * word-2-gram occurrences captured by the single most frequent 2-gram
    * (top-n-gram fraction) and the share of word-3-gram occurrences whose
    * gram occurs more than once (duplicate-n-gram fraction). High values
    * flag boilerplate and degenerate repetition.
    *
    * Fractions are emitted as integer parts-per-million (`x * 1e6 DIV n`)
    * so the oracle compare is bit-exact with no float rounding contract.
    *
    * Note on thresholds: the Gopher paper's published cutoffs are CHARACTER
    * fractions (duplicate share over 5–10-grams, top-gram share over
    * 2–4-grams); these columns are OCCURRENCE fractions over 2-/3-grams
    * only, so paper threshold values (e.g. top-2-gram 0.20) do NOT transfer
    * to the `*_ppm` columns directly — calibrate cutoffs on this metric.
    *
    * Shape: exactly two shuffles. Gram START POSITIONS are exploded and each
    * gram is assembled from `element_at` on the token array — the full gram
    * arrays are never materialized, so per-row memory stays O(tokens) even
    * for pathological multi-million-token documents. `explode_outer` keeps
    * gram-less docs (fewer than n tokens) as a single null-gram row, so every
    * doc_id reaches the final aggregate with zero counts and no re-join
    * against the source table. Both aggregates partial-combine map-side;
    * the second reuses nothing wider than (doc_id).
    */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val toks = Dedup.tokens(col("text"))
    def stream(n: Int): DataFrame = docs
      .select(col("doc_id"), toks.as("ts"))
      .select(col("doc_id"), col("ts"),
        explode_outer(when(size(col("ts")) >= n,
          sequence(lit(1), size(col("ts")) - (n - 1)))).as("i"))
      .select(col("doc_id"), lit(n).as("n"),
        when(col("i").isNotNull,
          concat_ws(" ", (0 until n).map(j => element_at(col("ts"), col("i") + j)): _*))
          .as("g"))
    val counts = stream(2).unionByName(stream(3))
      .groupBy("doc_id", "n", "g").agg(count(lit(1)).as("c"))
    val valid = col("g").isNotNull
    val folded = counts.groupBy("doc_id").agg(
      sum(when(col("n") === 2 && valid, col("c")).otherwise(0L)).as("tot2"),
      max(when(col("n") === 2 && valid, col("c"))).as("top2"),
      sum(when(col("n") === 3 && valid, col("c")).otherwise(0L)).as("tot3"),
      sum(when(col("n") === 3 && valid && col("c") > 1, col("c")).otherwise(0L)).as("dup3"))
    folded.select(col("doc_id").cast("long").as("doc_id"),
      col("tot2").cast("long").as("n_2grams"),
      coalesce(col("top2"), lit(0L)).cast("long").as("top_2gram_cnt"),
      expr("(coalesce(top2, 0L) * 1000000L) DIV nullif(tot2, 0L)")
        .cast("long").as("top_2gram_ppm"),
      col("tot3").cast("long").as("n_3grams"),
      col("dup3").cast("long").as("dup_3gram_cnt"),
      expr("(dup3 * 1000000L) DIV nullif(tot3, 0L)")
        .cast("long").as("dup_3gram_ppm"))
  }

  /** Content fingerprint: md5 prefix of whitespace-normalized lowercase text,
    * plus the fingerprint's corpus frequency (dup-group size). */
  def fingerprint(docs: DataFrame): DataFrame = {
    val norm = trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))
    val fp = docs.select(col("doc_id").cast("long"), substring(md5(norm), 1, 16).as("fp"))
    val w = Window.partitionBy("fp")
    fp.withColumn("n_same", count(lit(1)).over(w).cast("long"))
  }
}
