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
    * Shape: explode tokens once, broadcast-join the (lang, stopword) table,
    * two groupBys — scales as one pass over the token stream. */
  def langId(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val profile = langProfiles.flatMap { case (l, ws) => ws.map(w => (l, w)) }
      .toDF("cand_lang", "stopword")
    val toks = docs.select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("tok"))
    val scores = toks.join(broadcast(profile), col("tok") === col("stopword"))
      .groupBy("doc_id", "cand_lang").agg(count(lit(1)).as("score"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("cand_lang"))
    val best = scores.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("cand_lang").as("pred_lang"), col("score"))
    docs.select(col("doc_id"), col("lang"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id").cast("long"),
        coalesce(col("pred_lang"), lit("und")).as("pred_lang"),
        coalesce(col("score"), lit(0L)).cast("long").as("score"),
        (coalesce(col("pred_lang"), lit("und")) === col("lang")).as("is_correct"))
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
    val avgTokLen = (nChar - (nTok - 1)).cast("double") / nTok.cast("double")
    val stopRatio = nStop.cast("double") / nTok.cast("double")
    val punctRatio = punct.cast("double") / nChar.cast("double")
    val score =
      least(nTok.cast("double") / 100.0, lit(1.0)) * 0.5 +
        (lit(1.0) - stopRatio) * 0.3 +
        least(avgTokLen / 10.0, lit(1.0)) * 0.2
    docs.select(
      col("doc_id").cast("long"),
      nTok.as("n_tokens"),
      nChar.as("n_chars"),
      punct.as("n_punct"),
      nStop.as("n_stop"),
      round(stopRatio, 6).as("stop_ratio"),
      round(punctRatio, 6).as("punct_ratio"),
      round(score, 6).as("quality"))
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
    * Shape: the two gram streams are built as per-row array projections
    * (no join), exploded into one tagged stream, then counted with a
    * single (doc_id, n, gram) hash aggregate and folded per doc — two
    * shuffles, both partial-aggregated map-side, embarrassingly parallel
    * over documents at corpus scale.
    */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val toks = Dedup.tokens(col("text"))
    def grams(n: Int): Column =
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
        .otherwise(array().cast("array<string>"))
    val stream = Seq(2, 3).map(n =>
        docs.select(col("doc_id"), lit(n).as("n"), explode(grams(n)).as("g")))
      .reduce(_ unionByName _)
    val counts = stream.groupBy("doc_id", "n", "g").agg(count(lit(1)).as("c"))
    val per = counts.groupBy("doc_id", "n").agg(
      sum("c").as("tot"), max("c").as("top"),
      sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup"))
    def pick(n: Int, c: String) = max(when(col("n") === n, col(c)))
    val folded = per.groupBy("doc_id").agg(
      pick(2, "tot").as("tot2"), pick(2, "top").as("top2"),
      pick(3, "tot").as("tot3"), pick(3, "dup").as("dup3"))
    docs.select(col("doc_id").cast("long").as("doc_id"))
      .join(folded, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("tot2"), lit(0L)).cast("long").as("n_2grams"),
        coalesce(col("top2"), lit(0L)).cast("long").as("top_2gram_cnt"),
        expr("(coalesce(top2, 0L) * 1000000L) DIV nullif(coalesce(tot2, 0L), 0L)")
          .cast("long").as("top_2gram_ppm"),
        coalesce(col("tot3"), lit(0L)).cast("long").as("n_3grams"),
        coalesce(col("dup3"), lit(0L)).cast("long").as("dup_3gram_cnt"),
        expr("(coalesce(dup3, 0L) * 1000000L) DIV nullif(coalesce(tot3, 0L), 0L)")
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
