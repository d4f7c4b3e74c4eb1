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
    * label-prop above); the label join shuffles on doc_id and cluster_size
    * is a count window on the canon_id partition — two shuffles total, no
    * aggregate-then-join-back. Nothing is quadratic: the pair table is
    * whatever the upstream dedup emitted, never all-pairs.
    *
    * @param docs  corpus with `doc_id`
    * @param pairs near-dup pairs `(doc_a, doc_b)` (e.g. [[Dedup.minhashLsh]])
    * @return (doc_id, canon_id, cluster_size, is_canonical) — `is_canonical`
    *         marks the survivor a dedup pipeline would keep.
    */
  def dedupClusters(docs: DataFrame, pairs: DataFrame): DataFrame = {
    // The pair table is usually the output of an expensive join (shingle
    // self-join, LSH verify); materialize it once — auto() walks it twice
    // (size probe + solve) and recomputing a multi-second join per walk
    // would dominate the whole operator.
    val edges = pairs.select(col("doc_a").cast("long").as("src"),
      col("doc_b").cast("long").as("dst")).localCheckpoint()
    val comps = ConnectedComponents.auto(edges)
      .select(col("node").as("doc_id"), col("component"))
    val labeled = docs.select(col("doc_id").cast("long").as("doc_id"))
      .join(comps, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("canon_id"))
    // cluster_size via a count window on the canon_id partition — one
    // shuffle total, vs groupBy + join-back's two.
    val w = Window.partitionBy("canon_id")
    labeled
      .withColumn("cluster_size", count(lit(1)).over(w).cast("long"))
      .select(col("doc_id"), col("canon_id"), col("cluster_size"),
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
    * Scale shape: ONE shuffle total (the stratum window partition). Quality
    * is [[TextAnalysis.qualityExpr]] computed inline on the same scan — no
    * join against a separate quality frame. The cumulative sum is a running
    * frame, not a whole-partition materialization.
    *
    * @param costCol per-document cost column (token or char count)
    * @return every doc with (stratum, quality, cost, cum_cost, selected).
    */
  def tokenBudgetSelect(docs: DataFrame, strataCol: String, costCol: String,
      budget: Long): DataFrame = {
    val w = Window.partitionBy(col("stratum"))
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id").cast("long").as("doc_id"),
        col(strataCol).as("stratum"), col(costCol).cast("long").as("cost"),
        TextAnalysis.qualityExpr(col("text")).as("quality"))
      .withColumn("cum_cost", sum(col("cost")).over(w).cast("long"))
      .withColumn("selected", col("cum_cost") <= budget)
      .select("doc_id", "stratum", "quality", "cost", "cum_cost", "selected")
  }

  /** Weight-proportional sample WITHOUT replacement (Efraimidis–Spirakis,
    * "Weighted random sampling with a reservoir", IPL 2006): each document
    * draws key = u^(1/w) with u uniform; the k largest keys are exactly a
    * weight-proportional sample. u is md5-derived ([[hashPriority]]), so the
    * draw is reproducible across runs, partitionings and engines.
    *
    * Scale shape: the key is a pure projection; the global top-k compiles to
    * TakeOrderedAndProject (per-partition heaps + driver merge of k rows) —
    * NO full sort, no shuffle of the corpus. This is the "sample 10k docs
    * length-proportionally from 100 TB" primitive.
    *
    * The emitted key is rounded to 6; ordering uses the full double. Java and
    * libm `pow` can differ in the last ulp, but a rank flip needs two keys
    * within ~1e-16 — not reachable with md5-spread uniforms at any real k.
    *
    * Non-positive weights are FAILED, not silently mis-sampled: weight = 0
    * would give pow(u, ∞) = 0 (doc never drawn) and weight < 0 keys > 1 that
    * rank first — both corrupt the draw, so they raise instead.
    *
    * @param weightCol strictly positive weight column (char or token count)
    * @return (doc_id, weight, key, rank) for the k sampled docs.
    */
  def weightedSample(docs: DataFrame, weightCol: String, k: Int,
      salt: String = "wsample"): DataFrame = {
    val u = hashPriority(col("doc_id"), salt)
    val key = pow(u, lit(1.0) / col(weightCol).cast("double"))
    docs.select(col("doc_id").cast("long").as("doc_id"),
        col(weightCol).cast("long").as("weight"),
        when(col(weightCol).cast("double") > 0.0, key)
          .otherwise(raise_error(concat(lit(s"weightedSample: non-positive $weightCol for doc_id="),
            col("doc_id").cast("string")))).as("key_full"))
      .orderBy(col("key_full").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("weight"), round(col("key_full"), 6).as("key"),
        (row_number().over(Window.orderBy(col("key_full").desc, col("doc_id"))))
          .cast("long").as("rank"))
  }

  /** Concat-and-chunk sequence packing — the standard LLM pretraining layout:
    * documents are concatenated in doc_id order into one token stream and cut
    * into fixed `seqLen` windows; a document spans packs `pack_first` to
    * `pack_last` starting at `off_in_pack`.
    *
    * Scale shape: the global running offset is a TWO-LEVEL prefix sum — a
    * within-bucket running frame (shuffle on `bucket = doc_id / bucketSize`)
    * plus a bucket-totals prefix (second window over ≤ n/bucketSize rows,
    * broadcast-joined back). No single-partition window ever sees the full
    * corpus; the only whole-dataset ordering is the bucket key itself, which
    * is derived from doc_id, not data. The textbook distributed scan.
    *
    * All outputs are integer-exact — no float in the contract.
    *
    * @param costCol per-document length column (token or char count)
    * @return (doc_id, cost, start_off, pack_first, pack_last, off_in_pack)
    */
  def packSequences(docs: DataFrame, costCol: String, seqLen: Long,
      bucketSize: Long = 4096L): DataFrame = {
    val base = docs.select(col("doc_id").cast("long").as("doc_id"),
      col(costCol).cast("long").as("cost"),
      (col("doc_id").cast("long") / bucketSize).cast("long").as("bucket"))
    val wIn = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = base.withColumn("cum_in", sum(col("cost")).over(wIn))
    val wB = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val offsets = base.groupBy("bucket").agg(sum(col("cost")).as("btot"))
      .withColumn("boff", coalesce(sum(col("btot")).over(wB), lit(0L)))
      .select(col("bucket"), col("boff"))
    within.join(broadcast(offsets), "bucket")
      .select(col("doc_id"), col("cost"),
        (col("boff") + col("cum_in") - col("cost")).as("start_off"),
        (col("boff") + col("cum_in")).as("end_off"))
      .select(col("doc_id"), col("cost"), col("start_off"),
        // integer `div`, not floor(a / b): long→double division loses exact
        // integers past 2^53, and the contract is integer-exact at any offset
        expr(s"start_off div ${seqLen}L").as("pack_first"),
        // last pack touched = (end-1) div L; empty docs stay in pack_first
        greatest(expr(s"(end_off - 1L) div ${seqLen}L"),
          expr(s"start_off div ${seqLen}L")).as("pack_last"),
        (col("start_off") % seqLen).cast("long").as("off_in_pack"))
  }

  /** Benchmark decontamination: flag corpus documents sharing any n-gram
    * with a probe set (eval benchmarks) — the standard "did the training
    * set memorize the test set" check, shingle-exact.
    *
    * Scale shape: probe shingles are DISTINCT and tiny next to the corpus
    * (benchmarks are megabytes; the corpus is the 100 TB side), so they
    * BROADCAST: the corpus-side shingle stream is marked with a broadcast
    * left join — never shuffled — and the only exchange is the final
    * per-document aggregation on doc_id. One shuffle total.
    *
    * @param docs   corpus (doc_id, text)
    * @param probes probe set (doc_id, text) — e.g. eval benchmark docs
    * @param n      shingle width in tokens
    * @return per corpus doc (with ≥1 shingle): total/hit shingle counts,
    *         integer hit_ppm, contamination flag, first matching shingle.
    */
  def contamination(docs: DataFrame, probes: DataFrame, n: Int = 3): DataFrame = {
    val docSh = Dedup.shingles(docs, n)
    val probeSh = Dedup.shingles(probes, n)
      .select(col("shingle")).distinct().withColumn("hit", lit(1))
    docSh.join(broadcast(probeSh), Seq("shingle"), "left")
      .groupBy("doc_id").agg(
        count(lit(1)).cast("long").as("n_shingles"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hits"),
        min(when(col("hit").isNotNull, col("shingle"))).as("first_hit"))
      .select(col("doc_id").cast("long").as("doc_id"),
        col("n_shingles"), col("n_hits"),
        expr("(n_hits * 1000000L) DIV n_shingles").cast("long").as("hit_ppm"),
        (col("n_hits") > 0).as("is_contaminated"),
        col("first_hit"))
  }

  /** PII patterns — deliberately restricted to a regex dialect Java and RE2
    * share (char classes, bounded repetition, the `(?i)` inline flag; no
    * lookaround, no backrefs), so the scrub is reproducible across engines.
    * Matching is case-insensitive against the ORIGINAL text — a scrub pass
    * must not destroy the corpus's casing. Redaction order matters and is
    * fixed: URL first (a URL may embed an email-shaped userinfo), then email,
    * then IPv4. */
  val UrlRe = "(?i)https?://[a-z0-9._/-]+"
  val EmailRe = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Detect + redact PII spans (URLs, emails, IPv4) in a text column.
    * Pure projection — zero shuffles; counts are taken BEFORE redaction and
    * in the same fixed order the redaction applies. Non-PII content is
    * passed through byte-for-byte (case preserved).
    *
    * @return input plus (n_urls, n_emails, n_ipv4, redacted) columns.
    */
  def piiScrub(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
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

  /** SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space, then drop documents
    * whose cosine similarity to another member of the SAME cluster
    * exceeds `threshold`. Clustering first is the whole trick — pairwise
    * work is O(Σ cellᵢ²) within cells instead of all-pairs over the
    * corpus, which is what makes semantic dedup tractable at 100 TB.
    *
    * Determinism (oracle-exact, like [[graft.operators.Similarity.ivfTopK]]):
    * centroids are the first `kCells` corpus vectors by `vec_id`;
    * ties in the nearest-centroid argmin break on the lower cell; the
    * survivor rule is greedy-by-id — a document is a duplicate iff a
    * LOWER-id member of its cell is above threshold (`dup_of` = the
    * smallest such id), so every near-dup group keeps its min-id
    * representative, the same canonical rule the exact/minhash dedup
    * paths use.
    *
    * Scale shape: centroid assignment is a broadcast centroid-TABLE join
    * ([[graft.operators.Similarity.assignCells]] — plan size O(1) in
    * `kCells`, corpus-sized shuffle); the pair search is ONE shuffle of
    * the corpus on the cell id (a self-join on `cell`), never an
    * all-pairs product across cells. Size `kCells` to the corpus with
    * [[graft.operators.Similarity.autoCells]] (k ≈ n/1024; real SemDeDup
    * uses ~10⁵ cells) so per-cell pair work stays O(targetCellSize²) —
    * a fixed small k degrades the self-join toward O((n/k)²).
    *
    * @param kCells number of quantizer cells; pass
    *               `Similarity.autoCells(corpusSize)` at scale
    * @return (vec_id, cell, dup_of, kept): `dup_of` null ⇔ `kept`. */
  def semanticDedup(embeddings: DataFrame, kCells: Int = 16,
      threshold: Double = 0.92): DataFrame = {
    import graft.operators.Similarity.cosine
    val assigned = Similarity.assignCells(embeddings, kCells)
    val dupOf = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("b.vec_id") < col("a.vec_id"))
      .filter(cosine(col("a.embedding"), col("b.embedding")) > threshold)
      .groupBy(col("a.vec_id").as("vec_id"))
      .agg(min(col("b.vec_id")).as("dup_of"))
    assigned.join(dupOf, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        col("dup_of"), col("dup_of").isNull.as("kept"))
  }

  /** Bloom-prefiltered benchmark decontamination — the scale dual of
    * [[contamination]]. That variant broadcasts the probe shingles as a hash
    * join: right for megabyte benchmarks, but a probe set of 10⁹ shingles
    * (every eval suite + held-out split of a frontier run) no longer fits a
    * broadcast HASH relation (~100 B/key) while its BLOOM sketch (~10
    * bits/key) still does.
    *
    * Shape: the sketch is built by Spark's native `BloomFilterAggregate`
    * over `xxhash64(shingle)` (partial-aggregated, merged once — the only
    * driver-held object is the serialized sketch) and probed by the
    * codegen'd `BloomFilterMightContain`, so the 100 TB corpus side is
    * pruned IN THE SCAN PROJECTION, before its only exchange. False
    * positives are removed by an exact join against the probe shingles —
    * but that join now moves only Bloom survivors (true hits + fpp·|corpus
    * shingles|), not the corpus. Output is therefore EXACT; the Bloom is
    * purely an exchange-volume lever.
    *
    * @param docs     corpus (doc_id, text) — the big side
    * @param probes   probe set (doc_id, text) — benchmarks/eval splits
    * @param n        shingle width in tokens
    * @param numBits  sketch size in bits (fpp ≈ 0.6185^(bits/items))
    * @return contaminated docs only: (doc_id, n_hits, first_hit) with
    *         n_hits = distinct probe shingles shared.
    */
  def contaminationBloom(docs: DataFrame, probes: DataFrame, n: Int = 3,
      expectedItems: Long = 1L << 16, numBits: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expr => toExpr}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

    val probeSh = Dedup.shingles(probes, n).select(col("shingle")).distinct()
    val bloomAgg = toCol(new BloomFilterAggregate(
      toExpr(xxhash64(col("shingle"))), Literal(expectedItems), Literal(numBits))
      .toAggregateExpression())
    // The sketch rides a SCALAR SUBQUERY — the same shape Spark's own
    // runtime-Bloom-join injection plans (SPARK-32268): it executes once as
    // a subquery stage and reaches tasks as a runtime value. The previous
    // formulation collected it with head() and embedded the numBits/8-byte
    // array as a plan LITERAL: one extra blocking driver action per run and
    // a 128 KB constant inflating plan text (~530 KB) that is re-compiled
    // every execution. An EMPTY probe set aggregates to a NULL sketch,
    // might_contain(NULL) is NULL, and the filter drops every row — the
    // same zero-row result the old explicit branch returned.
    val bloomSub = ScalarSubquery(
      probeSh.agg(bloomAgg.as("bf")).queryExecution.analyzed)
    val docSh = Dedup.shingles(docs, n)
    val mightContain = toCol(BloomFilterMightContain(
      bloomSub, toExpr(xxhash64(col("shingle")))))
    docSh.filter(mightContain)
      .join(probeSh, Seq("shingle")) // exact verify: kills Bloom false positives
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_hits"),
        min(col("shingle")).as("first_hit"))
      .select(col("doc_id").cast("long").as("doc_id"),
        col("n_hits"), col("first_hit"))
  }

  /** Temperature-scaled domain mixing weights — the standard recipe for
    * balancing a multi-source corpus (sampling share ∝ (token share)^τ,
    * e.g. the multilingual sampling rule of Conneau & Lample 2019 and the
    * domain weights of GPT-3/The Pile): τ = 1 keeps natural proportions,
    * τ → 0 approaches uniform, in between up-samples the tail.
    *
    * Shape: one groupBy over the corpus (map-side combinable counts), then
    * the |groups|-row frame normalizes against its own 1-row total via a
    * broadcast cross join — no window over the corpus, no second corpus
    * scan, no driver collect.
    *
    * @return per group: doc/token counts, natural token_share p, mix_weight
    *         w ∝ p^τ (Σw = 1), and sample_multiplier w/p (the per-doc
    *         up/down-sampling factor a loader would apply).
    */
  def mixtureWeights(docs: DataFrame, groupCol: String = "source",
      tau: Double = 0.7): DataFrame = {
    val grouped = docs.groupBy(col(groupCol).as("grp")).agg(
      count(lit(1)).cast("long").as("n_docs"),
      sum(size(Dedup.tokens(col("text")))).cast("long").as("n_tokens"))
    val totals = grouped.agg(
      sum("n_tokens").cast("double").as("tot_tokens"),
      sum(pow(col("n_tokens").cast("double"), tau)).as("tot_pow"))
    grouped.crossJoin(broadcast(totals))
      .select(col("grp"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens") / col("tot_tokens"), 6).as("token_share"),
        round(pow(col("n_tokens").cast("double"), tau) / col("tot_pow"), 6)
          .as("mix_weight"),
        round(pow(col("n_tokens").cast("double"), tau) / col("tot_pow") /
          (col("n_tokens") / col("tot_tokens")), 6).as("sample_multiplier"))
  }
}
