package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Exact (hash-groupBy), n-gram Jaccard, MinHash+LSH, and SimHash. All hash
  * primitives are built on `md5` hex strings so results are portable across
  * engines (the DuckDB correctness oracle evaluates the same algorithm) and
  * deterministic across runs/partitionings — a requirement the usual
  * `xxhash64`-style seeds wouldn't violate, but engine-specific hash
  * functions would.
  *
  * Scale design:
  *  - Everything is expressed as joins/groupBys over a (doc_id, shingle)
  *    long table: one shuffle per stage, map-side combinable.
  *  - The pair-generating self-join on shingles is the classic skew trap at
  *    100 TB: a stop-shingle appearing in k docs contributes k² pairs.
  *    [[shingles]] therefore supports `maxDf` document-frequency filtering
  *    (standard in MinHash dedup pipelines); LSH banding bounds candidate
  *    pairs to docs agreeing on a full band, which is the intended scale
  *    path — the exact Jaccard join is the small-corpus/verification path.
  */
object Dedup {

  /** Lower-cased whitespace tokens. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** Scale-adaptive parallelism guard for the tokenize/shingle/hash map
    * side: a corpus that arrives as fewer scan partitions than the session
    * has cores serializes the per-token md5 work (locally the whole
    * documents table is one parquet row group → ONE task does all the
    * hashing). Spread it ONLY when both (a) the optimizer's size estimate
    * says the shuffle is trivial (< 1 GiB) and (b) the scan really has
    * fewer partitions than cores — at archive scale the estimate alone
    * disables this, so no corpus-sized repartition can ever sneak in. */
  private def spreadSmallScan(docs: DataFrame): DataFrame = {
    val p = docs.sparkSession.sparkContext.defaultParallelism
    val small = docs.queryExecution.optimizedPlan.stats.sizeInBytes < (1L << 30)
    // file count as the parallelism proxy: the old `docs.rdd.getNumPartitions`
    // probe forced a full physical planning + RDD instantiation of the input
    // purely for this heuristic (ADVICE r11). A sub-GiB corpus in fewer
    // files than cores is the single-row-group case this guard exists for;
    // a big single file is excluded by the stats gate above, and non-file
    // inputs (inputFiles empty) are spread whenever small — harmless, the
    // exchange is bounded by the 1 GiB gate.
    if (small && docs.inputFiles.length < p) docs.repartition(p) else docs
  }

  /** (doc_id, shingle) distinct word n-grams.
    * @param maxDf drop shingles appearing in more than this many documents
    *              (skew guard); None keeps all. */
  def shingles(docs: DataFrame, n: Int, idCol: String = "doc_id",
      textCol: String = "text", maxDf: Option[Long] = None): DataFrame = {
    val ts = shinglesWithDups(docs, n, idCol, textCol).distinct()
    maxDf match {
      case None => ts
      case Some(df) =>
        // document-frequency filter via a window over shingle (one extra shuffle)
        val freq = ts.groupBy("shingle").agg(count(lit(1)).as("df"))
        ts.join(freq.filter(col("df") <= df).select("shingle"), "shingle")
          .select(col(idCol), col("shingle"))
    }
  }

  /** (doc_id, shingle) word n-grams WITH per-doc duplicates — [[shingles]]
    * without its distinct exchange, for consumers whose downstream aggregate
    * is already duplicate-insensitive (collect_set, min): they save a full
    * shuffle of the widest intermediate in the pipeline.
    *
    * Docs shorter than n tokens yield NO shingles: the `when` leaves the
    * sequence NULL there and explode(NULL) emits zero rows. (An unguarded
    * sequence(1, size-(n-1)) would step DOWN to [1, 0] when size < n and
    * slice(ts, 0, n) then throws "array indices start at 1"; the DuckDB
    * oracle's generate_series(1, 0) is empty, so the guard also restores
    * semantic agreement.) */
  def shinglesWithDups(docs: DataFrame, n: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), tokens(col(textCol)).as("ts"))
      .select(col(idCol), col("ts"),
        explode(when(size(col("ts")) >= n,
          sequence(lit(1), size(col("ts")) - (n - 1)))).as("i"))
      .select(col(idCol), concat_ws(" ", slice(col("ts"), col("i"), lit(n))).as("shingle"))

  /** Duplicated-span analysis: mark every `w`-token sliding window whose
    * exact text occurs anywhere else in the corpus (earlier in the same doc
    * or in any other doc), and report per-document duplicated-window
    * fractions — the practical approximation of suffix-array substring
    * dedup (Lee et al., "Deduplicating Training Data Makes Language Models
    * Better", ACL 2022) that modern corpus pipelines threshold on as a
    * `dup_ngram` quality signal.
    *
    * An occurrence is a duplicate iff it is not the corpus-first occurrence
    * of its window text, "first" = minimum (doc_id, pos) — deterministic and
    * partition-independent.
    *
    * Scale shape: window hashes are a pure projection (HOF slice + md5, no
    * explode of w× token copies — each window row carries only its 32-char
    * hash). TWO shuffles total: the min-(doc_id,pos) marker is an aggregate
    * window over the hash partition (no sort, no groupBy-plus-join-back),
    * then one groupBy(doc_id). A hash partition holds one window-text's
    * occurrence list — bounded by that text's true frequency, the same
    * skew exposure as any exact-dedup groupBy.
    *
    * Docs shorter than `w` tokens have no windows and do not appear.
    *
    * @return (doc_id, n_windows, n_dup, dup_ppm, has_dup)
    */
  def duplicatedSpans(docs: DataFrame, w: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val wins = docs
      .select(col(idCol).cast("long").as("doc_id"), tokens(col(textCol)).as("ts"))
      .select(col("doc_id"), col("ts"),
        explode(when(size(col("ts")) >= w,
          sequence(lit(1), size(col("ts")) - (w - 1)))).as("pos"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        md5(concat_ws(" ", slice(col("ts"), col("pos"), lit(w)))).as("h"))
    val firstOcc = min(struct(col("doc_id"), col("pos")))
      .over(Window.partitionBy("h")).as("first")
    wins.select(col("doc_id"), col("pos"), firstOcc)
      .groupBy("doc_id").agg(
        count(lit(1)).cast("long").as("n_windows"),
        sum(when(col("first.doc_id") =!= col("doc_id") ||
          col("first.pos") =!= col("pos"), 1L).otherwise(0L)).cast("long").as("n_dup"))
      .select(col("doc_id"), col("n_windows"), col("n_dup"),
        expr("(n_dup * 1000000L) DIV n_windows").cast("long").as("dup_ppm"),
        (col("n_dup") > 0).as("has_dup"))
  }

  /** EXACT n-gram Jaccard pairs ≥ `minJaccard`, dispatched on the threshold
    * like an optimizer rule — both paths return the identical result set
    * (asserted against each other in DedupSpec at 0.1/0.3/0.6):
    *
    *  - t ≥ [[PrefixDispatchThreshold]] → [[jaccardPairsPrefix]], the
    *    AllPairs/PPJoin-family prefix-filtered join. Its candidate count
    *    scales ~(1−t)²·Σdf², so pruning power grows quadratically with t.
    *  - lower t → [[jaccardPairsDirect]], the shingle self-join with
    *    map-side-combined pair counting. At t=0.3 the prefix keeps 70% of
    *    every doc (measured on the sf0.1 corpus: 727k of 1.13M co-occurring
    *    pairs survive) and the per-candidate array verification costs more
    *    than the direct count it avoids.
    *
    * Skewed corpora (stop-shingles) should combine either path with
    * [[shingles]]' `maxDf` guard; [[minhashLsh]] remains the approximate
    * sub-quadratic scale path. */
  def jaccardPairs(sh: DataFrame, minJaccard: Double): DataFrame =
    if (minJaccard >= PrefixDispatchThreshold) jaccardPairsPrefix(sh, minJaccard)
    else jaccardPairsDirect(sh, minJaccard)

  /** Crossover for [[jaccardPairs]]: at t=0.5 the prefix drops half of each
    * doc and candidate rows fall ~4×, which on measured corpora is where
    * candidate-verify overtakes the direct pair count. */
  val PrefixDispatchThreshold = 0.5

  /** Direct exact path: shingle self-join → per-pair count with map-side
    * partial aggregation → size join → threshold filter. O(Σ df²) joined
    * rows — the right shape when the threshold is too low for prefix
    * pruning to bite (see [[jaccardPairs]]). */
  def jaccardPairsDirect(sh: DataFrame, minJaccard: Double): DataFrame = {
    // The shingle table feeds THREE plan branches (sizes, both self-join
    // sides) whose projections differ, so Spark can neither reuse the
    // exchange nor dedupe the subtrees: without materialization the corpus
    // is scanned and re-shingled (tokenize + explode + distinct) once per
    // branch — at archive scale that triples the dominant stage. One
    // localCheckpoint pays one narrow (doc_id, shingle) materialization.
    val shm = sh.localCheckpoint()
    val sizes = shm.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val a = shm.select(col("doc_id").as("doc_a"), col("shingle"))
    val b = shm.select(col("doc_id").as("doc_b"), col("shingle"))
    val common = a.join(b, Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a").cast("long"), col("doc_b").cast("long"),
        col("common").cast("long"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Prefix-filtered exact path (AllPairs/PPJoin family, Bayardo et al.
    * WWW'07; Xiao et al. WWW'08).
    *
    * Filters (both lossless for Jaccard ≥ t):
    *  - LENGTH: J(A,B) ≥ t ⟹ t·|A| ≤ |B| ≤ |A|/t, applied inside the join.
    *  - PREFIX: order every doc's shingles by a global total order
    *    (md5(shingle) — uniform, engine-portable) and keep only the first
    *    |d| − ⌈t·|d|⌉ + 1 as join keys. If J(A,B) ≥ t then the overlap
    *    c ≥ t·max(|A|,|B|), so the smallest common shingle in the order
    *    must land in BOTH prefixes — no qualifying pair is missed.
    *
    * Candidates (deduped pairs, not per-shared-shingle rows) are then
    * verified with one `array_intersect` against the per-doc sorted shingle
    * arrays, which also yields the exact `common` count. Two shuffles
    * (set-build groupBy, candidate equi-join) plus two slim hash joins of
    * the small candidate table back to the sets. */
  def jaccardPairsPrefix(sh: DataFrame, minJaccard: Double): DataFrame = {
    val t = minJaccard
    // per-doc shingle array sorted by the md5 global order (ties impossible
    // in practice; sort key includes the shingle for total determinism)
    val sets = sh
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(md5(col("shingle")).as("h"), col("shingle").as("s"))))
        .as("hs"))
      .select(col("doc_id"), transform(col("hs"), x => x.getField("s")).as("set"),
        size(col("hs")).as("n_sh"))
      // feeds FOUR differently-projected branches (both prefix self-join
      // sides, both verification joins) — materialize once or the corpus is
      // scanned + re-shingled + re-collected per branch (see
      // jaccardPairsDirect for the same reasoning)
      .localCheckpoint()
    val prefLen = (col("n_sh").cast("double") - ceil(lit(t) * col("n_sh")) + 1).cast("int")
    val pref = sets.select(col("doc_id"), col("n_sh"),
      explode(slice(col("set"), lit(1), prefLen)).as("shingle"))
    val cands = pref.as("a").join(pref.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id") &&
          // length filter: |B| in [t·|A|, |A|/t] (symmetric under a<b order)
          col("b.n_sh").cast("double") >= lit(t) * col("a.n_sh") &&
          col("a.n_sh").cast("double") >= lit(t) * col("b.n_sh"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cands
      .join(sets.select(col("doc_id").as("doc_a"), col("set").as("set_a"), col("n_sh").as("na")),
        "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("set").as("set_b"), col("n_sh").as("nb")),
        "doc_b")
      .withColumn("common", size(array_intersect(col("set_a"), col("set_b"))).cast("long"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a").cast("long"), col("doc_b").cast("long"),
        col("common").cast("long"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash signature ARRAY per doc from its (already distinct) shingle set:
    * sig[s] = min over shingles of md5(s || '|' || shingle). String-min over
    * lowercase hex is a valid uniform min-hash and is engine-portable.
    *
    * Computed as a single projection over the per-doc shingle set — the
    * numHashes md5 calls per shingle are inherent to the algorithm, but
    * nothing is exploded and nothing extra is shuffled: the only shuffle is
    * the one collect_set the caller already pays for verification sets.
    * (The previous design exploded ×numHashes rows per shingle before the
    * partial aggregate; at 64 hashes that was a 64× row materialization.) */
  def minhashSignatureArray(sets: DataFrame, numHashes: Int,
      setCol: String = "set"): DataFrame =
    sets.withColumn("sig",
      transform(sequence(lit(0), lit(numHashes - 1)),
        s => array_min(transform(col(setCol),
          x => md5(concat(s.cast("string"), lit("|"), x))))))

  /** Band signatures for LSH from the signature array: band b joins the
    * rowsPerBand consecutive minhashes [b·r, (b+1)·r) with '|'. The only
    * fan-out is numBands rows per doc (e.g. 4), not hashes × shingles. */
  def lshBands(sigs: DataFrame, numHashes: Int, rowsPerBand: Int): DataFrame = {
    require(numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must be a multiple of rowsPerBand ($rowsPerBand): " +
        "a partial trailing band would silently change candidate recall")
    val numBands = numHashes / rowsPerBand
    sigs
      .select(col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(numBands - 1))).as("band"))
      .select(col("doc_id"), col("band"),
        array_join(slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand)), "|")
          .as("sig"))
  }

  /** Candidate pairs from banded signatures (equi-join on (band, sig) — the
    * shuffle key is the band hash, so pair generation never touches the
    * full cross product). */
  def lshCandidates(bands: DataFrame): DataFrame = {
    val a = bands.select(col("band"), col("sig"), col("doc_id").as("doc_a"))
    val b = bands.select(col("band"), col("sig"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Full MinHash+LSH near-dup pipeline: shingle → sign → band → candidate →
    * exact-Jaccard verification of candidates only.
    *
    * Verification joins the candidate pairs (few) against per-doc shingle
    * *sets* and intersects arrays — O(|candidates|·shingles_per_doc), never
    * the all-pairs shingle fan-out the exact path pays. This is the piece
    * that keeps the pipeline sub-quadratic at corpus scale. */
  def minhashLsh(docs: DataFrame, n: Int, numHashes: Int, rowsPerBand: Int,
      minJaccard: Double): DataFrame = {
    require(numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must be a multiple of rowsPerBand ($rowsPerBand): " +
        "a partial trailing band would silently change candidate recall")
    // No distinct: every aggregate below (collect_set, min) is duplicate-
    // insensitive, so the per-doc dedup exchange [[shingles]] pays is pure
    // overhead here — one shuffle of the widest frame in the pipeline saved.
    // Without that exchange the 8-hash md5 work runs on the SCAN's
    // partitioning, so spread a small single-file corpus first (no-op at
    // archive scale — see spreadSmallScan).
    val sh = shinglesWithDups(spreadSmallScan(docs), n)
    // ONE shuffle builds the per-doc shingle sets AND the numHashes signature
    // minima in the same aggregate: sig[s] = min md5(s|shingle) over the
    // doc's distinct shingles, and min over the raw (duplicated) rows is the
    // identical value. As aggregates the mins are map-side combined (partial min before
    // the exchange) and codegen'd, where the previous formulation rebuilt
    // them AFTER the shuffle by scanning each doc's collected set array
    // numHashes times through nested higher-order functions — HOFs are
    // CodegenFallback, so that projection ran interpreted per element
    // (equivalence asserted in DedupSpec).
    // persist (not localCheckpoint): lineage stays intact, so the blocks can
    // be released as soon as the (small) verified-pair output is materialized
    // — no cached state outlives the call in a long-lived session.
    val sigCols = (0 until numHashes).map { s =>
      min(md5(concat(lit(s.toString + "|"), col("shingle")))).as(s"mh$s")
    }
    val sets = sh.groupBy("doc_id")
      .agg(collect_set("shingle").as("set"), sigCols: _*)
      .persist() // reused twice; avoids recomputing the shuffle
    val numBands = numHashes / rowsPerBand
    val bandCol = array((0 until numBands).map { b =>
      concat_ws("|",
        (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")): _*)
    }: _*)
    // Candidate pairs via ONE exchange of the banded rows: group the docs
    // of each (band, sig) bucket and emit the sorted in-bucket pairs with
    // two streaming Generates (posexplode + tail slice — no k²-sized array
    // is ever materialized; the collected bucket itself is bounded by the
    // near-dup cluster size, the same bound the verify join's fan has).
    // The previous [[lshCandidates]] self-join shuffled the banded frame
    // TWICE (both join sides) before the same pair-distinct; result is
    // identical — all i < j pairs per bucket, deduped across bands
    // (equivalence pinned in DedupSpec).
    val cands = sets
      .select(col("doc_id"), posexplode(bandCol).as(Seq("band", "sig")))
      .groupBy("band", "sig").agg(collect_set(col("doc_id")).as("ds0"))
      .filter(size(col("ds0")) > 1)
      .select(sort_array(col("ds0")).as("ds"))
      .select(posexplode(col("ds")).as(Seq("i", "doc_a")), col("ds"))
      .select(col("doc_a"),
        explode(slice(col("ds"), col("i") + 2, size(col("ds")))).as("doc_b"))
      .distinct()
    val out = cands
      .join(sets.select(col("doc_id").as("doc_a"), col("set").as("set_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("set").as("set_b")), "doc_b")
      .withColumn("common", size(array_intersect(col("set_a"), col("set_b"))).cast("long"))
      .withColumn("jaccard",
        col("common").cast("double") /
          (size(col("set_a")) + size(col("set_b")) - col("common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a").cast("long"), col("doc_b").cast("long"),
        round(col("jaccard"), 6).as("jaccard"))
      .localCheckpoint() // eager: materializes the few surviving pairs
    sets.unpersist()
    out
  }

  /** 16-bit SimHash over token counts. Bits derive from the first 4 hex chars
    * of md5(token); v_b = Σ count·(2·bit_b − 1); fingerprint bit b set iff
    * v_b > 0. Integer arithmetic end-to-end → engine-portable.
    *
    * Shape: the 16 per-bit contributions are plain projections over the
    * (doc, token, count) aggregate — 16 aggregate columns in ONE
    * groupBy(doc_id), not a 16× row explode feeding two more shuffles. Two
    * shuffles total, both map-side combined. */
  def simhash16(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tokCounts = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(idCol, "tok").agg(count(lit(1)).as("cnt"))
      .withColumn("h", substring(md5(col("tok")), 1, 4))
    val vCols = (0 until 16).map { b =>
      val hexd = instr(lit("0123456789abcdef"), substring(col("h"), b / 4 + 1, 1)) - 1
      val bit = floor(hexd / pow(lit(2.0), lit(3 - b % 4))).cast("long") % 2
      sum(col("cnt") * (bit * 2 - 1)).as(s"v$b")
    }
    tokCounts
      .groupBy(col(idCol))
      .agg(vCols.head, vCols.tail: _*)
      .select(col(idCol).cast("long"),
        (0 until 16).map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).cast("long").as("simhash"))
  }

  /** Embedding-cosine near-duplicate pairs via banded sign-LSH — the
    * semantic-dedup modality (exact / Jaccard / MinHash / SimHash cover the
    * lexical ones). Same banding idea as [[minhashLsh]], in cosine space:
    * `bands` independent hash tables of `planesPerBand` deterministic
    * md5-derived hyperplanes each ([[Similarity.signWeightMatrix]]); vectors
    * colliding in ANY band become candidates; candidates are verified with
    * exact cosine ≥ `minCos`. Collision probability per band is
    * (1 − θ/π)^planesPerBand, so recall tunes by (bands, planesPerBand)
    * without ever forming the all-pairs product.
    *
    * Scale shape: bucket ids are one zero-shuffle projection (ids only are
    * fanned ×bands, never the vectors); the candidate self-join shuffles on
    * (band, bucket); verification re-joins the few candidates back to the
    * embedding table on vec_id. No step is quadratic in the corpus.
    *
    * @return (i, j, sim) with i < j, exact cosine, sim ≥ minCos. */
  def embeddingNearDup(embeddings: DataFrame, bands: Int = 4,
      planesPerBand: Int = 2, dim: Int = 64, minCos: Double = 0.4): DataFrame = {
    val w = Similarity.signWeightMatrix(bands * planesPerBand, dim)
    val bandBuckets = array((0 until bands).map { b =>
      (0 until planesPerBand).map { i =>
        val plane = typedlit(w(b * planesPerBand + i).toSeq)
        when(Similarity.dot(col("embedding"), plane) > 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
    val ids = embeddings
      .select(col("vec_id").cast("long").as("vec_id"),
        posexplode(bandBuckets).as(Seq("band", "bucket")))
    val cands = ids.as("a").join(ids.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"))
      .distinct()
    // Norms are precomputed per VECTOR, not per pair — identical float values
    // (same dot over the same array), a third of the per-pair flops.
    val e = embeddings.select(col("vec_id").cast("long"), col("embedding"),
      Similarity.norm(col("embedding")).as("nrm"))
    cands
      .join(e.select(col("vec_id").as("i"), col("embedding").as("ea"), col("nrm").as("na")), "i")
      .join(e.select(col("vec_id").as("j"), col("embedding").as("eb"), col("nrm").as("nb")), "j")
      .withColumn("sim", Similarity.dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("sim") >= minCos)
      .select(col("i"), col("j"), round(col("sim"), 4).as("sim"))
  }

  /** Segment-level exact dedup — remove REPEATED PASSAGES across the corpus
    * while keeping the documents (the ExactSubstr idea of Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better", on a
    * tractable unit: fixed-width token segments instead of a suffix array).
    * Boilerplate headers/footers/licenses recur across millions of pages;
    * document-level dedup never sees them.
    *
    * Rule: a segment occurrence survives iff it is the FIRST occurrence of
    * that segment in the corpus, ordered by (doc_id, position) — later
    * copies are dropped and the document re-assembled from its survivors.
    *
    * Shape: two shuffles at any corpus size — a window over the segment key
    * picks first occurrences (one exchange on segment), and the re-assembly
    * groups by doc_id (second exchange). Segments are cut from the token
    * array by position arithmetic (`slice`), a pure projection; the
    * re-assembled text is emitted as an md5 so row width stays O(1).
    *
    * @param width segment width in tokens (final short segment kept)
    * @return per doc: n_segs, n_kept, kept_ppm, kept_md5 (md5 of the
    *         surviving segments joined by ' '; md5('') if none survive).
    */
  def segmentDedup(docs: DataFrame, width: Int = 10): DataFrame = {
    require(width > 0, "segmentDedup needs width > 0")
    val base = docs.select(col("doc_id").cast("long").as("doc_id"),
        tokens(col("text")).as("ts"))
      .filter(size(col("ts")) > 0)
    val segs = base
      .select(col("doc_id"),
        explode(sequence(lit(0), floor((size(col("ts")) - 1) / lit(width)).cast("int"))).as("i"),
        col("ts"))
      .select(col("doc_id"), col("i"),
        array_join(slice(col("ts"), col("i") * width + 1, lit(width)), " ").as("seg"))
    val firstWins = Window.partitionBy("seg").orderBy("doc_id", "i")
    segs.withColumn("rn", row_number().over(firstWins))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_segs"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).cast("long").as("n_kept"),
        md5(array_join(transform(
          sort_array(collect_list(when(col("rn") === 1, struct(col("i"), col("seg"))))),
          s => s.getField("seg")), " ")).as("kept_md5"))
      .select(col("doc_id"), col("n_segs"), col("n_kept"),
        expr("(n_kept * 1000000L) DIV n_segs").cast("long").as("kept_ppm"),
        col("kept_md5"))
  }
}
