package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k. The query set is broadcast, so
  *    the plan is one scan of the corpus with no shuffle of the embeddings —
  *    this is the correct baseline even at scale when |queries| is small.
  *  - [[signLsh]] buckets: random-hyperplane (sign) projections, hashed to a
  *    bucket id; search touches only the query's bucket. Hyperplane signs
  *    derive from md5(plane || dim) so buckets are deterministic and
  *    reproducible across engines. At 100 TB the bucket table would be
  *    written bucketed-by(bucket) so probes are partition-pruned scans.
  *
  * All vector math runs in double precision via codegen'd higher-order
  * functions (`zip_with` + `aggregate`) — no UDFs, stays inside whole-stage
  * codegen.
  */
object Similarity {

  /** Sequential left-fold dot product in double precision — a native
    * codegen'd Catalyst expression ([[graft.plans.DotProduct]]); bit-equal
    * to the `aggregate(zip_with(...))` higher-order form it replaced, but
    * compiled to a plain loop instead of an interpreted per-element lambda. */
  def dot(a: Column, b: Column): Column = graft.plans.DotProduct.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine for a (small, broadcast) query set.
    * @return (qid, vec_id, sim, rank) */
  def bruteForceTopK(embeddings: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val q = embeddings.filter(queryPred)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = embeddings.select(col("vec_id"), col("embedding"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    broadcast(q).join(c, col("vec_id") =!= col("qid"))
      .withColumn("sim", cosine(col("qe"), col("embedding")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").cast("long"), col("vec_id").cast("long"),
        round(col("sim"), 4).as("sim"), col("rank").cast("long"))
  }

  /** Deterministic ±1 hyperplane weight for (plane, 1-based dim): +1 iff the
    * first hex digit of md5("p|d") is >= 8. Evaluated on the DRIVER — the
    * planes×dim weight matrix is tiny (planes·dim doubles), so it is
    * precomputed once and inlined as literals instead of spending
    * |vectors|·dim·planes md5 calls (and as many exploded rows) per
    * bucket build. Must stay bit-identical to the DuckDB oracle's
    * instr('0123456789abcdef', substr(md5(p || '|' || d), 1, 1)) - 1 >= 8. */
  private[operators] def signWeightMatrix(planes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(planes, dim) { (p, d0) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val firstByte = md.digest(s"$p|${d0 + 1}".getBytes("UTF-8"))(0)
      if (((firstByte >> 4) & 0xf) >= 8) 1.0 else -1.0
    }

  /** Sign-projection LSH bucket id in [0, 2^planes). One row per vector,
    * ZERO fan-out: all `planes` projections are computed in one projection
    * over the embedding array against broadcast literal hyperplanes, inside
    * codegen'd higher-order functions. */
  def signLshBuckets(embeddings: DataFrame, planes: Int, dim: Int): DataFrame = {
    val w = signWeightMatrix(planes, dim)
    val bucket = (0 until planes).map { p =>
      val plane = typedlit(w(p).toSeq)
      when(dot(col("embedding"), plane) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    embeddings.select(col("vec_id").cast("long"), bucket.as("bucket"))
  }

  /** Deterministic coarse-quantizer centroid TABLE
    * `(cell INT, __centroid, __cdot)`: the `kCells` corpus vectors with the
    * smallest `vec_id` (reproducible across engines, unlike k-means
    * iterations) — shared by the IVF index and semantic dedup so the two
    * stay cell-for-cell identical (and oracle-exact).
    *
    * A broadcast-joined TABLE, NOT literal expressions: real SemDeDup
    * runs ~10⁵ cells (arXiv:2303.09540 uses 1.1e5 on LAION), and a
    * projection with one literal-array expression per centroid blows past
    * Janino's 64 KB method limit orders of magnitude earlier — the join
    * keeps the PLAN size O(1) in `kCells` while the broadcast carries the
    * centroids as data. Materialized ONCE into a LocalRelation (the same
    * kCells rows a broadcast build would collect to the driver anyway), so
    * the cardinality check plus every downstream crossJoin costs one
    * source scan total instead of re-scanning the corpus per consumer. */
  private[operators] def centroidTable(embeddings: DataFrame, kCells: Int): DataFrame = {
    val t = embeddings.filter(col("vec_id") < kCells)
      .select(col("vec_id").cast("int").as("cell"), col("embedding").as("__centroid"),
        dot(col("embedding"), col("embedding")).as("__cdot"))
    val rows = t.collect()
    require(rows.length == kCells,
      s"corpus has fewer than $kCells centroid rows (found ${rows.length})")
    embeddings.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), t.schema)
  }

  /** Pick `kCells` for a corpus of `n` vectors so within-cell pairwise work
    * stays bounded: k = ⌈n / targetCellSize⌉ (clamped to [16, 2²⁰]). At a
    * 1 B-document corpus and the default target this lands near the ~10⁵
    * cells SemDeDup uses — pair work per cell is O(targetCellSize²) instead
    * of the O((n/16)²) a fixed small k degrades to. */
  def autoCells(n: Long, targetCellSize: Int = 1024): Int = {
    require(n > 0 && targetCellSize > 0, s"need positive n/targetCellSize ($n/$targetCellSize)")
    val ceil = n / targetCellSize + (if (n % targetCellSize == 0) 0 else 1) // no +k overflow
    math.max(16L, math.min(1L << 20, ceil)).toInt
  }

  /** Squared L2 of the row's `embedding` to the joined `__centroid` via the
    * dot identity |e−c|² = e·e − 2·e·c + c·c — bit-reproducible in the
    * DuckDB oracle (float→double widening is exact, so a float centroid
    * column and the former double literals dot identically). `__sd` is the
    * precomputed e·e (once per vector, not once per centroid pair). */
  private def d2Col: Column =
    col("__sd") - lit(2.0) * dot(col("embedding"), col("__centroid")) + col("__cdot")

  /** `(vec_id, embedding, cell)`: nearest-centroid assignment (ties break
    * to the lower cell). One broadcast nested-loop join corpus × centroids
    * (no literal blowup at any `kCells`) and ONE map-side-combined shuffle
    * on `vec_id` for the argmin — `min(struct(d2, cell))` partially
    * aggregates the k-fan-out back to one row per vector before the
    * exchange, so shuffle volume is the corpus, independent of `kCells`. */
  def assignCells(embeddings: DataFrame, kCells: Int): DataFrame =
    assignWith(embeddings, centroidTable(embeddings, kCells))

  private def assignWith(embeddings: DataFrame, cents: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"),
        dot(col("embedding"), col("embedding")).as("__sd"))
      .crossJoin(broadcast(cents))
      .groupBy("vec_id")
      .agg(min(struct(d2Col.as("d2"), col("cell"))).as("__best"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("embedding"), col("__best.cell").as("cell"))

  /** IVF (inverted-file) ANN — the classic coarse-quantizer scale path.
    *
    * Every corpus vector is assigned to its nearest [[centroidTable]]
    * centroid by squared L2 (ties → smaller cell id); a query probes its
    * `nprobe` nearest cells and exact-cosine ranks only those candidates.
    *
    * Scale shape: cell assignment is [[assignCells]] (broadcast centroid
    * join, corpus-sized shuffle, plan O(1) in `kCells`). At 100 TB the
    * assigned corpus would be written `bucketBy(cell)` so probes are
    * partition-pruned scans touching nprobe/kCells of the data; here the
    * probe is a broadcast join of the (small) query set against the
    * assignment on `cell`. Size `kCells` with [[autoCells]].
    *
    * @return (qid, vec_id, sim, rank) — exact cosine rank within probed cells. */
  def ivfTopK(embeddings: DataFrame, queryPred: Column, kCells: Int = 16,
      nprobe: Int = 2, k: Int = 10): DataFrame = {
    val cents = centroidTable(embeddings, kCells)
    val assigned = assignWith(embeddings, cents)

    val wProbe = Window.partitionBy("qid").orderBy(col("d2"), col("cell"))
    val probes = embeddings.filter(queryPred)
      .select(col("vec_id").as("qid"), col("embedding"),
        dot(col("embedding"), col("embedding")).as("__sd"))
      .crossJoin(broadcast(cents))
      .select(col("qid"), col("embedding").as("qe"), col("cell"), d2Col.as("d2"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("qid"), col("qe"), col("cell"))

    val wRank = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    broadcast(probes).join(assigned, Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim", cosine(col("qe"), col("embedding")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("qid").cast("long"), col("vec_id").cast("long"),
        round(col("sim"), 4).as("sim"), col("rank").cast("long"))
  }

  /** LSH-bucketed ANN: per query, candidates = same-bucket vectors; returns
    * bucket, candidate count and the top-1 exact-cosine match among them. */
  def lshTopMatch(embeddings: DataFrame, queryPred: Column, planes: Int, dim: Int): DataFrame = {
    val buckets = signLshBuckets(embeddings, planes, dim)
    val emb = embeddings.join(buckets, "vec_id")
    val q = emb.filter(queryPred)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("bucket"))
    val c = emb.select(col("vec_id"), col("embedding"), col("bucket"))
    val cands = broadcast(q).join(c, Seq("bucket")).filter(col("vec_id") =!= col("qid"))
      .withColumn("sim", cosine(col("qe"), col("embedding")))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    cands
      .withColumn("rn", row_number().over(w))
      .groupBy(col("qid"), col("bucket"))
      .agg(count(lit(1)).as("n_candidates"),
        min(when(col("rn") === 1, col("vec_id"))).as("best_id"),
        min(when(col("rn") === 1, round(col("sim"), 4))).as("best_sim"))
      .select(col("qid").cast("long"), col("bucket").cast("long"),
        col("n_candidates").cast("long"), col("best_id").cast("long"), col("best_sim"))
  }
}
