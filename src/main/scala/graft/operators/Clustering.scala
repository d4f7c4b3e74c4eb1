package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space clustering for corpus curation: deterministic Lloyd
  * k-means over an `Array[Float]` embedding column. Clustering is the
  * workhorse behind topic-balanced sampling and cluster-based filtering
  * (e.g. the cluster stage of SemDeDup, Abbas et al. 2023), so it has to be
  * reproducible run-to-run and engine-to-engine — this variant pins every
  * source of nondeterminism:
  *
  *   - init: centroids are the embeddings of the k smallest `vec_id` rows
  *     (cluster id = ordinal in that order), not random samples;
  *   - distances: squared L2 via the dot identity `|e|² − 2·e·c + |c|²`
  *     with the sequential [[graft.plans.DotProduct]] kernel, rounded to
  *     9 dp BEFORE the argmin so near-tie assignment can't flip on
  *     summation-order noise; ties break to the lowest cluster id;
  *   - updates: per-dimension means rounded to 6 dp, so both engines carry
  *     IDENTICAL centroids into the next iteration and float noise cannot
  *     compound across iterations; an emptied cluster keeps its previous
  *     centroid.
  *
  * Scale shape: one Lloyd iteration is one scan + one (cluster, dim)
  * aggregation — k·dim result rows (metadata-sized; collected to the driver
  * and re-broadcast as literals, the standard distributed-Lloyd shape).
  * Assignment itself is a pure codegen'd projection: k fused dot products
  * per row, zero joins, zero shuffles. Nothing in the loop is proportional
  * to corpus size except the embarrassingly-parallel scans.
  */
object Clustering {

  /** @param emb   (vec_id, embedding) frame; embedding `array<float|double>`
    * @param k     cluster count (centroid literals are k·dim doubles)
    * @param iters Lloyd (assign, update) iterations; the returned assignment
    *              uses the centroids AFTER the last update
    * @return (vec_id, cluster, d2) — final assignment + rounded squared L2
    */
  def kmeansAssign(emb: DataFrame, k: Int = 8, iters: Int = 3): DataFrame = {
    require(k > 0 && iters >= 0, "kmeansAssign needs k > 0, iters >= 0")
    val e = emb.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
    val withSelf = e.withColumn("self_dot", Similarity.dot(col("emb"), col("emb")))

    // init: k smallest vec_ids, cid = ordinal (driver-held: k·dim doubles)
    var cents: Array[Array[Double]] = e.orderBy("vec_id").limit(k).collect()
      .map(_.getSeq[Double](1).toArray)
    require(cents.length == k, s"kmeansAssign: corpus has fewer than $k rows")

    // rounded-before-argmin distance structs; argmin via array_min on
    // (d2, cid) structs — lexicographic, so ties fall to the lowest cid
    def best(cs: Array[Array[Double]]): Column = {
      val alts = cs.zipWithIndex.map { case (c, cid) =>
        val cdot = c.foldLeft(0.0)((s, x) => s + x * x)
        struct(
          round(col("self_dot") - lit(2.0) * Similarity.dot(col("emb"), lit(c)) + lit(cdot), 9)
            .as("d2"),
          lit(cid.toLong).as("cid"))
      }
      array_min(array(alts: _*))
    }

    for (_ <- 1 to iters) {
      val assigned = withSelf.select(col("vec_id"), col("emb"),
        best(cents).getField("cid").as("cluster"))
      // (cluster, dim) means — k·dim rows back to the driver
      val means = assigned
        .select(col("cluster"), posexplode(col("emb")).as(Seq("pos", "v")))
        .groupBy("cluster", "pos").agg(avg("v").as("mv"))
        .collect()
        .map(r => (r.getLong(0).toInt, r.getInt(1)) -> r.getDouble(2)).toMap
      cents = cents.zipWithIndex.map { case (prev, cid) =>
        prev.indices.map { d =>
          BigDecimal(means.getOrElse((cid, d), prev(d)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }.toArray
      }
    }

    val fin = best(cents)
    withSelf.select(col("vec_id"),
      fin.getField("cid").as("cluster"),
      round(fin.getField("d2"), 6).as("d2"))
  }
}
