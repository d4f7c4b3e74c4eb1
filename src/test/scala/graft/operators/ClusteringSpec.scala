package graft.operators

import graft.SparkSpec

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  test("kmeansAssign: separated blobs resolve to their own clusters") {
    val pts = Seq(
      (0L, Array(0.0f, 0.0f)),
      (1L, Array(0.1f, 0.0f)),
      (2L, Array(10.0f, 10.0f)),
      (3L, Array(10.1f, 10.0f)),
      (4L, Array(0.0f, 0.1f)),
      (5L, Array(10.0f, 10.1f))).toDF("vec_id", "embedding")
    val out = Clustering.kmeansAssign(pts, k = 2, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) == 0L && out(1L) == 0L && out(4L) == 0L)
    assert(out(2L) == 1L && out(3L) == 1L && out(5L) == 1L)
  }

  test("kmeansAssign: deterministic run-to-run (same assignment AND d2)") {
    val pts = (0L until 40L).map { i =>
      (i, Array.tabulate(4)(d => ((i * 7 + d * 3) % 11).toFloat / 11f))
    }.toDF("vec_id", "embedding")
    val a = Clustering.kmeansAssign(pts, k = 3, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val b = Clustering.kmeansAssign(pts, k = 3, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    // every row assigned, clusters within range
    assert(a.length == 40 && a.forall(t => t._2 >= 0 && t._2 < 3))
  }

  test("kmeansAssign: k=1 puts everything in cluster 0 at the mean") {
    val pts = Seq(
      (0L, Array(0.0f, 0.0f)),
      (1L, Array(2.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Clustering.kmeansAssign(pts, k = 1, iters = 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // centroid after one update = (1, 0); both points at d2 = 1.0
    assert(out(0L) == ((0L, 1.0)) && out(1L) == ((0L, 1.0)))
  }

  test("kmeansAssign: iters=0 assigns against the raw init centroids") {
    val pts = Seq(
      (0L, Array(0.0f)),
      (1L, Array(1.0f)),
      (2L, Array(0.9f))).toDF("vec_id", "embedding")
    val out = Clustering.kmeansAssign(pts, k = 2, iters = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 0L, 1L -> 1L, 2L -> 1L))
  }

  test("kmeansAssign: fewer rows than k is rejected") {
    val pts = Seq((0L, Array(1.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Clustering.kmeansAssign(pts, k = 2, iters = 1)
    }
  }
}
