package graft.marex

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale probe for the DISTRIBUTED unstructured tracker: a 10⁶-cell mesh —
  * ICON-R2B7-class — with colliding objects, run end-to-end through the
  * scale path. The queue tracker would collect nT × nCells slices to the
  * driver; the distributed path must handle the same run with only
  * one-row aggregates driver-side (the assertion is the run itself: the
  * field stays distributed, split/merge + stitch complete, and the merge is
  * ledgered).
  */
class UnstructuredScaleSpec extends SparkSpec {
  import spark.implicits._

  private val side = 1000
  private val n = side * side // 10⁶ cells

  // grid-as-mesh with nv = 3 listed neighbors (left, right, up) — enough
  // connectivity for BFS/CCL; the reference's nv is likewise fixed per mesh
  private lazy val mesh: UnstructuredTracker.Mesh = {
    val nbr = Array.ofDim[Int](3, n)
    var i = 0
    while (i < n) {
      val x = i % side
      nbr(0)(i) = if (x > 0) i - 1 else -1
      nbr(1)(i) = if (x < side - 1) i + 1 else -1
      nbr(2)(i) = if (i >= side) i - side else -1
      i += 1
    }
    val lat = Array.tabulate(n)(i => -60.0 + 120.0 * (i / side) / side)
    val lon = Array.tabulate(n)(i => -180.0 + 360.0 * (i % side) / side)
    val area = Array.fill(n)(1.0)
    UnstructuredTracker.Mesh(nbr, lat, lon, area, Array.fill(n)(true))
  }

  private def ts(d: Int) = java.sql.Timestamp.valueOf(f"2020-01-${d + 1}%02d 00:00:00")

  test("10^6-cell mesh: distributed tracker resolves a collision without collecting the field") {
    // two 40×40 blobs: one static at x≈500, one marching +30 cells/day into
    // it — multi-parent child on day 2, exactly the split/merge hot path
    val days = 0 until 4
    val flags = days.map { d =>
      val mover = spark.range(40L * 40L).select(
        (lit(400 + 30 * d) + col("id") % 40 + (lit(480) + expr("id div 40")) * side)
          .cast("int").as("cell"), lit(ts(d)).as("time"))
      val static = spark.range(40L * 40L).select(
        (lit(520) + col("id") % 40 + (lit(480) + expr("id div 40")) * side)
          .cast("int").as("cell"), lit(ts(d)).as("time"))
      mover.unionByName(static)
    }.reduce(_ unionByName _).select("time", "cell").distinct()

    val res = UnstructuredTracker.track(flags, mesh,
      TrackConfig(rFill = 0, tFill = 0, areaFilterAbsolute = Some(10.0),
        overlapThreshold = 0.2, allowMerging = true, nnPartitioning = true),
      scalePath = true)

    assert(res.stats("total_merges") >= 1, "the collision must be ledgered")
    assert(res.stats("n_events_final") >= 1)
    // every flagged cell keeps a label through split/merge + stitch
    assert(res.idField.count() == flags.count())
    // genealogy integrity at scale
    val m = res.merges.collect()
    m.foreach { r =>
      assert(r.getSeq[Long](r.fieldIndex("parent_ids")).length >= 2)
      assert(r.getSeq[Double](r.fieldIndex("overlap_areas")).forall(_ > 0))
    }
    assert(res.mergeLedger.count() >= 2, "both parents appear in the sibling ledger")
  }
}
