package graft.marex

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UnstructuredSpec extends SparkSpec {
  import spark.implicits._

  // ring mesh: cell i ↔ (i±1) mod 12
  private lazy val edges = (0 until 12).flatMap(i =>
    Seq((i, (i + 1) % 12), (i, (i + 11) % 12))).toDF("cell", "nbr")

  private def t0 = java.sql.Timestamp.valueOf("2000-01-01 00:00:00")

  test("dilation grows one hop per round on the ring") {
    val flags = Seq((t0, 0)).toDF("time", "cell")
    val d1 = Unstructured.dilate(flags, edges, 1).select("cell").collect().map(_.getInt(0)).toSet
    assert(d1 == Set(11, 0, 1))
    val d2 = Unstructured.dilate(flags, edges, 2).select("cell").collect().map(_.getInt(0)).toSet
    assert(d2 == Set(10, 11, 0, 1, 2))
  }

  test("erosion removes boundary cells of a segment") {
    val flags = (2 to 6).map(c => (t0, c)).toDF("time", "cell")
    val e = Unstructured.erode(flags, edges, 1).select("cell").collect().map(_.getInt(0)).toSet
    assert(e == Set(3, 4, 5))
  }

  test("per-slice CCL separates two arcs, labels deterministic") {
    val flags = Seq(1, 2, 3, 7, 8).map(c => (t0, c)).toDF("time", "cell")
    val lab = Unstructured.labelPerSlice(flags, edges).collect()
      .map(r => r.getInt(1) -> r.getInt(2)).toMap
    assert(lab(1) == lab(2) && lab(2) == lab(3))
    assert(lab(7) == lab(8))
    assert(lab(1) != lab(7))
    assert(Set(lab(1), lab(7)) == Set(1, 2))
  }

  test("fillHoles closes a 1-cell gap in a ring segment") {
    val flags = Seq(1, 2, 4, 5).map(c => (t0, c)).toDF("time", "cell")
    val out = Unstructured.fillHoles(flags, edges, 1)
      .select("cell").collect().map(_.getInt(0)).toSet
    assert(out.contains(3), "gap cell 3 should be closed")
  }

  test("unifyCoordinates converts radians to degrees") {
    val radGeom = Seq((0, 0, 0.5, 1.0), (0, 1, -0.5, 6.0)).toDF("y", "x", "lat", "lon")
    val out = Unstructured.unifyCoordinates(radGeom)
      .agg(max("lon")).head().getDouble(0)
    assert(math.abs(out - math.toDegrees(6.0)) < 1e-9)
    val degGeom = Seq((0, 0, 10.0, -170.0), (0, 1, 20.0, 170.0)).toDF("y", "x", "lat", "lon")
    assert(Unstructured.unifyCoordinates(degGeom).agg(max("lon")).head().getDouble(0) == 170.0)
  }
}
