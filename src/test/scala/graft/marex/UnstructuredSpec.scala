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

  test("erosion checks a cell's OWN neighbour list (reference orientation)") {
    // asymmetric table (boundary truncation): 0 lists 1; 1 lists 2; 2
    // lists 1. The reference erodes against each cell's own row of the
    // neighbour matrix — NOT the transpose — which the pinned mesh-golden
    // counts lock in (changing this orientation flips the fixture's
    // 99/99/10/9 to 98/98/11/9).
    val asym = Seq((0, 1), (1, 2), (2, 1)).toDF("cell", "nbr")
    def erode(cells: Set[Int]): Set[Int] =
      Unstructured.erode(cells.map(c => (t0, c)).toSeq.toDF("time", "cell"), asym, 1)
        .select("cell").collect().map(_.getInt(0)).toSet
    // 0 survives iff its listed nbr 1 is flagged; 1 iff 2 is; 2 iff 1 is
    assert(erode(Set(0, 1, 2)) == Set(0, 1, 2))
    assert(erode(Set(0, 2)) == Set.empty, "0 and 2 each miss a listed neighbour")
    assert(erode(Set(1, 2)) == Set(1, 2))
    assert(erode(Set(0, 1)) == Set(0), "1 misses its listed neighbour 2")
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

  // ── T2/T21 coordinate system detection + centroid remap
  //    (reference track.py:919–1021, tests/test_track_edge_cases.py:645,:671)

  private def geomWithLon(lons: Seq[Double]) =
    lons.zipWithIndex.map { case (lo, i) => (i, 0.0, lo) }.toDF("cell", "lat", "lon")

  test("detectCoordSystem: [0,2π] auto-detects radians (edge_cases:645)") {
    val lons = (0 until 40).map(i => i * 2 * math.Pi / 39)
    val cs = Unstructured.detectCoordSystem(geomWithLon(lons))
    assert(cs.units == "radians")
    assert(cs.lonShifted, "lon in [0,2π] must remap outputs to [0,2π)")
  }

  test("detectCoordSystem: [-π,π] radians, no shift (edge_cases:671)") {
    val lons = (0 until 40).map(i => -math.Pi + i * 2 * math.Pi / 39)
    val cs = Unstructured.detectCoordSystem(geomWithLon(lons))
    assert(cs.units == "radians" && !cs.lonShifted)
  }

  test("detectCoordSystem: degree ranges, explicit override, reject ambiguous") {
    val deg360 = Unstructured.detectCoordSystem(
      geomWithLon((0 to 72).map(_ * 5.0)))
    assert(deg360.units == "degrees" && deg360.lonShifted)
    val degSigned = Unstructured.detectCoordSystem(
      geomWithLon((0 to 72).map(-180.0 + _ * 5.0)))
    assert(degSigned.units == "degrees" && !degSigned.lonShifted)
    // regional span neither ~360 nor ~2π: explicit units required
    val regional = geomWithLon(Seq(10.0, 20.0, 30.0))
    intercept[MarexSparkException] { Unstructured.detectCoordSystem(regional) }
    assert(Unstructured.detectCoordSystem(regional, Some("degrees")).units == "degrees")
  }

  test("remapCentroids: radians round-trip and [0,2π) shift") {
    val cs = Unstructured.CoordSystem("radians", 0.0, 2 * math.Pi)
    val props = Seq((1L, 45.0, -90.0), (2L, -30.0, 120.0))
      .toDF("event_id", "cen_lat", "cen_lon")
    val out = Unstructured.remapCentroids(props, cs).orderBy("event_id").collect()
    // lat → radians; lon −90° → 3π/2 (shifted into [0,2π))
    assert(math.abs(out(0).getDouble(1) - math.Pi / 4) < 1e-12)
    assert(math.abs(out(0).getDouble(2) - 3 * math.Pi / 2) < 1e-12)
    assert(math.abs(out(1).getDouble(2) - 2 * math.Pi / 3) < 1e-12)
  }

  test("remapCentroids: [0,360) degree shift, signed range untouched") {
    val props = Seq((1L, 10.0, -170.0), (2L, 20.0, 170.0))
      .toDF("event_id", "cen_lat", "cen_lon")
    val shifted = Unstructured.remapCentroids(props,
      Unstructured.CoordSystem("degrees", 0.0, 360.0)).orderBy("event_id").collect()
    assert(shifted(0).getDouble(2) == 190.0 && shifted(1).getDouble(2) == 170.0)
    val signed = Unstructured.remapCentroids(props,
      Unstructured.CoordSystem("degrees", -180.0, 180.0)).orderBy("event_id").collect()
    assert(signed(0).getDouble(2) == -170.0)
  }
}
