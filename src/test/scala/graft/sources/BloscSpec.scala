package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Blosc decode validated against the reference's own fixture zarrs (known
  * grids: 1° global lat/lon axes, daily time axis, boolean extremes/mask).
  * Exercises every container case observed in the fixtures: split streams
  * (<f4 shuffle ts=4), single stream (ts=1), memcpy frames (<i4 time), and
  * the stored-uncompressed stream (lat plane 3). */
class BloscSpec extends SparkSpec {

  private val fixture = "/root/reference/tests/data/extremes_gridded.zarr"
  private def available = new java.io.File(s"$fixture/.zgroup").exists() ||
    new java.io.File(s"$fixture/extreme_events/.zarray").exists()

  test("lat/lon axes decode to exact 1-degree grids (split + shuffled f4)") {
    assume(available, "reference fixture not present")
    val (latShape, lat) = ZarrSource.readLocalND(s"$fixture/lat")
    val (lonShape, lon) = ZarrSource.readLocalND(s"$fixture/lon")
    assert(latShape == Seq(180) && lonShape == Seq(360))
    assert(lat.head == -89.5 && lat.last == 89.5)
    lat.sliding(2).foreach(p => assert(math.abs(p(1) - p(0) - 1.0) < 1e-6))
    assert(lon.head == -179.5 && lon.last == 179.5)
  }

  test("time axis decodes via the memcpy path to a daily sequence") {
    assume(available, "reference fixture not present")
    val (shape, t) = ZarrSource.readLocalND(s"$fixture/time")
    assert(shape == Seq(32))
    t.sliding(2).foreach(p => assert(p(1) - p(0) == 86400.0, "daily steps"))
    assert(t.head == 9.15192e8) // seconds since 1981-01-01 → 2010-01-01
  }

  test("mask decodes to a plausible ocean fraction") {
    assume(available, "reference fixture not present")
    val (shape, m) = ZarrSource.readLocalND(s"$fixture/mask")
    assert(shape == Seq(180, 360))
    assert(m.forall(v => v == 0.0 || v == 1.0))
    val frac = m.sum / m.length
    assert(frac > 0.5 && frac < 0.8, s"ocean fraction $frac out of range")
  }

  test("extreme_events reads distributed: full cardinality, boolean values") {
    assume(available, "reference fixture not present")
    val df = ZarrSource.read3D(spark, s"$fixture/extreme_events")
    assert(df.count() == 32L * 180 * 360)
    assert(df.filter(col("value") =!= 0.0 && col("value") =!= 1.0).count() == 0)
    val frac = df.filter(col("value") === 1.0).count().toDouble / (32L * 180 * 360)
    assert(frac > 0.01 && frac < 0.3, s"extreme fraction $frac out of range")
  }
}
