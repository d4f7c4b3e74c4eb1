package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NetCDF3Spec extends SparkSpec {
  import spark.implicits._

  private def tmpNc(): String = {
    val f = java.io.File.createTempFile("graft_nc3", ".nc")
    f.delete()
    f.getAbsolutePath
  }

  test("write3D → readHeader parses dims, record count and variable layout") {
    val path = tmpNc()
    val df = (for (t <- 0 until 4; y <- 0 until 3; x <- 0 until 5)
      yield (t, y, x, (t * 100 + y * 10 + x).toDouble)).toDF("t_idx", "y", "x", "value")
    NetCDF3Source.write3D(df, path, "sst", shape = (4, 3, 5))
    val h = NetCDF3Source.readHeader(spark, path)
    assert(h.version == 1)
    assert(h.numRecs == 4)
    assert(h.dims.map(d => (d.name, d.size)) == Seq(("time", 0), ("y", 3), ("x", 5)))
    assert(h.vars.map(_.name) == Seq("sst"))
    assert(h.vars.head.isRecord(h.dims))
  }

  test("write3D → read3D round-trips every cell") {
    val path = tmpNc()
    val in = (for (t <- 0 until 4; y <- 0 until 3; x <- 0 until 5)
      yield (t, y, x, t * 1.5 + y * 0.25 + x * 0.125)).toDF("t_idx", "y", "x", "value")
    NetCDF3Source.write3D(in, path, "sst", shape = (4, 3, 5))
    val out = NetCDF3Source.read3D(spark, path, "sst")
    assert(out.count() == 4 * 3 * 5)
    val diff = out.join(in.toDF("t_idx", "y", "x", "expected"), Seq("t_idx", "y", "x"))
      .filter(col("value") =!= col("expected")).count()
    assert(diff == 0, "round-trip must be bit-exact for doubles")
  }

  test("read3D timeRange prunes records") {
    val path = tmpNc()
    val in = (for (t <- 0 until 6; y <- 0 until 2; x <- 0 until 2)
      yield (t, y, x, t.toDouble)).toDF("t_idx", "y", "x", "value")
    NetCDF3Source.write3D(in, path, "v", shape = (6, 2, 2))
    val out = NetCDF3Source.read3D(spark, path, "v", timeRange = Some((2, 4)))
    assert(out.select("t_idx").distinct().collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3, 4))
  }

  test("readLocal reads a record variable densely") {
    val path = tmpNc()
    val in = (for (t <- 0 until 3; y <- 0 until 2; x <- 0 until 2)
      yield (t, y, x, (t * 4 + y * 2 + x).toDouble)).toDF("t_idx", "y", "x", "value")
    NetCDF3Source.write3D(in, path, "v", shape = (3, 2, 2))
    val (shape, vals) = NetCDF3Source.readLocal(spark, path, "v")
    assert(shape == Seq(3, 2, 2))
    assert(vals.toSeq == (0 until 12).map(_.toDouble))
  }

  test("non-NetCDF and HDF5 files are rejected with clear errors") {
    val p1 = tmpNc()
    java.nio.file.Files.write(java.nio.file.Paths.get(p1), "not a netcdf".getBytes)
    val e1 = intercept[IllegalArgumentException](NetCDF3Source.readHeader(spark, p1))
    assert(e1.getMessage.contains("not a NetCDF"))
    val p2 = tmpNc()
    java.nio.file.Files.write(java.nio.file.Paths.get(p2),
      Array(0x89.toByte, 'H'.toByte, 'D'.toByte, 'F'.toByte) ++ new Array[Byte](16))
    val e2 = intercept[IllegalArgumentException](NetCDF3Source.readHeader(spark, p2))
    assert(e2.getMessage.contains("NetCDF-4"))
  }
}
