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

  test("CF-packed classic files decode physical values (ERA5-download shape)") {
    // values on the 0.25 grid so i16 quantization is exact; one hole
    val path = tmpNc()
    val df = (for (t <- 0 until 3; y <- 0 until 3; x <- 0 until 4
        if !(t == 1 && y == 1 && x == 1))
      yield (t, y, x, t * 1.0 + y * 0.25 + x * 0.25))
      .toDF("t_idx", "y", "x", "value")
    NetCDF3Source.write3D(df, path, "sst", shape = (3, 3, 4),
      pack = Some(NetCDF4Source.Pack(scale = 0.25)))
    val h = NetCDF3Source.readHeader(spark, path)
    assert(h.vars.head.ncType == 3, "the variable must be stored as NC_SHORT")
    assert(h.vars.head.numAttr("scale_factor").contains(0.25))
    // utility read: CF-decoded
    val ds = NetCDF3Source.read3D(spark, path, "sst")
    assert(ds.filter(isnan(col("value"))).count() == 1, "the hole reads NaN")
    assert(ds.filter(!isnan(col("value")) && col("value") =!=
      col("t_idx") * 1.0 + col("y") * 0.25 + col("x") * 0.25).count() == 0,
      "packed classic cells must decode to physical values, not raw codes")
    // DSv2 read: same decode
    val sql = spark.read.format("netcdf").option("var", "sst").load(path)
    assert(sql.filter(isnan(col("value"))).count() == 1)
    assert(sql.filter(!isnan(col("value")) && col("value") =!=
      col("t_idx") * 1.0 + col("y") * 0.25 + col("x") * 0.25).count() == 0)
  }

  test("the legacy missing_value spelling masks like _FillValue") {
    val path = tmpNc()
    val df = (for (t <- 0 until 2; y <- 0 until 2; x <- 0 until 2
        if !(t == 0 && y == 0 && x == 0))
      yield (t, y, x, t * 1.0)).toDF("t_idx", "y", "x", "value")
    NetCDF3Source.write3D(df, path, "sst", shape = (2, 2, 2),
      pack = Some(NetCDF4Source.Pack(scale = 0.5)),
      fillAttr = "missing_value")
    val sql = spark.read.format("netcdf").option("var", "sst").load(path)
    assert(sql.filter(isnan(col("value"))).count() == 1,
      "missing_value-coded cells must mask to NaN")
    assert(sql.filter(!isnan(col("value")) &&
      col("value") =!= col("t_idx") * 1.0).count() == 0)
  }

  test("a single short record variable packs records TIGHTLY (classic special case)") {
    // the classic-format spec: with exactly ONE record variable of type
    // byte/char/short, record slabs are NOT padded to 4 bytes — netCDF-C
    // readers recompute recsize with this rule, so padding here would
    // shift every record after the first by 2 bytes on odd-cell grids
    val path = tmpNc()
    val df = (for (t <- 0 until 3; y <- 0 until 1; x <- 0 until 3)
      yield (t, y, x, t * 10.0 + x)).toDF("t_idx", "y", "x", "value")
    NetCDF3Source.write3D(df, path, "sst", shape = (3, 1, 3),
      pack = Some(NetCDF4Source.Pack(scale = 1.0)))
    val h = NetCDF3Source.readHeader(spark, path)
    assert(h.recSize == 6, s"3 shorts pack tightly, got recSize ${h.recSize}")
    // the file ends exactly at header + 3 tight records
    val fileLen = new java.io.File(path).length()
    assert(fileLen == h.vars.head.begin + 3 * 6,
      s"no padding bytes may follow a tight record (len $fileLen)")
    val ds = NetCDF3Source.read3D(spark, path, "sst")
    assert(ds.count() == 9)
    assert(ds.filter(col("value") =!=
      col("t_idx") * 10.0 + col("x")).count() == 0,
      "records after the first must decode from the TIGHT stride")
    // and through the DSv2 scan
    val sql = spark.read.format("netcdf").option("var", "sst").load(path)
    assert(sql.filter(col("value") =!=
      col("t_idx") * 10.0 + col("x")).count() == 0)
  }
}
