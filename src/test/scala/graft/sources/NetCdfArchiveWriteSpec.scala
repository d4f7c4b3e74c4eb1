package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[NetCDFSource.writeArchive]] — the distributed multi-file sink (one
  * NC4 file per time block, assembled in executor tasks) must round-trip
  * through the multi-file reader on the same global time axis. */
class NetCdfArchiveWriteSpec extends SparkSpec {
  import spark.implicits._

  private def grid(nt: Int, ny: Int, nx: Int) =
    (for (t <- 0 until nt; y <- 0 until ny; x <- 0 until nx)
      yield (t, y, x, t * 5.0 + y * 0.5 + x * 0.125)).toDF("t_idx", "y", "x", "value")

  private def msgs(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))

  test("archive write round-trips through the multi-file reader") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mfw").toFile.getAbsolutePath
    val in = grid(10, 3, 4)
    val files = NetCDFSource.writeArchive(in, dir, "sst",
      shape = (10, 3, 4), blockNt = 4, timeChunk = 2)
    assert(files == Seq("sst_00000.nc", "sst_00001.nc", "sst_00002.nc"))
    val back = spark.read.format("netcdf").option("var", "sst").load(dir)
    assert(back.count() == 10 * 3 * 4)
    assert(back.join(in.withColumnRenamed("value", "expected"), Seq("t_idx", "y", "x"))
      .filter(col("value") =!= col("expected")).count() == 0)
  }

  test("a time block with no cells still writes an all-fill file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mfw2").toFile.getAbsolutePath
    // t 4..7 (block 1 of 3) has no rows at all
    val in = grid(12, 2, 2).filter(col("t_idx") < 4 || col("t_idx") >= 8)
    val files = NetCDFSource.writeArchive(in, dir, "sst",
      shape = (12, 2, 2), blockNt = 4, timeChunk = 4)
    assert(files.length == 3)
    val back = spark.read.format("netcdf").option("var", "sst").load(dir)
    assert(back.count() == 12 * 2 * 2, "the dense axis has no holes")
    assert(back.filter(col("t_idx").between(4, 7))
      .filter(!isnan(col("value"))).count() == 0, "the empty block is all fill")
    assert(back.filter(!isnan(col("value"))).count() == 8 * 2 * 2)
  }

  test("df.write.format(\"netcdf\") writes the archive through SQL") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mfw4").toFile.getAbsolutePath
    val in = grid(8, 3, 4)
    in.write.format("netcdf").option("var", "sst")
      .option("shape", "8:3:4").option("blockNt", "4").option("timeChunk", "2")
      .mode("overwrite").save(dir)
    val back = spark.read.format("netcdf").option("var", "sst").load(dir)
    assert(back.count() == 8 * 3 * 4)
    assert(back.join(in.withColumnRenamed("value", "expected"), Seq("t_idx", "y", "x"))
      .filter(col("value") =!= col("expected")).count() == 0)
    in.withColumn("value", col("value") + 100.0)
      .write.format("netcdf").option("var", "sst")
      .option("shape", "8:3:4").option("blockNt", "8")
      .mode("overwrite").save(dir)
    val again = spark.read.format("netcdf").option("var", "sst").load(dir)
    assert(again.agg(min("value")).head.getDouble(0) >= 100.0)
  }

  test("mode(\"append\") lands new block files that continue the archive") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mfw5").toFile.getAbsolutePath
    grid(8, 3, 4).write.format("netcdf").option("var", "sst")
      .option("shape", "8:3:4").option("blockNt", "4")
      .mode("overwrite").save(dir)
    // the appended block set carries block-set-LOCAL t_idx 0..3; its file
    // must number after the committed ones so the name-ordered axis grows
    grid(4, 3, 4).withColumn("value", col("value") + 1000.0)
      .write.format("netcdf").option("var", "sst")
      .option("shape", "4:3:4").option("blockNt", "4")
      .mode("append").save(dir)
    val names = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted // drop Hadoop .crc sidecars
    assert(names.toSeq == Seq("part_00000.nc", "part_00001.nc", "part_00002.nc"))
    val back = spark.read.format("netcdf").option("var", "sst").load(dir)
    assert(back.count() == 12 * 3 * 4)
    assert(back.filter(col("t_idx") >= 8)
      .filter(col("value") =!= (col("t_idx") - 8) * 5.0 + col("y") * 0.5 +
        col("x") * 0.125 + 1000.0).count() == 0,
      "appended slices ride the global axis after the committed ones")
    assert(back.filter(col("t_idx") < 8)
      .filter(col("value") =!= col("t_idx") * 5.0 + col("y") * 0.5 +
        col("x") * 0.125).count() == 0, "committed slices untouched")
    // a prefix that does not match the archive's naming is a named error
    val e = intercept[Exception](
      grid(4, 3, 4).write.format("netcdf").option("var", "sst")
        .option("shape", "4:3:4").option("prefix", "other")
        .mode("append").save(dir))
    assert(msgs(e).exists(_.contains("naming")))
    // a spatial-shape mismatch is a named error too
    val e2 = intercept[Exception](
      grid(4, 2, 4).write.format("netcdf").option("var", "sst")
        .option("shape", "4:2:4").mode("append").save(dir))
    assert(msgs(e2).exists(_.contains("spatially")))
    assert(spark.read.format("netcdf").option("var", "sst").load(dir)
      .count() == 12 * 3 * 4, "failed appends leave the archive intact")
    // forgetting the block-set-local shift (archive-global t_idx) is a
    // named error, not a silent all-fill landing
    val e3 = intercept[Exception](
      grid(16, 3, 4).filter(col("t_idx") >= 12)
        .write.format("netcdf").option("var", "sst")
        .option("shape", "4:3:4").option("blockNt", "4")
        .mode("append").save(dir))
    assert(msgs(e3).exists(_.contains("LOCAL")))
    // a hand-landed non-5-digit name would sort wrong after the append's
    // next file — reject by name before writing anything
    java.nio.file.Files.copy(
      new java.io.File(dir, "part_00000.nc").toPath,
      new java.io.File(dir, "part_0.nc").toPath)
    val e4 = intercept[Exception](
      grid(4, 3, 4).write.format("netcdf").option("var", "sst")
        .option("shape", "4:3:4").option("blockNt", "4")
        .mode("append").save(dir))
    assert(msgs(e4).exists(_.contains("5-digit")))
  }

  test("CF-packed i16 + szip archives write distributed, CF-decode on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mfw6").toFile.getAbsolutePath
    // quantize at 0.125: every grid value (t*5 + y*0.5 + x*0.125) is an
    // exact multiple, so the packed round-trip is exact
    val in = grid(8, 3, 4)
    in.write.format("netcdf").option("var", "sst")
      .option("shape", "8:3:4").option("blockNt", "4").option("timeChunk", "2")
      .option("pack", "0.125").option("compressor", "szip")
      .mode("overwrite").save(dir)
    val back = spark.read.format("netcdf").option("var", "sst").load(dir)
    assert(back.count() == 8 * 3 * 4)
    assert(back.join(in.withColumnRenamed("value", "expected"), Seq("t_idx", "y", "x"))
      .filter(col("value") =!= col("expected")).count() == 0,
      "scale 0.125 packs every t*5 + y*0.5 + x*0.125 value exactly")
    // appends inherit the declared layout: land one more packed block —
    // its VALUES must decode exactly, not just count
    grid(4, 3, 4).withColumn("value", col("value") + 0.25)
      .write.format("netcdf").option("var", "sst")
      .option("shape", "4:3:4").option("blockNt", "4")
      .option("pack", "0.125").option("compressor", "szip")
      .mode("append").save(dir)
    val grown = spark.read.format("netcdf").option("var", "sst").load(dir)
    assert(grown.count() == 12 * 3 * 4)
    assert(grown.filter(col("t_idx") >= 8)
      .filter(col("value") =!= (col("t_idx") - 8) * 5.0 + col("y") * 0.5 +
        col("x") * 0.125 + 0.25).count() == 0,
      "the appended packed block's scale/offset attrs and szip payload decode exactly")
    // szip without pack stays the named error on the archive path too
    val e = intercept[Exception](
      grid(4, 3, 4).write.format("netcdf").option("var", "sst")
        .option("shape", "4:3:4").option("compressor", "szip")
        .mode("append").save(dir))
    assert(msgs(e).exists(_.contains("szip")))
  }

  test("out-of-range rows are dropped, ragged tail block sizes correctly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mfw3").toFile.getAbsolutePath
    val in = grid(9, 2, 2) // block 2 holds only t 8 (ragged)
      .union(Seq((99, 0, 0, 1.0), (-1, 0, 0, 2.0)).toDF("t_idx", "y", "x", "value"))
    NetCDFSource.writeArchive(in, dir, "sst",
      shape = (9, 2, 2), blockNt = 4, timeChunk = 4)
    val back = spark.read.format("netcdf").option("var", "sst").load(dir)
    assert(back.count() == 9 * 2 * 2)
    assert(back.agg(max("t_idx")).head.getInt(0) == 8)
  }
}
