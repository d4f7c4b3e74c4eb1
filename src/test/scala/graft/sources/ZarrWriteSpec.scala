package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `df.write.format("zarr")` — the SQL face of the reference's `to_zarr`
  * (marEx track.py:1748). The insert delegates to the distributed
  * [[ZarrGroup.writeDataset]] chunk writer; dims/chunks/cols arrive as
  * write options, and the store reads back through the same format. */
class ZarrWriteSpec2 extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_zwrite").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def cells(nt: Int, ny: Int, nx: Int) =
    (for (t <- 0 until nt; y <- 0 until ny; x <- 0 until nx)
      yield (t, y, x, t * 100.0 + y * 10.0 + x)).toDF("time_idx", "y_idx", "x_idx", "sst")

  test("write + read round-trips through format(\"zarr\")") {
    val dir = tmpDir()
    val in = cells(6, 4, 5)
    in.write.format("zarr")
      .option("dims", "time:6,y:4,x:5").option("chunks", "2,4,5")
      .option("cols", "sst")
      .mode("append").save(dir)
    val back = spark.read.format("zarr").load(dir)
      .select("time_idx", "y_idx", "x_idx", "sst")
    assert(back.count() == 6 * 4 * 5)
    assert(back.join(in.withColumnRenamed("sst", "expected"),
      Seq("time_idx", "y_idx", "x_idx"))
      .filter(col("sst") =!= col("expected")).count() == 0)
  }

  test("append to an existing store grows the time axis; overwrite replaces it") {
    val dir = tmpDir()
    def write(df: org.apache.spark.sql.DataFrame, mode: String): Unit =
      df.write.format("zarr")
        .option("dims", "time:2,y:2,x:2").option("chunks", "2,2,2")
        .option("cols", "sst")
        .mode(mode).save(dir)
    write(cells(2, 2, 2), "append")
    write(cells(2, 2, 2).withColumn("sst", col("sst") + 500.0), "append")
    val grown = spark.read.format("zarr").load(dir)
    assert(grown.count() == 4 * 2 * 2, "append resizes shape[0], 2+2 slices")
    assert(grown.filter(col("time_idx") >= 2)
      .agg(min("sst")).head.getDouble(0) >= 500.0)
    write(cells(2, 2, 2).withColumn("sst", col("sst") + 1000.0), "overwrite")
    val back = spark.read.format("zarr").load(dir)
    assert(back.count() == 2 * 2 * 2, "overwrite replaces, not appends")
    assert(back.agg(min("sst")).head.getDouble(0) >= 1000.0)
  }

  test("multiple value columns and absent cells (fill) round-trip") {
    val dir = tmpDir()
    // only even t cells present → odd-t chunks are absent, read as fill
    val sparse = cells(4, 2, 2).filter(col("time_idx") % 2 === 0)
      .withColumn("n_obs", lit(3.0))
    sparse.write.format("zarr")
      .option("dims", "time:4,y:2,x:2").option("chunks", "1,2,2")
      .option("cols", "sst,n_obs")
      .mode("append").save(dir)
    val back = spark.read.format("zarr").load(dir)
    assert(back.count() == 4 * 2 * 2, "absent chunks still contribute fill rows")
    assert(back.filter(col("time_idx") % 2 === 1)
      .filter(!isnan(col("sst")) || !isnan(col("n_obs"))).count() == 0,
      "absent cells read as NaN fill")
    assert(back.filter(col("time_idx") % 2 === 0)
      .filter(col("n_obs") =!= 3.0).count() == 0)
  }

  test("rows outside the declared shape are dropped, never aliased into valid chunks") {
    val dir = tmpDir()
    // x_idx=5 is out of the declared 0..4 range: through the linear chunk
    // id it would alias into a DIFFERENT valid chunk and silently corrupt
    // an in-range cell — it must be dropped instead
    val in = cells(2, 2, 5)
      .union(Seq((0, 0, 5, 12345.0), (-1, 0, 0, 54321.0), (0, 9, 0, 77.0))
        .toDF("time_idx", "y_idx", "x_idx", "sst"))
    in.write.format("zarr")
      .option("dims", "time:2,y:2,x:5").option("chunks", "1,2,5")
      .option("cols", "sst")
      .mode("overwrite").save(dir)
    val back = spark.read.format("zarr").load(dir)
    assert(back.count() == 2 * 2 * 5)
    assert(back.filter(col("sst").isin(12345.0, 54321.0, 77.0)).count() == 0,
      "out-of-range rows must not land anywhere")
    assert(back.join(cells(2, 2, 5).withColumnRenamed("sst", "expected"),
      Seq("time_idx", "y_idx", "x_idx"))
      .filter(col("sst") =!= col("expected")).count() == 0,
      "in-range cells are exactly the declared grid")
  }

  test("missing chunks/cols options fail with named errors") {
    val dir = tmpDir()
    val e = intercept[Exception](
      cells(2, 2, 2).write.format("zarr").option("dims", "time:2,y:2,x:2")
        .mode("append").save(dir))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("chunks") || m.contains("cols")))
  }

  test("sharded v3 write: one object per OUTER chunk, reads back cell-exact") {
    val dir = tmpDir()
    val in = cells(6, 4, 6)
    in.write.format("zarr")
      .option("dims", "time:6,y:4,x:6").option("chunks", "2,4,6")
      .option("shard", "1,2,3").option("v3", "true")
      .option("cols", "sst").mode("overwrite").save(dir)
    // the store holds one object per outer chunk (3 along time), not one
    // per inner chunk (3 × 2 × 2 × 2 = 24) — the object-count lever
    val sstDir = new java.io.File(dir, "sst")
    val objs = new java.io.File(sstDir, "c").listFiles().flatMap(t =>
      t.listFiles().flatMap(_.listFiles())).map(_.length())
    assert(objs.length == 3, s"want 3 shard objects, got ${objs.length}")
    // each object ends with the (offset, nbytes) index + crc32c for 8 inner chunks
    assert(objs.forall(_ >= 8 * 16 + 4))
    val meta = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(sstDir, "zarr.json").toPath))
    assert(meta.contains("sharding_indexed") && meta.contains("index_location"))
    val back = spark.read.format("zarr").load(dir)
    assert(back.count() == 6 * 4 * 6)
    assert(back.join(in.withColumnRenamed("sst", "expected"),
      Seq("time_idx", "y_idx", "x_idx"))
      .filter(col("sst") =!= col("expected")).count() == 0)
    // a pushed window over the sharded GROUP store byte-range-reads only
    // its inner chunks — values must still be cell-exact inside the window
    val win = back.filter(col("time_idx") === 3 && col("y_idx") < 2 &&
      col("x_idx").between(3, 5))
    assert(win.count() == 2 * 3)
    assert(win.filter(col("sst") =!=
      col("time_idx") * 100.0 + col("y_idx") * 10.0 + col("x_idx")).count() == 0)
    // sharded stores APPEND (ZarrGroupAppendSpec covers object-count and
    // edge-shard semantics): one more slice grows the axis to 7
    cells(1, 4, 6).write.format("zarr")
      .option("dims", "time:1,y:4,x:6").option("chunks", "2,4,6")
      .option("cols", "sst").mode("append").save(dir)
    assert(spark.read.format("zarr").load(dir).count() == 7 * 4 * 6)
  }

  test("sharded write elides all-fill inner chunks from the object") {
    val dir = tmpDir()
    // only the first time slice carries data: inner chunks of slice t=1
    // inside the same outer chunk are pure fill and must be elided
    cells(1, 4, 4).write.format("zarr")
      .option("dims", "time:2,y:4,x:4").option("chunks", "2,4,4")
      .option("shard", "1,4,4").option("v3", "true")
      .option("cols", "sst").mode("overwrite").save(dir)
    val obj = java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "sst/c/0/0/0").toPath)
    val idx = java.nio.ByteBuffer.wrap(obj).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val base = obj.length - (2 * 16 + 4)
    assert(idx.getLong(base) == 0L && idx.getLong(base + 8) > 0L,
      "t=0 inner chunk stored")
    assert(idx.getLong(base + 16) == -1L && idx.getLong(base + 24) == -1L,
      "t=1 inner chunk elided")
    val back = spark.read.format("zarr").load(dir)
    assert(back.filter(col("time_idx") === 1 && !isnan(col("sst"))).count() == 0,
      "elided inner chunks read back as fill")
    assert(back.filter(col("time_idx") === 0 && isnan(col("sst"))).count() == 0)
  }

  test("rank-2 (time, cell) unstructured stores write and append through SQL") {
    val dir = tmpDir()
    val mesh = (for (t <- 0 until 4; c <- 0 until 6)
      yield (t, c, t * 10.0 + c)).toDF("time_idx", "cell_idx", "flags")
    mesh.write.format("zarr")
      .option("dims", "time:4,cell:6").option("chunks", "2,6")
      .option("cols", "flags").mode("overwrite").save(dir)
    val back = spark.read.format("zarr").load(dir)
    assert(back.columns.toSeq == Seq("time_idx", "cell_idx", "flags"))
    assert(back.count() == 4 * 6)
    assert(back.join(mesh.withColumnRenamed("flags", "e"),
      Seq("time_idx", "cell_idx")).filter(col("flags") =!= col("e")).count() == 0)
    // the 2-D store appends along time like any other
    (for (t <- 0 until 2; c <- 0 until 6)
      yield (t, c, (t + 4) * 10.0 + c)).toDF("time_idx", "cell_idx", "flags")
      .write.format("zarr")
      .option("dims", "time:2,cell:6").option("chunks", "2,6")
      .option("cols", "flags").mode("append").save(dir)
    val grown = spark.read.format("zarr").load(dir)
    assert(grown.count() == 6 * 6)
    assert(grown.filter(col("flags") =!=
      col("time_idx") * 10.0 + col("cell_idx")).count() == 0)
  }

  test("shard without v3, or a non-dividing inner shape, fail by name") {
    val dir = tmpDir()
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val e1 = intercept[Exception](
      cells(2, 2, 2).write.format("zarr")
        .option("dims", "time:2,y:2,x:2").option("chunks", "2,2,2")
        .option("shard", "1,2,2").option("cols", "sst")
        .mode("overwrite").save(dir))
    assert(msgs(e1).exists(_.contains("v3")))
    val e2 = intercept[Exception](
      cells(2, 2, 2).write.format("zarr")
        .option("dims", "time:2,y:2,x:2").option("chunks", "2,2,2")
        .option("shard", "1,2,3").option("v3", "true").option("cols", "sst")
        .mode("overwrite").save(dir))
    assert(msgs(e2).exists(_.contains("divide")))
    // a shard option on an APPEND is named too, never silently dropped
    cells(2, 2, 2).write.format("zarr")
      .option("dims", "time:2,y:2,x:2").option("chunks", "2,2,2")
      .option("v3", "true").option("cols", "sst").mode("overwrite").save(dir)
    val e3 = intercept[Exception](
      cells(1, 2, 2).write.format("zarr")
        .option("dims", "time:1,y:2,x:2").option("chunks", "2,2,2")
        .option("shard", "1,2,2").option("v3", "true").option("cols", "sst")
        .mode("append").save(dir))
    assert(msgs(e3).exists(_.contains("shard")))
    assert(spark.read.format("zarr").load(dir).count() == 2 * 2 * 2,
      "the rejected append leaves the store untouched")
  }
}
