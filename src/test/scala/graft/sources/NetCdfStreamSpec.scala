package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** `spark.readStream.format("netcdf")` over a growing archive directory —
  * the streaming twin of the multi-file batch read (xr.open_mfdataset
  * shape, user_guide.rst:82). New files become new micro-batches on the
  * same global t_idx axis; the checkpointed offset makes restarts
  * exactly-once at file granularity. */
class NetCdfStreamSpec extends SparkSpec {
  import spark.implicits._

  private def writeMonth(dir: java.io.File, m: Int): Unit = {
    val local = (for (t <- 0 until 3; y <- 0 until 2; x <- 0 until 2)
      yield (t, y, x, (m * 3 + t) * 10.0 + y + x * 0.5)).toDF("t_idx", "y", "x", "value")
    NetCDF4Source.write3D(local, f"${dir.getAbsolutePath}/sst_$m%03d.nc", "sst",
      shape = (3, 2, 2), timeChunk = 2)
  }

  test("a growing archive streams file-by-file on the global time axis") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ncstream").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ncstream_ck").toFile
    writeMonth(dir, 0)
    writeMonth(dir, 1)

    val out = java.nio.file.Files.createTempDirectory("graft_ncstream_out").toFile

    def runOnce(): Unit = {
      val q = spark.readStream.format("netcdf").option("var", "sst")
        .load(dir.getAbsolutePath)
        .writeStream.outputMode("append").format("parquet")
        .option("path", out.getAbsolutePath)
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    def sink() = spark.read.parquet(out.getAbsolutePath)

    runOnce()
    val first = sink()
    assert(first.count() == 2 * 3 * 2 * 2)
    assert(first.filter(col("t_idx") =!= (col("value") / 10.0).cast("int")).count() == 0,
      "global t_idx must match the value encoding")

    // a third file lands; the restarted query (same checkpoint) emits ONLY it
    writeMonth(dir, 2)
    runOnce()
    val all = sink()
    assert(all.count() == 3 * 3 * 2 * 2, "exactly the new file's rows were appended")
    assert(all.agg(max("t_idx")).head.getInt(0) == 8)
    assert(all.select("t_idx", "y", "x").distinct().count() == all.count(),
      "no cell was delivered twice across restarts")

    // nothing new → an empty batch, no duplicates
    runOnce()
    assert(sink().count() == 3 * 3 * 2 * 2)
  }

  test("a backfilled file sorting before the committed prefix fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ncstream3").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ncstream3_ck").toFile
    val out = java.nio.file.Files.createTempDirectory("graft_ncstream3_out").toFile
    // months 1 and 2 stream first; month 0 lands LATE (a backfill)
    writeMonth(dir, 1)
    writeMonth(dir, 2)
    def runOnce(): Unit = {
      val q = spark.readStream.format("netcdf").option("var", "sst")
        .load(dir.getAbsolutePath)
        .writeStream.outputMode("append").format("parquet")
        .option("path", out.getAbsolutePath)
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(out.getAbsolutePath).count() == 2 * 3 * 2 * 2)

    writeMonth(dir, 0) // sst_000.nc sorts BEFORE the committed sst_001.nc
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("archive reordered")),
      s"expected the reorder guard, got: ${messages(ex).mkString(" | ")}")
    // the committed sink is untouched — loud failure, no silent remap
    assert(spark.read.parquet(out.getAbsolutePath).count() == 2 * 3 * 2 * 2)
  }

  test("fileMinAgeMs holds back files modified too recently") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ncstream4").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ncstream4_ck").toFile
    val out = java.nio.file.Files.createTempDirectory("graft_ncstream4_out").toFile
    writeMonth(dir, 0)
    writeMonth(dir, 1)
    // age the first file far into the past; the second stays "in-flight"
    val old = new java.io.File(dir, "sst_000.nc")
    assert(old.setLastModified(System.currentTimeMillis() - 3600L * 1000))
    def runOnce(minAge: Long): Unit = {
      val q = spark.readStream.format("netcdf").option("var", "sst")
        .option("fileMinAgeMs", minAge.toString)
        .load(dir.getAbsolutePath)
        .writeStream.outputMode("append").format("parquet")
        .option("path", out.getAbsolutePath)
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce(minAge = 60L * 1000)
    assert(spark.read.parquet(out.getAbsolutePath).count() == 12,
      "only the settled file is delivered while the fresh one is held back")
    runOnce(minAge = 0)
    assert(spark.read.parquet(out.getAbsolutePath).count() == 24,
      "the held-back file arrives once the age filter passes")
  }

  test("streaming from an initially empty directory picks up the first file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ncstream2").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ncstream2_ck").toFile
    val out = java.nio.file.Files.createTempDirectory("graft_ncstream2_out").toFile
    def runOnce(): Unit = {
      val q = spark.readStream.format("netcdf").option("var", "sst")
        .load(s"${dir.getAbsolutePath}/sst_*.nc")
        .writeStream.outputMode("append").format("parquet")
        .option("path", out.getAbsolutePath)
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def sink() = spark.read.parquet(out.getAbsolutePath)
    runOnce()
    assert(sink().count() == 0)
    writeMonth(dir, 0)
    runOnce()
    assert(sink().count() == 12)
  }
}
