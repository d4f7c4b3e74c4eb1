package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.marex._
import graft.sources.NetCDF4Source

/** The live-archive pipeline end-to-end: NC4 files land in a directory →
  * `readStream.format("netcdf")` emits them file-by-file on the global
  * time axis → extreme flags → [[StreamingTracker]] labels events
  * incrementally — and the result equals the batch tracker run over the
  * same archive through the BATCH multi-file read. This is the shape a
  * production deployment takes: the satellite feed appends a file per
  * period, and tracking cost stays per-file, never per-archive. */
class NetCdfToTrackerSpec extends SparkSpec {
  import spark.implicits._

  private val ny = 24
  private val nx = 48
  private lazy val spec2 = GridSpec(ny = ny, nx = nx, periodicX = true)
  private lazy val geom = SyntheticData.geometry(spark, ny, nx).cache()
  private val cfg = TrackConfig(rFill = 1, tFill = 0, areaFilterQuartile = 0.0,
    allowMerging = false, dropSmallestObject = false)
  private val epoch = "2000-01-01" // SyntheticData.stormFlags epoch

  /** Write one 6-day file whose `value` is 1.0 on flagged cells. */
  private def writeFile(dir: java.io.File, idx: Int, flags: org.apache.spark.sql.DataFrame): Unit = {
    val days = 6
    val base = idx * days
    val cells = flags
      .withColumn("t_idx",
        datediff(to_date(col("time")), lit(epoch)).cast("int") - base)
      .filter(col("t_idx").between(0, days - 1))
      .select(col("t_idx"), col("y"), col("x"), lit(1.0).as("value"))
    NetCDF4Source.write3D(cells, f"${dir.getAbsolutePath}/sst_$idx%03d.nc",
      "sst", shape = (days, ny, nx), timeChunk = 3)
  }

  test("netcdf stream → streaming tracker equals batch read → batch tracker") {
    val dir = java.nio.file.Files.createTempDirectory("graft_nc2trk").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("graft_nc2trk_ck").toFile
    val sinkDir = java.nio.file.Files.createTempDirectory("graft_nc2trk_sink").toString
    val flags = SyntheticData.stormFlags(spark, nDays = 18, ny = ny, nx = nx,
      nStorms = 22, seed = 41L).cache()

    val tracker = new StreamingTracker(geom, spec2, cfg, sinkDir)
    def flagsOf(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("value") > 0.5 && !isnan(col("value")))
      .select(expr(s"timestampadd(DAY, t_idx, TIMESTAMP '$epoch 00:00:00')").as("time"),
        col("y"), col("x"))
    def runOnce(): Unit = {
      val q = spark.readStream.format("netcdf").option("var", "sst")
        .load(dir.getAbsolutePath)
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
          tracker.processBatch(flagsOf(b), id))
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // files arrive one at a time; each AvailableNow run ingests the new one
    (0 until 3).foreach { i => writeFile(dir, i, flags); runOnce() }

    val streamed = StreamingTracker.resolvedIdField(spark, sinkDir)
    val batchArchive = flagsOf(
      spark.read.format("netcdf").option("var", "sst").load(dir.getAbsolutePath))
    val batch = Track.track(batchArchive, geom, spec2, cfg).idField
    assert(batch.count() > 0, "sanity: the storm field must flag cells")

    // same partition of the same cells, up to an id bijection
    assert(batch.count() == streamed.count(), "cell counts differ")
    val joined = batch.select(col("time"), col("y"), col("x"), col("event_id").as("b"))
      .join(streamed.select(col("time"), col("y"), col("x"), col("event_id").as("i")),
        Seq("time", "y", "x"))
    assert(joined.count() == batch.count(), "cell sets differ")
    val pairs = joined.select("b", "i").distinct()
    val n = pairs.count()
    assert(pairs.select("b").distinct().count() == n, "a batch event maps to 2+ stream ids")
    assert(pairs.select("i").distinct().count() == n, "a stream id maps to 2+ batch events")
  }
}
