package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.marex._

/** The round-10 production recipe end-to-end: a satellite feed appends
  * days onto a CF-PACKED + SHARDED zarr store (the composed archive
  * layout — int16 inner chunks inside sharding_indexed objects, q105's
  * shape) → `readStream.format("zarr")` delivers exactly the new slices
  * (offset = committed shape[0]) with mask_and_scale decode → extreme
  * flags → [[StreamingTracker]] labels events incrementally — and the
  * result equals the batch tracker over a batch read of the same store.
  * Ingest cost stays per-append, never per-archive. */
class ZarrPackedShardToTrackerSpec extends SparkSpec {
  import spark.implicits._

  private val ny = 24
  private val nx = 48
  private lazy val spec2 = GridSpec(ny = ny, nx = nx, periodicX = true)
  private lazy val geom = SyntheticData.geometry(spark, ny, nx).cache()
  private val cfg = TrackConfig(rFill = 1, tFill = 0, areaFilterQuartile = 0.0,
    allowMerging = false, dropSmallestObject = false)
  private val epoch = "2000-01-01" // SyntheticData.stormFlags epoch

  /** Flagged cells of days [t0, t0+days) as a packed-grid slab: 1.0 on
    * flagged cells (exact on the 0.01 grid), absent cells stay the raw
    * fill code → NaN on read. */
  private def slab(flags: org.apache.spark.sql.DataFrame, t0: Int,
      days: Int): org.apache.spark.sql.DataFrame = flags
    .withColumn("time_idx", datediff(to_date(col("time")), lit(epoch)).cast("int") - t0)
    .filter(col("time_idx").between(0, days - 1))
    .select(col("time_idx"), col("y").as("y_idx"), col("x").as("x_idx"),
      lit(1.0).as("sst"))

  test("packed sharded feed → zarr stream → streaming tracker ≡ batch") {
    val store = java.nio.file.Files.createTempDirectory("graft_zps2trk").toFile.getAbsolutePath
    val ckpt = java.nio.file.Files.createTempDirectory("graft_zps2trk_ck").toFile
    val sinkDir = java.nio.file.Files.createTempDirectory("graft_zps2trk_sink").toString
    val flags = SyntheticData.stormFlags(spark, nDays = 18, ny = ny, nx = nx,
      nStorms = 22, seed = 41L).cache()

    val tracker = new StreamingTracker(geom, spec2, cfg, sinkDir)
    def flagsOf(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("value") > 0.5 && !isnan(col("value")))
      .select(expr(s"timestampadd(DAY, t_idx, TIMESTAMP '$epoch 00:00:00')").as("time"),
        col("y"), col("x"))
    def runOnce(): Unit = {
      val q = spark.readStream.format("zarr").load(s"$store/sst")
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
          tracker.processBatch(flagsOf(b), id))
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // base: 6 days, packed + sharded (time chunk 3, inner 1×12×24 → 2×2×2
    // inner grid per outer chunk); appends of 6 days land as new shard
    // objects
    slab(flags, 0, 6).write.format("zarr")
      .option("dims", s"time:6,y:$ny,x:$nx").option("chunks", s"3,$ny,$nx")
      .option("shard", s"1,${ny / 2},${nx / 2}").option("v3", "true")
      .option("cols", "sst").option("pack", "0.01")
      .mode("overwrite").save(store)
    runOnce()
    (1 until 3).foreach { i =>
      slab(flags, i * 6, 6).write.format("zarr")
        .option("dims", s"time:6,y:$ny,x:$nx").option("chunks", s"3,$ny,$nx")
        .option("cols", "sst")
        .mode("append").save(store)
      runOnce()
    }

    val streamed = StreamingTracker.resolvedIdField(spark, sinkDir)
    val batchArchive = flagsOf(spark.read.format("zarr").load(s"$store/sst"))
    val batch = Track.track(batchArchive, geom, spec2, cfg).idField
    assert(batch.count() > 0, "sanity: the storm field must flag cells")
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
