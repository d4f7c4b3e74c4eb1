package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.marex.{GridSpec, SyntheticData, Track, TrackConfig}

/** The streaming tracker over micro-batches must equal the batch space-time
  * CCL tracker on the same field (up to an id bijection), across retroactive
  * merges and a mid-stream restart. */
class StreamingTrackerSpec extends SparkSpec {
  import spark.implicits._

  private val ny = 16
  private val nx = 32
  private lazy val spec = GridSpec(ny = ny, nx = nx, periodicX = true)
  private lazy val geom = SyntheticData.geometry(spark, ny, nx).cache()
  private val cfg = TrackConfig(rFill = 1, tFill = 0, areaFilterQuartile = 0.0,
    dropSmallestObject = false, allowMerging = false)

  private def ts(day: Int): Timestamp =
    new Timestamp(Timestamp.valueOf("2000-01-01 00:00:00").getTime + day * 86400000L)

  private def assertEquivalent(batch: org.apache.spark.sql.DataFrame,
      streamed: org.apache.spark.sql.DataFrame): Unit = {
    assert(batch.count() == streamed.count(), "cell counts differ")
    val joined = batch.select(col("time"), col("y"), col("x"), col("event_id").as("b"))
      .join(streamed.select(col("time"), col("y"), col("x"), col("event_id").as("i")),
        Seq("time", "y", "x"))
    assert(joined.count() == batch.count(), "cell sets differ")
    val pairs = joined.select("b", "i").distinct().cache()
    val n = pairs.count()
    assert(pairs.select("b").distinct().count() == n)
    assert(pairs.select("i").distinct().count() == n)
    pairs.unpersist()
  }

  test("micro-batched stream tracking equals batch tracking, surviving a restart") {
    val sinkDir = Files.createTempDirectory("graft_stream_track").toString
    val flags = SyntheticData.stormFlags(spark, nDays = 24, ny = ny, nx = nx,
      nStorms = 24, seed = 3L).cache()
    val blocks = Seq(0 -> 6, 6 -> 12, 12 -> 18, 18 -> 24).map { case (a, b) =>
      flags.filter(col("time") >= lit(ts(a)) && col("time") < lit(ts(b)))
        .collect().map(r => (r.getTimestamp(0), r.getInt(1), r.getInt(2)))
    }

    implicit val sq = spark.sqlContext
    val ms1 = MemoryStream[(Timestamp, Int, Int)]
    val t1 = new StreamingTracker(geom, spec, cfg, sinkDir)
    val q1 = ms1.toDS().toDF("time", "y", "x")
      .writeStream.foreachBatch(t1.processBatch _).start()
    blocks.take(2).foreach { b => ms1.addData(b.toSeq); q1.processAllAvailable() }
    q1.stop()

    // restart: fresh tracker instance, state rebuilt from the sink alone.
    // The first delivery REPLAYS the last committed block — the crash
    // window where the tracker committed its manifest but the engine's own
    // commit log didn't: a restarted query re-delivers that batch under a
    // fresh batchId. The manifest's idempotence key must make it a no-op.
    val ms2 = MemoryStream[(Timestamp, Int, Int)]
    val t2 = new StreamingTracker(geom, spec, cfg, sinkDir)
    t2.restoreState(spark)
    val q2 = ms2.toDS().toDF("time", "y", "x")
      .writeStream.foreachBatch(t2.processBatch _).start()
    (blocks(1) +: blocks.drop(2)).foreach { b =>
      ms2.addData(b.toSeq); q2.processAllAvailable()
    }
    q2.stop()

    val streamed = StreamingTracker.resolvedIdField(spark, sinkDir)
    val batch = Track.track(flags, geom, spec, cfg).idField
    assertEquivalent(batch, streamed)
  }

  test("tFill=2 stream (watermark holdback) equals batch tracking across a restart") {
    val sinkDir = Files.createTempDirectory("graft_stream_track_tf").toString
    val tcfg = cfg.copy(tFill = 2)
    val flags = SyntheticData.stormFlags(spark, nDays = 20, ny = ny, nx = nx,
      nStorms = 20, seed = 7L).cache()
    val blocks = Seq(0 -> 7, 7 -> 13, 13 -> 20).map { case (a, b) =>
      flags.filter(col("time") >= lit(ts(a)) && col("time") < lit(ts(b)))
        .toDF("time", "y", "x")
    }
    val t1 = new StreamingTracker(geom, spec, tcfg, sinkDir)
    t1.processBatch(blocks(0), 0L)
    t1.processBatch(blocks(1), 1L)
    // restart mid-stream: the held (provisional) tail must survive via the
    // persisted state, not be silently dropped
    val t2 = new StreamingTracker(geom, spec, tcfg, sinkDir)
    t2.restoreState(spark)
    t2.processBatch(blocks(2), 0L)
    t2.flush(spark) // archive end: release the last tFill slices
    val streamed = StreamingTracker.resolvedIdField(spark, sinkDir)
    val batch = Track.track(flags, geom, spec, tcfg).idField
    assertEquivalent(batch, streamed)
  }

  test("remap ledger closes transitively at read time") {
    val sinkDir = Files.createTempDirectory("graft_stream_track2").toString
    val cfg0 = cfg.copy(rFill = 0)
    val t = new StreamingTracker(geom, spec, cfg0, sinkDir)
    // three separate columns, then two bridges landing in later batches:
    // (a|b) joined at t2, ((a b)|c) joined at t3 → ledger chains to one id
    def colCells(day: Int, x: Int): Seq[(Timestamp, Int, Int)] =
      (4 to 6).map(y => (ts(day), y, x))
    t.processBatch((0 to 1).flatMap(d =>
      colCells(d, 4) ++ colCells(d, 8) ++ colCells(d, 12)).toDF("time", "y", "x"), 0L)
    t.processBatch(((4 to 8).map(x => (ts(2), 5, x)) ++ colCells(2, 12))
      .toDF("time", "y", "x"), 1L)
    t.processBatch((4 to 12).map(x => (ts(3), 5, x)).toDF("time", "y", "x"), 2L)
    val resolved = StreamingTracker.resolvedIdField(spark, sinkDir)
    assert(resolved.select("event_id").distinct().count() == 1,
      "all cells must resolve to one event through the chained ledger")
    val oneShot = Track.track(resolved.select("time", "y", "x"), geom, spec, cfg0).idField
    assert(oneShot.select("event_id").distinct().count() == 1)
  }

  test("merging-mode stream equals the batch merging tracker across a restart") {
    val sinkDir = Files.createTempDirectory("graft_stream_track_m").toString
    val mCfg = cfg.copy(allowMerging = true)
    val flags = SyntheticData.stormFlags(spark, nDays = 18, ny = ny, nx = nx,
      nStorms = 20, seed = 5L).cache()
    val blocks = Seq(0 -> 6, 6 -> 12, 12 -> 18).map { case (a, b) =>
      flags.filter(col("time") >= lit(ts(a)) && col("time") < lit(ts(b)))
    }

    val t1 = new StreamingTracker(geom, spec, mCfg, sinkDir)
    t1.processBatch(blocks(0), 0L)
    t1.processBatch(blocks(1), 1L)

    // restart: the seam (resolved gids + event ids) must come back from the
    // persisted seam partition — the event-id sink alone cannot rebuild it
    val t2 = new StreamingTracker(geom, spec, mCfg, sinkDir)
    t2.restoreState(spark)
    t2.processBatch(blocks(1), 0L) // cross-restart replay → must be a no-op
    t2.processBatch(blocks(2), 1L)

    val streamed = StreamingTracker.resolvedIdField(spark, sinkDir)
    val res = Track.track(flags, geom, spec, mCfg)
    assertEquivalent(res.idField, streamed)
    // genealogy accumulates with the same per-timestep row counts as batch
    val streamMerges = StreamingTracker.mergesTable(spark, sinkDir)
    val b = res.merges.groupBy("time").count().collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val s = streamMerges.groupBy("time").count().collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(b == s, s"merge genealogy differs: batch=$b stream=$s")
  }

  test("malformed manifest fails restore with a clear error, not a regex crash") {
    val sinkDir = Files.createTempDirectory("graft_stream_track3").toString
    val t = new StreamingTracker(geom, spec, cfg, sinkDir)
    t.processBatch(Seq((ts(0), 5, 5), (ts(0), 5, 6)).toDF("time", "y", "x"), 0L)
    // simulate a torn manifest (the failure writeManifest's temp+rename now
    // prevents, but a foreign writer could still produce)
    Files.write(java.nio.file.Paths.get(sinkDir, "state.json"),
      """{"committedSeq": 0, "gapAf""".getBytes("UTF-8"))
    Files.deleteIfExists(java.nio.file.Paths.get(sinkDir, ".state.json.crc"))
    val t2 = new StreamingTracker(geom, spec, cfg, sinkDir)
    val e = intercept[IllegalStateException] { t2.restoreState(spark) }
    assert(e.getMessage.contains("malformed"))
    assert(e.getMessage.contains("gapAfterSeam"))
  }
}
