package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.core.Tables

/** Drives the streaming operators with file-source streams over the real
  * events parquet (re-written µs-normalized), memory sink, synchronous
  * processAllAvailable — and checks against the equivalent batch queries. */
class StreamingOpsSpec extends SparkSpec {

  private def eventsDir: String = {
    val dir = Files.createTempDirectory("graft_stream_in").toString
    Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("windowed counts: streaming result equals batch aggregation") {
    val dir = eventsDir
    val stream = spark.readStream.schema(StreamingOps.eventSchema).parquet(dir)
    // complete mode: append would (correctly) withhold windows the final
    // watermark hasn't closed — here we want the full comparison
    val q = StreamingOps.windowedCounts(stream)
      .writeStream.outputMode("complete").format("memory").queryName("win_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("win_out")
      .agg(sum("n")).head().getLong(0)
    val batch = spark.read.parquet(dir).count()
    assert(streamed == batch, s"windowed total $streamed != event count $batch")
    assert(spark.table("win_out").count() > 0)
  }

  test("session_window totals match the batch lag/cumsum sessionizer") {
    val dir = eventsDir
    val stream = spark.readStream.schema(StreamingOps.eventSchema).parquet(dir)
    val q = StreamingOps.sessionized(stream, gap = "30 minutes")
      .writeStream.outputMode("complete").format("memory").queryName("sess_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamedSessions = spark.table("sess_out")
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
    // batch sessionizer (same as q27)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val batchSessions = spark.read.parquet(dir)
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_sess", when(col("prev_ts").isNull ||
        unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L).otherwise(0L))
      .groupBy("user_id").agg(sum("new_sess").as("n_sessions_batch"))
    val joined = streamedSessions.join(batchSessions, "user_id")
      .filter(col("n_sessions") =!= col("n_sessions_batch"))
    assert(joined.count() == 0, "streaming session counts diverge from batch")
  }

  test("stateful user totals accumulate exactly once per event") {
    val dir = eventsDir
    val stream = spark.readStream.schema(StreamingOps.eventSchema).parquet(dir)
    val q = StreamingOps.statefulUserTotals(stream)
      .writeStream.outputMode("append").format("memory").queryName("state_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // last emitted row per user carries the final running count
    val finalCounts = spark.table("state_out")
      .groupBy("user_id").agg(max("n_events").as("n"))
    val expected = spark.read.parquet(dir).groupBy("user_id").count()
    val bad = finalCounts.join(expected, "user_id")
      .filter(col("n") =!= col("count")).count()
    assert(bad == 0, "stateful totals diverge from batch counts")
  }
}
