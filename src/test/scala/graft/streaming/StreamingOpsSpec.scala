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

  test("streaming extreme runs match the batch run detector") {
    import spark.implicits._
    // 3 pixels × 60 days of deterministic anomalies; last two days are
    // forced non-extreme so every qualifying run closes in-stream.
    val t0 = java.time.LocalDate.of(2020, 1, 1)
    val rows = for (y <- 0L to 2L; d <- 0 until 60) yield {
      val hot = d < 58 && math.sin(d / 3.0 + y) > 0.2
      (y, 0L,
        java.sql.Timestamp.valueOf(t0.plusDays(d).atStartOfDay()),
        if (hot) 2.0 + y + (d % 3) else -1.0)
    }
    val dir = Files.createTempDirectory("graft_stream_anom").toString
    rows.toDF("y", "x", "time", "anomaly").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val thresholds = (for (y <- 0L to 2L; doy <- 1 to 366)
      yield (y, 0L, doy, 1.0)).toDF("y", "x", "doy", "threshold")

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("y", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("time", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("anomaly", org.apache.spark.sql.types.DoubleType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamingOps.extremeRuns(
        StreamingOps.extremeFlags(stream, thresholds), minDuration = 5)
      .writeStream.outputMode("append").format("memory").queryName("runs_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("runs_out")
      .select("y", "x", "run_start", "run_end", "n_days", "max_anomaly")
      .collect().map(_.toSeq).toSet

    // batch run detector: run-id via date − row_number (consecutive-day trick)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("y", "x").orderBy("time")
    val batch = spark.read.parquet(dir)
      .withColumn("extreme", col("anomaly") >= lit(1.0))
      .filter(col("extreme"))
      .withColumn("rid", datediff(col("time"), lit("2020-01-01"))
        - row_number().over(w))
      .groupBy("y", "x", "rid")
      .agg(min("time").as("run_start"), max("time").as("run_end"),
        count(lit(1)).as("n_days"), max("anomaly").as("max_anomaly"))
      .filter(col("n_days") >= 5)
      .select("y", "x", "run_start", "run_end", "n_days", "max_anomaly")
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty, "test pattern produced no runs — fixture bug")
    assert(streamed == batch,
      s"streamed runs diverge: only-streamed=${streamed -- batch}, only-batch=${batch -- streamed}")
  }

  test("streaming extreme fraction sums to the batch extreme count") {
    import spark.implicits._
    val t0 = java.time.LocalDate.of(2021, 6, 1)
    val rows = for (y <- 0L to 4L; d <- 0 until 30) yield
      (y, 0L, java.sql.Timestamp.valueOf(t0.plusDays(d).atStartOfDay()),
        if ((d + y) % 3 == 0) 5.0 else 0.5)
    val dir = Files.createTempDirectory("graft_stream_frac").toString
    rows.toDF("y", "x", "time", "anomaly").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val thresholds = (for (y <- 0L to 4L; doy <- 1 to 366)
      yield (y, 0L, doy, 1.0)).toDF("y", "x", "doy", "threshold")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("y", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("time", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("anomaly", org.apache.spark.sql.types.DoubleType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamingOps.extremeFraction(
        StreamingOps.extremeFlags(stream, thresholds))
      .writeStream.outputMode("complete").format("memory").queryName("frac_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamedExtreme = spark.table("frac_out").agg(sum("n_extreme")).head().getLong(0)
    val streamedCells = spark.table("frac_out").agg(sum("n_cells")).head().getLong(0)
    val batchExtreme = spark.read.parquet(dir).filter(col("anomaly") >= 1.0).count()
    assert(streamedCells == 150L)
    assert(streamedExtreme == batchExtreme,
      s"extreme counts diverge: $streamedExtreme vs $batchExtreme")
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

  test("streaming dedup keeps one row per fingerprint, matching batch distinct") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // 40 docs over 10 distinct normalized texts (case/punct variants collide)
    val rows = (0 until 40).map { i =>
      val base = s"shared text number ${i % 10}"
      val variant = if (i % 3 == 0) base.toUpperCase else if (i % 3 == 1) base + "!!!" else base
      (i.toLong, new java.sql.Timestamp(t0.getTime + i * 60000L), variant)
    }
    val dir = Files.createTempDirectory("graft_stream_docs").toString
    rows.toDF("doc_id", "ts", "text").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamingOps.streamingDedup(stream)
      .writeStream.outputMode("append").format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.table("dedup_out")
    // exactly one survivor per distinct fingerprint; same count as batch
    val batchDistinct = spark.read.parquet(dir)
      .select(substring(md5(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))), 1, 16))
      .distinct().count()
    assert(out.count() == batchDistinct,
      s"streaming dedup kept ${out.count()} rows, batch distinct is $batchDistinct")
    assert(out.groupBy("fp").count().filter(col("count") > 1).count() == 0)
  }
}
