package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming extension (SURVEY.md §2.4 last row, §7 step 11).
  *
  * The reference is batch-only (time is an ordinary dimension), but the same
  * event semantics stream naturally: watermarked tumbling-window aggregation
  * and gap-based sessionization (`session_window`) are the streaming duals of
  * the batch climatology and the tracker's temporal gap fill (T7). A custom
  * `flatMapGroupsWithState` tracker demonstrates arbitrary stateful logic —
  * the streaming analogue of cross-time event stitching.
  *
  * At scale these run with `readStream` over the same partitioned storage,
  * checkpointed state stores, and watermark-bounded state: the windowed agg
  * keeps |keys × open windows| rows of state, sessionization keeps one open
  * session per key, both bounded by the watermark delay.
  */
object StreamingOps {

  /** Schema of the events stream (ts already µs-normalized). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Watermarked tumbling-window aggregation per event type. */
  def windowedCounts(events: DataFrame, window: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Gap-based sessionization with `session_window` — the streaming dual of
    * the batch lag/cumsum sessionizer (Q27) and marEx T7. */
  def sessionized(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("session_value"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Streaming exact dedup — the streaming dual of the batch content-hash
    * dedup (q30) and fingerprint grouping (q39), for continuous corpus
    * ingestion. Each arriving document is fingerprinted with the SAME
    * normalization + md5 prefix as `TextAnalysis.fingerprint` (so batch and
    * stream agree on what "duplicate" means), and
    * `dropDuplicatesWithinWatermark` keeps the first arrival per
    * fingerprint. State is bounded: one state-store row per DISTINCT
    * fingerprint inside the watermark horizon — not the corpus — so a
    * 100 TB/day feed holds hours, not history. Exactly-once emission comes
    * from the state store; cross-horizon dups (beyond the watermark) are the
    * batch layer's job, same split as every production lambda dedup.
    *
    * @param docsStream streaming frame with (ts TIMESTAMP, text STRING, ...)
    * @return input rows minus in-horizon duplicates, plus the `fp` column.
    */
  def streamingDedup(docsStream: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val norm = trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))
    docsStream
      .withColumn("fp", substring(md5(norm), 1, 16))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
  }

  // ── Streaming extreme detection (marEx detect, streamed) ────────────────

  /** Stream-static extreme flagging: a live anomaly stream joined against
    * the (batch-computed, slowly-changing) hobday threshold table on
    * (y, x, doy) — the streaming dual of `identify_extremes`
    * (reference detect.py:663). The threshold table is a bounded dimension
    * (|pixels| × 366 rows), so it is broadcast: the stream never shuffles,
    * and each micro-batch is a map-side hash join regardless of cluster
    * size. Pixels with no threshold row flag false (never-extreme), same as
    * the reference's NaN-threshold mask. */
  def extremeFlags(anomStream: DataFrame, thresholds: DataFrame): DataFrame = {
    val thr = broadcast(thresholds.select(
      col("y").cast("long").as("y"), col("x").cast("long").as("x"),
      col("doy").cast("int").as("doy"), col("threshold")))
    anomStream
      .withColumn("doy", dayofyear(col("time")).cast("int"))
      .join(thr, Seq("y", "x", "doy"), "left")
      .withColumn("extreme",
        col("threshold").isNotNull && col("anomaly") >= col("threshold"))
      .drop("doy")
  }

  /** Watermarked per-window global extreme fraction — the live analogue of
    * the batch run-summary coverage statistic (T21). State is one row per
    * open window, bounded by the watermark delay. */
  def extremeFraction(flags: DataFrame, window: String = "1 day",
      watermark: String = "3 days"): DataFrame =
    flags
      .withWatermark("time", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("time"), window))
      .agg(count(lit(1)).as("n_cells"),
        sum(col("extreme").cast("long")).as("n_extreme"))
      .select(col("window.start").as("w_start"), col("n_cells"), col("n_extreme"))

  final case class PixelObs(y: Long, x: Long, time: java.sql.Timestamp,
      anomaly: Double, extreme: Boolean)
  final case class RunState(start: Long, last: Long, n: Long, maxAnom: Double)
  final case class PixelRun(y: Long, x: Long, run_start: java.sql.Timestamp,
      run_end: java.sql.Timestamp, n_days: Long, max_anomaly: Double)

  /** Stateful per-pixel heatwave-run detector: emits an event when a pixel's
    * run of consecutive extreme days (≥ `minDuration`, the Hobday et al.
    * 2016 definition's 5-day rule) is broken by a non-extreme day or a gap
    * larger than one day. The streaming analogue of the tracker's temporal
    * continuity logic (T7/T16): state is ONE open run per pixel —
    * O(|pixels|) state total, independent of stream length — and each
    * micro-batch shuffles only on the pixel key. Rows within a batch are
    * sorted per pixel in memory (bounded by per-pixel batch volume).
    * Runs still open at end-of-stream are deliberately not emitted —
    * they are not yet events (their duration is unknown). */
  def extremeRuns(flags: DataFrame, minDuration: Int = 5): DataFrame = {
    val spark = flags.sparkSession
    import spark.implicits._
    val dayUs = 86400000000L
    flags.select(col("y").cast("long"), col("x").cast("long"), col("time"),
        col("anomaly").cast("double"), col("extreme").cast("boolean"))
      .as[PixelObs]
      .groupByKey(o => (o.y, o.x))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (Long, Long), rows: Iterator[PixelObs], state: GroupState[RunState]) => {
          val out = scala.collection.mutable.ArrayBuffer.empty[PixelRun]
          var cur = state.getOption
          def close(): Unit = cur.foreach { s =>
            if (s.n >= minDuration)
              out += PixelRun(key._1, key._2,
                new java.sql.Timestamp(s.start / 1000L),
                new java.sql.Timestamp(s.last / 1000L), s.n, s.maxAnom)
            cur = None
          }
          rows.toArray.sortBy(_.time.getTime).foreach { o =>
            val tUs = o.time.getTime * 1000L
            cur match {
              case Some(s) if o.extreme && tUs - s.last == dayUs =>
                cur = Some(RunState(s.start, tUs, s.n + 1, math.max(s.maxAnom, o.anomaly)))
              case Some(_) if o.extreme => // gap in the day sequence: new run
                close()
                cur = Some(RunState(tUs, tUs, 1L, o.anomaly))
              case Some(_) => close()
              case None if o.extreme =>
                cur = Some(RunState(tUs, tUs, 1L, o.anomaly))
              case None => ()
            }
          }
          cur match {
            case Some(s) => state.update(s)
            case None => state.remove()
          }
          out.iterator
        })
      .toDF()
  }

  final case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class UserRunState(count: Long, total: Double)
  final case class UserRun(user_id: Long, n_events: Long, total_value: Double)

  /** Arbitrary stateful processing: running per-user totals via
    * `flatMapGroupsWithState` (streaming analogue of the tracker's
    * cross-time state carry). Emits an updated row per user per batch. */
  def statefulUserTotals(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[EventRow], state: GroupState[UserRunState]) => {
          val prev = state.getOption.getOrElse(UserRunState(0L, 0.0))
          var c = prev.count; var t = prev.total
          rows.foreach { r => c += 1; t += r.value }
          state.update(UserRunState(c, t))
          Iterator.single(UserRun(uid, c, t))
        })
      .toDF()
  }
}
