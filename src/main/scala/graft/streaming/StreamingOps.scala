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
