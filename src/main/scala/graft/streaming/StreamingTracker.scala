package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.marex.{GridSpec, IncrementalTracker, TrackConfig}

/** Streaming event tracking: drive [[graft.marex.IncrementalTracker]] from
  * Structured Streaming micro-batches — marine-heatwave tracking over an
  * archive that GROWS, without ever re-tracking history.
  *
  * Shape: a `foreachBatch` sink. Each micro-batch (new time slices of the
  * boolean extreme field, append-only and time-ordered — the natural order
  * of an ingest pipeline) is stitched to the seam state and its labeled
  * cells APPENDED to `sinkDir/id_field`. Retroactive merges (a new cell
  * bridging two previously-separate events) cannot rewrite already-written
  * output at scale, so they append to a tiny `sinkDir/remap` ledger
  * instead; [[resolvedIdField]] applies the ledger's transitive closure at
  * read time (the ledger is #merge-events rows — driver-sized — while the
  * id field is archive-sized and never rewritten).
  *
  * The tracker state itself (one slice of labeled cells + a counter) lives
  * in the driver across batches; restart recovery = re-`extend` from the
  * last written slice (read `id_field` at its max time), which
  * [[restoreState]] does.
  */
final class StreamingTracker(geom: DataFrame, spec: GridSpec, cfg: TrackConfig,
    sinkDir: String) extends Serializable {

  @volatile private var state: Option[IncrementalTracker.IncState] = None
  @volatile private var lastBatchId: Long = -1L

  /** The foreachBatch function: track the new slices, append output.
    * foreachBatch re-delivers a batch (same `batchId`) after a failed
    * attempt; re-appending it would duplicate cells, so replays of an
    * already-committed batch are skipped. */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    if (batchId <= lastBatchId) return
    val (st, inc) = IncrementalTracker.extend(state, batch, geom, spec, cfg)
    inc.blockIds.write.mode("append").parquet(s"$sinkDir/id_field")
    if (!inc.remap.isEmpty)
      inc.remap.write.mode("append").parquet(s"$sinkDir/remap")
    // commit the in-memory state only after the sink writes succeeded
    state = Some(st)
    lastBatchId = batchId
  }

  /** Rebuild driver state from the sink after a restart: the seam is the
    * last written slice (with the remap ledger applied) and the counter
    * resumes past the highest id ever issued. */
  def restoreState(spark: SparkSession): Unit = {
    val ids = StreamingTracker.resolvedIdField(spark, sinkDir)
    if (ids.isEmpty) { state = None; return }
    val tLast = ids.agg(max("time")).head().getTimestamp(0)
    val seam = ids.filter(col("time") === lit(tLast))
      .select("y", "x", "event_id").localCheckpoint()
    // resume AFTER the raw (pre-remap) id space: read the unresolved field
    val rawMax = ids.sparkSession.read.parquet(s"$sinkDir/id_field")
      .agg(max("event_id")).head().getLong(0)
    state = Some(IncrementalTracker.IncState(seam, rawMax + 1))
  }
}

object StreamingTracker {

  /** The id field with the remap ledger's TRANSITIVE closure applied —
    * what a consumer reads. The ledger is collected and path-compressed on
    * the driver (it is #retroactive-merges rows), then broadcast-joined:
    * one pass over the archive-sized field, no iteration. */
  def resolvedIdField(spark: SparkSession, sinkDir: String): DataFrame = {
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path(sinkDir, "id_field")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(sinkDir, "id_field")))
      return Seq.empty[(java.sql.Timestamp, Long, Long, Long)]
        .toDF("time", "y", "x", "event_id")
    val raw = spark.read.parquet(s"$sinkDir/id_field")
    if (!fs.exists(new org.apache.hadoop.fs.Path(sinkDir, "remap"))) return raw
    val ledger = spark.read.parquet(s"$sinkDir/remap")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def root(id: Long): Long = {
      var v = id
      while (ledger.contains(v)) v = ledger(v)
      v
    }
    val closed = ledger.keys.map(k => k -> root(k)).toSeq.toDF("from_id", "to_id")
    raw.join(broadcast(closed), raw("event_id") === col("from_id"), "left")
      .select(raw("time"), raw("y"), raw("x"),
        coalesce(col("to_id"), raw("event_id")).as("event_id"))
  }
}
