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
  * of an ingest pipeline) is stitched to the seam state; its labeled cells
  * land in `sinkDir/id_field/batch=<id>` and retroactive merges (a new
  * cell bridging two previously-separate events — history cannot be
  * rewritten at scale) in `sinkDir/remap/batch=<id>`.
  * [[StreamingTracker.resolvedIdField]] applies the remap ledger's
  * transitive closure at read time (the ledger is #merge-events rows —
  * driver-sized — while the id field is archive-sized and never rewritten).
  *
  * Both tracker modes stream: non-merging (space-time CCL) and merging
  * (split/merge genealogy — `merges/batch=<id>` accumulates the genealogy
  * rows, read back via [[StreamingTracker.mergesTable]]; the seam slice with
  * its resolved object gids is persisted per commit under `seam/batch=<id>`
  * because a restart cannot rebuild gids from the event-id sink).
  *
  * Replay safety: foreachBatch re-delivers a batch (same `batchId`) after a
  * failed attempt. Every write targets the batch's OWN partition directory
  * with overwrite semantics, so a replay replaces any partial output
  * instead of appending next to it; `state.json` (tracker counters + the
  * last COMMITTED batch id) is written last as the commit marker, and
  * readers ignore partitions past it. Restart recovery
  * ([[restoreState]]) rebuilds the seam from the committed sink alone. */
final class StreamingTracker(geom: DataFrame, spec: GridSpec, cfg: TrackConfig,
    sinkDir: String) extends Serializable {

  @volatile private var state: Option[IncrementalTracker.IncState] = None
  // the stream's own batch ids guard in-run re-delivery only — a RESTARTED
  // query may renumber from 0 (fresh checkpoint), so they never key storage
  @volatile private var lastBatchId: Long = -1L
  // tracker-owned commit sequence: monotone across restarts (restored from
  // the manifest), so partition directories never collide between runs
  @volatile private var committedSeq: Long = -1L
  // idempotence key: the max raw input slice time (epoch ms) this tracker
  // has COMMITTED. A crash can land between our manifest write and the
  // streaming engine's own commit-log write; the restarted query then
  // re-delivers the same batch under a fresh batchId (lastBatchId is reset
  // to -1, so the in-run guard cannot catch it). Input is append-only and
  // time-ordered, so dropping slices <= this key makes replay a no-op.
  @volatile private var maxCommittedMs: Long = Long.MinValue

  /** The foreachBatch function: track the new slices, commit the batch.
    * With `cfg.tFill > 0` the batch routes through the watermark-holdback
    * wrapper: the last `tFill` slices stay provisional (persisted under
    * `held/`, not in the id field) until later slices finalize them — call
    * [[flush]] when the archive ends to release the tail. */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    if (batchId <= lastBatchId) return // in-run replay of a committed batch
    val fresh =
      if (maxCommittedMs == Long.MinValue) batch
      else batch.filter(col("time") >
        lit(new java.sql.Timestamp(maxCommittedMs)).cast("timestamp"))
    val maxRow = fresh.agg(max("time")).head()
    if (maxRow.isNullAt(0)) { lastBatchId = batchId; return } // cross-restart replay
    val batchMaxMs = maxRow.getTimestamp(0).getTime
    val (st, inc) =
      if (cfg.tFill > 0) IncrementalTracker.extendGapFill(state, fresh, geom, spec, cfg)
      else IncrementalTracker.extend(state, fresh, geom, spec, cfg)
    commit(batch.sparkSession, st, inc, batchMaxMs)
    lastBatchId = batchId
  }

  /** Finalize the slices still held back by the tFill watermark — the end
    * of the archive (no future slices can change their gap-fill status).
    * One more commit carrying the released tail; no-op when `tFill == 0`
    * or nothing is held. */
  def flush(spark: SparkSession): Unit =
    if (cfg.tFill > 0 && state.flatMap(_.held)
        .exists(h => !h.filter(!col("finalized")).isEmpty)) {
      val (st, inc) = IncrementalTracker.flushGapFill(state, geom, spec, cfg)
      commit(spark, st, inc, maxCommittedMs)
    }

  private def commit(spark: SparkSession, st: IncrementalTracker.IncState,
      inc: IncrementalTracker.Increment, batchMaxMs: Long): Unit = {
    val seq = committedSeq + 1 // a crashed attempt's partial dir is re-overwritten
    if (!inc.blockIds.isEmpty)
      inc.blockIds.write.mode("overwrite").parquet(s"$sinkDir/id_field/batch=$seq")
    if (!inc.remap.isEmpty)
      inc.remap.write.mode("overwrite").parquet(s"$sinkDir/remap/batch=$seq")
    if (cfg.allowMerging) {
      // merging mode: the genealogy rows, and the seam itself — its resolved
      // object gids (and per-round trajectory, see IncState.seamTraj) cannot
      // be rebuilt from the event-id sink after a restart
      if (!inc.merges.isEmpty)
        inc.merges.write.mode("overwrite").parquet(s"$sinkDir/merges/batch=$seq")
      st.seam.write.mode("overwrite").parquet(s"$sinkDir/seam/batch=$seq")
      st.seamTraj.foreach(_.write.mode("overwrite")
        .parquet(s"$sinkDir/seam_traj/batch=$seq"))
    }
    // tFill holdback: the provisional tail (and its gap-support context)
    // lives only in state — persist it with the commit or a restart
    // would silently drop the held slices
    st.held.foreach(_.write.mode("overwrite").parquet(s"$sinkDir/held/batch=$seq"))
    StreamingTracker.writeManifest(spark, sinkDir,
      seq, st.gapAfterSeam, st.nextEventId, batchMaxMs, st.nextGid)
    state = Some(st)
    committedSeq = seq
    maxCommittedMs = batchMaxMs
  }

  /** Rebuild driver state from the committed sink after a restart: counters
    * from the manifest, the seam from the last written slice (remap ledger
    * applied). */
  def restoreState(spark: SparkSession): Unit = {
    lastBatchId = -1L // a restarted query may renumber its batches
    StreamingTracker.readManifest(spark, sinkDir) match {
      case None =>
        state = None; committedSeq = -1L; maxCommittedMs = Long.MinValue
      case Some((seq, gap, next, maxMs, nextGid)) =>
        val fs = StreamingTracker.manifestPath(sinkDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        var traj: Option[org.apache.spark.sql.DataFrame] = None
        val seam =
          if (cfg.allowMerging) {
            // merging mode persists the seam (resolved gids + event ids)
            // per commit — the committed partition IS the restart state
            val tp = new org.apache.hadoop.fs.Path(s"$sinkDir/seam_traj/batch=$seq")
            if (fs.exists(tp))
              traj = Some(spark.read.parquet(tp.toString).localCheckpoint())
            spark.read.parquet(s"$sinkDir/seam/batch=$seq").localCheckpoint()
          } else {
            val ids = StreamingTracker.resolvedIdField(spark, sinkDir)
            if (ids.isEmpty) {
              import spark.implicits._
              Seq.empty[(Int, Int, Long)].toDF("y", "x", "event_id")
            } else {
              val tLast = ids.agg(max("time")).head().getTimestamp(0)
              ids.filter(col("time") === lit(tLast))
                .select("y", "x", "event_id").localCheckpoint()
            }
          }
        val hp = new org.apache.hadoop.fs.Path(s"$sinkDir/held/batch=$seq")
        val held =
          if (fs.exists(hp)) Some(spark.read.parquet(hp.toString).localCheckpoint())
          else None
        state = Some(IncrementalTracker.IncState(seam, gap, next, nextGid, traj, held))
        committedSeq = seq
        maxCommittedMs = maxMs
    }
  }
}

object StreamingTracker {

  private def manifestPath(sinkDir: String) =
    new org.apache.hadoop.fs.Path(sinkDir, "state.json")

  /** The manifest is the COMMIT MARKER, so its update must never destroy
    * the previous marker: write the new content to a temp path, then rename
    * over `state.json` (atomic on HDFS and local filesystems via
    * [[org.apache.hadoop.fs.FileContext]] with `Rename.OVERWRITE`;
    * acceptable on object stores). A crash mid-write leaves at worst a
    * stale temp file next to an intact previous manifest. */
  private def writeManifest(spark: SparkSession, sinkDir: String,
      batchId: Long, gap: Long, nextId: Long, maxTimeMs: Long,
      nextGid: Long): Unit = {
    val p = manifestPath(sinkDir)
    val tmp = new org.apache.hadoop.fs.Path(sinkDir, s"state.json.tmp")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    val out = fs.create(tmp, true)
    out.write((s"""{"committedSeq": $batchId, "gapAfterSeam": $gap, """ +
      s""""nextEventId": $nextId, "maxTimeMs": $maxTimeMs, """ +
      s""""nextGid": $nextGid}""").getBytes("UTF-8"))
    out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
      .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def readManifest(spark: SparkSession,
      sinkDir: String): Option[(Long, Long, Long, Long, Long)] = {
    val p = manifestPath(sinkDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val js = new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    in.close()
    def field(k: String): Long =
      s""""$k"\\s*:\\s*(-?\\d+)""".r.findFirstMatchIn(js) match {
        case Some(m) => m.group(1).toLong
        case None => throw new IllegalStateException(
          s"malformed streaming-tracker manifest $p: missing field '$k' in: " +
            js.take(200))
      }
    def optField(k: String, dflt: Long): Long =
      s""""$k"\\s*:\\s*(-?\\d+)""".r.findFirstMatchIn(js)
        .map(_.group(1).toLong).getOrElse(dflt)
    Some((field("committedSeq"), field("gapAfterSeam"), field("nextEventId"),
      optField("maxTimeMs", Long.MinValue), optField("nextGid", 1L)))
  }

  /** The COMMITTED merge-genealogy table (merging mode): one row per merge
    * event in [[graft.marex.Track.splitAndMerge]]'s schema, object gids
    * globally unique across the stream's lifetime. Empty for non-merging
    * streams or before the first merge. */
  def mergesTable(spark: SparkSession, sinkDir: String): DataFrame = {
    import spark.implicits._
    val empty = Seq.empty[(java.sql.Timestamp, Long, Seq[Long], Seq[Long],
        Seq[Double], Long, Long)]
      .toDF("time", "child_id", "parent_ids", "child_ids", "overlap_areas",
        "n_parents", "n_children")
    val fs = manifestPath(sinkDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    readManifest(spark, sinkDir) match {
      case Some((committed, _, _, _, _))
          if fs.exists(new org.apache.hadoop.fs.Path(sinkDir, "merges")) =>
        spark.read.parquet(s"$sinkDir/merges")
          .filter(col("batch") <= committed).drop("batch")
      case _ => empty
    }
  }

  /** The COMMITTED id field with the remap ledger's transitive closure
    * applied — what a consumer reads. Partitions past the manifest's last
    * committed batch (a crashed attempt's partial output) are ignored. The
    * ledger is collected and path-compressed on the driver (it is
    * #retroactive-merges rows), then broadcast-joined: one pass over the
    * archive-sized field, no iteration. */
  def resolvedIdField(spark: SparkSession, sinkDir: String): DataFrame = {
    import spark.implicits._
    val empty = Seq.empty[(java.sql.Timestamp, Int, Int, Long)]
      .toDF("time", "y", "x", "event_id")
    val fs = manifestPath(sinkDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readCommitted(committed: Long, sub: String): Option[DataFrame] =
      if (!fs.exists(new org.apache.hadoop.fs.Path(sinkDir, sub))) None
      else Some(spark.read.parquet(s"$sinkDir/$sub")
        .filter(col("batch") <= committed).drop("batch"))
    readManifest(spark, sinkDir) match {
      case None => empty
      case Some((committed, _, _, _, _)) =>
        readCommitted(committed, "id_field") match {
          case None => empty
          case Some(raw) =>
            val ledger = readCommitted(committed, "remap") match {
              case None => Map.empty[Long, Long]
              case Some(r) => r.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
            }
            if (ledger.isEmpty) raw
            else {
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
    }
  }
}
