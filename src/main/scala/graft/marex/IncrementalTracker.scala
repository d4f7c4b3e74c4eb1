package graft.marex

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents

/** Incremental (append-only) event tracking — extend a non-merging track
  * with newly-arrived time slices WITHOUT recomputing history.
  *
  * The reference's tracker (and [[Track.track]]) is a batch pass over the
  * full archive; a production archive grows daily, and at the 100 TB design
  * point re-tracking decades to absorb one day is the difference between a
  * minutes-long append job and a full-archive recompute. This module keeps
  * the minimum state that tracking semantics require — the labeled cells of
  * the last SURVIVING slice (the seam), the count of erased raw slices
  * after it, plus an id counter — and stitches
  * each new block to it with the same 26-connectivity (9 spatial offsets
  * incl. diagonals, x-wrap) the batch space-time CCL uses
  * (reference structure: track.py:2009–2016, time connectivity
  * track.py:1388–1395).
  *
  * Appending data can retroactively MERGE previously-separate events (a new
  * cell bridging two old components); each extension therefore returns a
  * `remap` table (`from_event_id` → `to_event_id`) the caller applies to
  * any historical tables it keeps. Event ids are stable and unique but NOT
  * dense: equivalence with the batch tracker is up to a bijection of ids,
  * which is what [[IncrementalTrackerSpec]] asserts.
  *
  * Scope (all checked eagerly): non-merging semantics (the reference's
  * "Scannell" mode — splits/merges need the full genealogy pass), no
  * temporal gap fill (`tFill == 0`: closing along time reads future slices),
  * absolute area filtering (a quartile threshold is a statistic of the
  * WHOLE run — inherently non-incremental; production append pipelines use
  * absolute thresholds, e.g. run_track.py:27–36's 600 km²), and
  * `dropSmallestObject == false` (the reference's drop-first-label quirk is
  * per-batch-run, meaningless under appends).
  *
  * Scale shape per block: morphology + per-slice CCL are one task per
  * slice; the block-local space-time CCL sees only the block; the seam join
  * touches ONE slice of cells; the seam component solve is driver
  * union-find over seam-sized edges. Nothing reads history except the seam.
  */
object IncrementalTracker {

  /** Tracker state between extensions. `seam` holds (y, x, event_id) of the
    * last slice that SURVIVED preprocessing; `gapAfterSeam` counts the raw
    * input slices processed after it (slices whose objects were all erased
    * by morphology or the area filter still occupy the time axis, exactly
    * as in the batch tracker, so anything following them must NOT stitch);
    * `nextEventId` is 1 + the highest id ever issued (provisional block ids
    * start here, keeping old and new id spaces disjoint). */
  final case class IncState(seam: DataFrame, gapAfterSeam: Long, nextEventId: Long)

  /** One extension's output: the new slices' labeled cells, and the
    * retroactive merges among PREVIOUSLY issued event ids (empty when no
    * new cell bridges two old events). */
  final case class Increment(blockIds: DataFrame, remap: DataFrame)

  private def requireIncremental(cfg: TrackConfig): Unit = {
    require(!cfg.allowMerging,
      "incremental tracking supports the non-merging (space-time CCL) mode")
    require(cfg.tFill == 0,
      "incremental tracking requires tFill=0 (temporal closing reads future slices)")
    require(cfg.resolvedQuartile == 0.0,
      "incremental tracking requires an absolute area filter (or quartile 0): " +
        "a quartile threshold is a whole-run statistic (track.py:1838) and " +
        "cannot be computed on an append")
    require(!cfg.dropSmallestObject,
      "dropSmallestObject is a per-batch-run quirk; disable it for appends")
  }

  /** Slice-local preprocessing: morphology, per-slice CCL, absolute area
    * filter — every step reads one slice, so it is append-safe. Returns the
    * surviving flagged cells (time, y, x). */
  private def preprocessBlock(flags: DataFrame, geom: DataFrame, spec: GridSpec,
      cfg: TrackConfig): DataFrame = {
    val land = geom.filter(!col("valid")).select("y", "x")
    val landOpt = if (land.isEmpty) None else Some(land)
    val filled = Raster.fillHoles(flags, cfg.rFill, spec, landOpt)
    val gids = Track.globalIds(Raster.labelPerSlice(filled.localCheckpoint(), spec))
    Track.filterSmallObjects(gids, geom, cfg).select("time", "y", "x")
  }

  /** Extend the track with a block of new slices (all strictly later than
    * anything processed before; empty blocks are fine). The time axis is
    * the batch tracker's: raw slices present in the INPUT are consecutive —
    * including slices whose objects preprocessing then erases, which stay
    * on the axis and separate what surrounds them. */
  def extend(state: Option[IncState], newFlags: DataFrame, geom: DataFrame,
      spec: GridSpec, cfg: TrackConfig): (IncState, Increment) = {
    requireIncremental(cfg)
    val spark = newFlags.sparkSession
    import spark.implicits._
    val emptyRemap = Seq.empty[(Long, Long)].toDF("from_event_id", "to_event_id")
    val emptyIds = Seq.empty[(java.sql.Timestamp, Int, Int, Long)]
      .toDF("time", "y", "x", "event_id")
    def emptySeam = Seq.empty[(Int, Int, Long)].toDF("y", "x", "event_id")

    // the raw axis: every input slice occupies a timestep, processed or not
    val rawTimes = newFlags.select("time").distinct()
      .orderBy("time").collect().map(_.getTimestamp(0))
    if (rawTimes.isEmpty)
      return (state.getOrElse(IncState(emptySeam, 0L, 1L)),
        Increment(emptyIds, emptyRemap))
    val axis = Some(rawTimes.toSeq.toDF("time"))

    val cells = preprocessBlock(newFlags, geom, spec, cfg)
    if (cells.isEmpty) {
      // every slice erased: the block still advances the axis past the seam
      val st = state.getOrElse(IncState(emptySeam, 0L, 1L))
      return (st.copy(gapAfterSeam = st.gapAfterSeam + rawTimes.length),
        Increment(emptyIds, emptyRemap))
    }

    // block-local space-time CCL over the RAW axis (erased interior slices
    // keep separating their neighbors), ids offset into the fresh id range
    val offset = state.map(_.nextEventId - 1).getOrElse(0L)
    val local = Track.labelSpaceTime(cells, spec, timeAxis = axis)
      .withColumn("event_id", col("event_id") + offset)
      .localCheckpoint()
    val nIssued = local.agg(max("event_id")).head().getLong(0) - offset
    val tFirst = local.agg(min("time")).head().getTimestamp(0)
    val tLast = local.agg(max("time")).head().getTimestamp(0)
    // raw slices erased at the block edges — they count toward seam gaps
    val gapBefore = rawTimes.indexWhere(_.equals(tFirst))
    val trailing = rawTimes.length - 1 - rawTimes.indexWhere(_.equals(tLast))

    val (blockIds, remap) = state match {
      case None => (local, emptyRemap)
      // stitch only when the seam slice and the first surviving new slice
      // are ADJACENT on the combined raw axis (no erased slice between)
      case Some(st) if st.gapAfterSeam + gapBefore > 0 => (local, emptyRemap)
      case Some(st) =>
        // seam edges: old last-slice cells vs the first new slice, fanned
        // with the shared 26-connectivity time face (diagonals, x-wrap)
        val firstNew = local.filter(col("time") === lit(tFirst))
        val fanned = Track.fanNeighborhood(
          st.seam.withColumnRenamed("event_id", "old_id"), spec, keep = Seq("old_id"))
        val edges = firstNew.select(col("y"), col("x"), col("event_id"))
          .join(fanned, Seq("y", "x"))
          .select(col("old_id").as("src"), col("event_id").as("dst"))
          .distinct()
        if (edges.isEmpty) (local, emptyRemap)
        else {
          // components over the bipartite seam graph (old ∪ provisional ids
          // are disjoint ranges); canonical = the smallest OLD id present —
          // every component has one, edges always touch the seam
          val comp = ConnectedComponents.auto(edges)
          val canon = comp.filter(col("node") <= offset)
            .groupBy("component").agg(min("node").as("canon_id"))
          val full = comp.join(canon, "component")
            .select(col("node"), col("canon_id"))
            .filter(col("node") =!= col("canon_id"))
            .localCheckpoint()
          val blockMap = full.filter(col("node") > offset)
            .withColumnRenamed("node", "event_id")
          val relabeled = local.join(broadcast(blockMap), Seq("event_id"), "left")
            .select(col("time"), col("y"), col("x"),
              coalesce(col("canon_id"), col("event_id")).as("event_id"))
            .localCheckpoint()
          (relabeled,
            full.filter(col("node") <= offset)
              .select(col("node").as("from_event_id"), col("canon_id").as("to_event_id")))
        }
    }

    val seam = blockIds.filter(col("time") === lit(tLast))
      .select("y", "x", "event_id").localCheckpoint()
    val next = state.map(_.nextEventId).getOrElse(1L) + nIssued
    (IncState(seam, trailing.toLong, next), Increment(blockIds, remap))
  }
}
