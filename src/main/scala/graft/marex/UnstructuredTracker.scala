package graft.marex

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents

/** Full unstructured-mesh tracker with the reference's batch-parallel
  * split/merge semantics (track.py:3804–4814 `split_and_merge_objects_
  * parallel`, the path every unstructured run takes via run_tracking):
  *
  *  - morphology / gap fill / labeling / filtering run as the distributed
  *    mesh operators ([[Unstructured]], [[Track]]);
  *  - split/merge semantics (shared by both execution paths below): the
  *    initial multi-parent children seed the work list; processing a child
  *    records ONE ledger entry, partitions its cells by frontier-BFS to the
  *    nearest parent CELL through the mesh (track.py:5246–5357,
  *    parent-order rounds, nv-row cascade, great-circle centroid fallback)
  *    or to the nearest parent centroid, and forward-checks the fragments
  *    against t+1 (STRICT > threshold, track.py:4115) to find newly-created
  *    multi-parent candidates — no backward consolidation (that is the
  *    gridded sequential algorithm's trick, not this one's);
  *  - overlap fractions use CELL-AREA sums (not pixel counts) throughout —
  *    the unstructured branch is area-weighted end-to-end;
  *  - filtering is the unstructured branch's: object CELL COUNTS with a
  *    mode-dependent prefilter (>5 cells absolute / >50 cells quartile) and
  *    a STRICT > threshold (track.py:1812–1906), quantile guarded through
  *    [[Track.exactQuantile]] (driver collect only below the 4 M bound).
  *
  * Two execution paths, selected by `scalePath`:
  *  - DEFAULT (scalePath = true): the distributed round-based iteration in
  *    [[UnstructuredBatch]] — overlap pairs by cell equi-join, the exact
  *    partitioning kernels running one-task-per-merge-event over the
  *    broadcast mesh, stitch via [[Track.eventMappingFromPairs]]. Nothing
  *    field-sized touches the driver; this is the 100 TB shape.
  *  - PARITY (scalePath = false): the order-exact QUEUE form, driver-
  *    orchestrated over per-timestep slices (the reference's own execution:
  *    numba kernels over one chunk's numpy slices). Fixture-scale only.
  * GoldenTrackingSpec asserts the two paths produce an identical id field
  * and genealogy on the reference's golden fixture.
  */
object UnstructuredTracker {

  /** Static mesh: 0-based triangular connectivity (−1 = no neighbor),
    * coordinates in degrees, physical cell areas, validity mask. */
  final case class Mesh(nbr: Array[Array[Int]], lat: Array[Double],
      lon: Array[Double], area: Array[Double], valid: Array[Boolean]) {
    val nCells: Int = lat.length
    require(nbr.length == 3, s"triangular mesh expects nv=3, got ${nbr.length}")
    /** Pull-oriented edge list (src feeds dst), matching the reference's
      * dilation matrix M[i, neighbours[:, i]] = 1. */
    def edgesDf(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      // parallelize, don't toDF: a LocalRelation would embed ~3·nCells rows
      // in every task's serialized plan (an R2B8 mesh is millions of cells)
      spark.sparkContext.parallelize(
        for (i <- 0 until nCells; k <- 0 until 3; j = nbr(k)(i) if j >= 0)
          yield (j, i), math.max(1, nCells / 500000))
        .toDF("cell", "nbr")
    }
    /** Static per-cell geometry as a DataFrame (cell, lat, lon, area). */
    def geomDf(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      spark.sparkContext.parallelize(
        (0 until nCells).map(i => (i, lat(i), lon(i), area(i))),
        math.max(1, nCells / 500000))
        .toDF("cell", "lat", "lon", "area")
    }
  }

  final case class Result(idField: DataFrame,
      // (time, child_id, parent_ids, child_ids, overlap_areas, n_parents,
      // n_children) — full genealogy (track.py:3776–3793); overlap_areas are
      // CELL-AREA sums (the unstructured branch is area-weighted throughout)
      merges: DataFrame,
      // (time, event_id, sibling_event_ids) — the per-(time, ID, sibling_ID)
      // merge_ledger (track.py:3026–3106) with parents mapped to FINAL ids
      mergeLedger: DataFrame,
      stats: Map[String, Long])

  /** Run the full pipeline. `flags`: (time, cell) rows of raw extremes.
    * @param scalePath true (default) routes split/merge + stitching through
    *   the DISTRIBUTED iteration ([[UnstructuredBatch]], the reference's
    *   `split_and_merge_objects_parallel`) — nothing field-sized touches the
    *   driver; false runs the order-exact queue kernel (the parity tool —
    *   collects per-timestep slices, fixture-scale only). */
  def track(flags: DataFrame, mesh: Mesh, cfg: TrackConfig,
      scalePath: Boolean = true): Result = {
    val spark = flags.sparkSession
    import spark.implicits._
    val edges = mesh.edgesDf(spark).localCheckpoint()
    val land = Some((0 until mesh.nCells).filter(!mesh.valid(_)).toDF("cell"))
      .filter(_ => mesh.valid.exists(!_))

    val axis = Some(flags.select("time").distinct().localCheckpoint())

    // morphology (land-True trick) → temporal closing (+ fill_holes(R/2))
    val f1 = Unstructured.fillHoles(flags, edges, cfg.rFill, land)
    val f3 =
      if (cfg.tFill > 0) {
        val gapped = Track.fillTimeGaps(
          f1.select(col("time"), col("cell").as("y"), lit(0).as("x")),
          cfg.tFill, axis)
          .select(col("time"), col("y").as("cell"))
        Unstructured.fillHoles(gapped, edges, cfg.rFill / 2, land)
      } else f1

    // label per slice on MASKED cells (identify_objects applies the mask,
    // track.py:1986), then unique ids via cumulative per-slice offsets
    val masked = land match {
      case Some(l) => f3.join(l, Seq("cell"), "left_anti")
      case None => f3
    }
    val labeled = Unstructured.labelPerSlice(masked.localCheckpoint(), edges)
    val gids = Track.globalIds(
      labeled.select(col("time"), col("cell").as("y"), lit(0).as("x"), col("label")))
      .select(col("time"), col("y").as("cell"), col("gid"))
      .localCheckpoint()

    // unstructured filter: CELL COUNTS, strict > threshold; the prefilter
    // cut depends on the filter mode (track.py:1812–1815): >5 cells under
    // absolute filtering, >50 cells under quartile filtering (the reference
    // prunes harder before its percentile computation). The quantile goes
    // through [[Track.exactQuantile]] — driver collect only below the 4 M
    // bound, the same distributed two-rank fetch above it.
    val counts = gids.groupBy("gid").agg(count(lit(1)).as("n")).localCheckpoint()
    val preCut = if (cfg.areaFilterAbsolute.isDefined) 5 else 50
    val preList = counts.filter(col("n") > preCut)
    val nPre = preList.count()
    val threshold: Double = cfg.areaFilterAbsolute.getOrElse(
      Track.exactQuantile(preList.select(col("n").cast("double")), cfg.resolvedQuartile))
    val keep = counts.filter(col("n") > threshold).select("gid")
    val nPost = keep.count()
    val filtered = gids.join(keep, Seq("gid"), "left_semi")
      .select("time", "cell", "gid").localCheckpoint()

    if (scalePath)
      return trackDistributed(filtered, mesh, cfg, axis, nPre, nPost)

    // queue-driven split/merge on the driver (single logical time chunk)
    val (slices, times, ledger) =
      if (cfg.allowMerging) splitMergeQueue(filtered, mesh, cfg)
      else collectSlices(filtered)

    // stitch: thresholded area-weighted overlap graph → union-find → dense
    // event ids; every object becomes an event (singletons included)
    val finalPairs = overlapPairsLocal(slices, mesh, cfg.overlapThreshold)
    val comp = ConnectedComponents.unionFindLocal(
      finalPairs.iterator.map(p => (p._1.toLong, p._2.toLong)))
    val allIds = slices.iterator.flatMap(_.iterator).filter(_ > 0).toArray.distinct.sorted
    // dense event numbering by (first timestep, min id)
    val firstT = scala.collection.mutable.Map[Long, Int]()
    for (t <- slices.indices; id <- slices(t).iterator if id > 0) {
      val root = comp.getOrElse(id.toLong, id.toLong)
      if (!firstT.contains(root) || firstT(root) > t) firstT(root) = t
    }
    val roots = allIds.map(id => comp.getOrElse(id.toLong, id.toLong)).distinct
    val eventOf = roots.sortBy(r => (firstT(r), r)).zipWithIndex
      .map { case (r, i) => r -> (i + 1).toLong }.toMap

    val idRows = for {
      t <- (0 until slices.length).iterator
      c <- (0 until mesh.nCells).iterator if slices(t)(c) > 0
    } yield (times(t), c, eventOf(comp.getOrElse(slices(t)(c).toLong, slices(t)(c).toLong)))
    val idField = spark.createDataset(idRows.toSeq).toDF("time", "cell", "event_id")

    val mergeRows = ledger.map(m =>
      (times(m.t), m.childIds(0).toLong, m.parentIds.map(_.toLong).toSeq,
        m.childIds.map(_.toLong).toSeq, m.areas.toSeq,
        m.parentIds.length.toLong, m.childIds.length.toLong))
    val merges = spark.createDataset(mergeRows)
      .toDF("time", "child_id", "parent_ids", "child_ids", "overlap_areas",
        "n_parents", "n_children")

    // sibling ledger: each parent's FINAL event id with all co-parents'
    // final ids (self included) — built driver-side from the same event map
    val ledgerRows = ledger.flatMap { m =>
      val sibs = m.parentIds
        .map(p => eventOf(comp.getOrElse(p.toLong, p.toLong)))
        .distinct.sorted.toSeq
      sibs.map(e => (times(m.t), e, sibs))
    }.distinct
    val ledgerDf = spark.createDataset(ledgerRows)
      .toDF("time", "event_id", "sibling_event_ids")

    Result(idField, merges, ledgerDf, Map(
      "n_objects_prefiltered" -> nPre,
      "n_objects_filtered" -> nPost,
      "n_events_final" -> eventOf.size.toLong,
      "total_merges" -> ledger.length.toLong))
  }

  /** The scale path: distributed split/merge ([[UnstructuredBatch]]) →
    * area-weighted overlap stitching via [[Track.eventMappingFromPairs]] →
    * genealogy + sibling ledger. No per-timestep slice ever reaches the
    * driver; stats are one-row aggregations. */
  private def trackDistributed(filtered: DataFrame, mesh: Mesh,
      cfg: TrackConfig, timeAxis: Option[DataFrame],
      nPre: Long, nPost: Long): Result = {
    val spark = filtered.sparkSession
    import spark.implicits._
    val geom = mesh.geomDf(spark).localCheckpoint()

    val (resolved, merges) =
      if (cfg.allowMerging)
        UnstructuredBatch.splitAndMerge(filtered, mesh, cfg, timeAxis)
      else
        (filtered,
          Seq.empty[(java.sql.Timestamp, Long, Seq[Long], Seq[Long], Seq[Double], Long, Long)]
            .toDF("time", "child_id", "parent_ids", "child_ids", "overlap_areas",
              "n_parents", "n_children"))

    val finalPairs = UnstructuredBatch
      .overlapPairs(resolved, geom, cfg.overlapThreshold, timeAxis)
      .select(col("id_p").as("src"), col("id_c").as("dst"))
    val gidMap = Track.eventMappingFromPairs(resolved, finalPairs).localCheckpoint()
    val idField = resolved.join(gidMap, "gid")
      .select("time", "cell", "event_id").localCheckpoint()
    val ledger = Track.mergeLedger(merges, gidMap)

    Result(idField, merges, ledger, Map(
      "n_objects_prefiltered" -> nPre,
      "n_objects_filtered" -> nPost,
      "n_events_final" -> idField.select("event_id").distinct().count(),
      "total_merges" -> merges.count()))
  }

  // ───────────────────────── driver-side pieces ──────────────────────────

  private final case class MergeEvent(t: Int, childIds: Array[Int],
      parentIds: Array[Int], areas: Array[Double])

  private def collectSlices(ids: DataFrame):
      (Array[Array[Int]], Array[Timestamp], Seq[MergeEvent]) = {
    val times = ids.select("time").distinct().orderBy("time")
      .collect().map(_.getTimestamp(0))
    val tIdx = times.zipWithIndex.toMap
    val nCells = 1 + ids.agg(max("cell")).head().getInt(0)
    val slices = Array.fill(times.length)(new Array[Int](nCells))
    ids.select(col("time"), col("cell").cast("int"), col("gid").cast("long"))
      .collect().foreach { r =>
        slices(tIdx(r.getTimestamp(0)))(r.getInt(1)) = r.getLong(2).toInt
      }
    (slices, times, Seq.empty)
  }

  private def areaOf(slice: Array[Int], id: Int, mesh: Mesh): Double = {
    var s = 0.0; var i = 0
    while (i < slice.length) { if (slice(i) == id) s += mesh.area(i); i += 1 }
    s
  }

  private def overlapPairsLocal(slices: Array[Array[Int]], mesh: Mesh,
      thr: Double): Seq[(Int, Int, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer[(Int, Int, Double)]()
    for (t <- 0 until slices.length - 1) {
      val a = slices(t); val b = slices(t + 1)
      val ov = scala.collection.mutable.Map[(Int, Int), Double]()
      var i = 0
      while (i < a.length) {
        if (a(i) > 0 && b(i) > 0) {
          val k = (a(i), b(i))
          ov(k) = ov.getOrElse(k, 0.0) + mesh.area(i)
        }
        i += 1
      }
      ov.toSeq.sortBy(_._1).foreach { case ((p, c), area) =>
        val frac = area / math.min(areaOf(a, p, mesh), areaOf(b, c, mesh))
        if (frac >= thr) out += ((p, c, area))
      }
    }
    out.toSeq
  }

  /** The queue algorithm (process_chunk, one chunk spanning all timesteps —
    * the reference's chunk boundaries only affect temporary-id VALUES,
    * which are remapped to contiguous ids anyway). */
  private def splitMergeQueue(ids: DataFrame, mesh: Mesh, cfg: TrackConfig):
      (Array[Array[Int]], Array[Timestamp], Seq[MergeEvent]) = {
    val (slices, times, _) = collectSlices(ids)
    val nT = slices.length
    val thr = cfg.overlapThreshold
    val meanCellArea = mesh.area.sum / mesh.nCells
    var counter = slices.iterator.flatMap(_.iterator).foldLeft(0)(math.max) + 1
    val ledger = scala.collection.mutable.ArrayBuffer[MergeEvent]()

    // initial queues: children with ≥2 above-threshold parents
    val initial = overlapPairsLocal(slices, mesh, thr)
      .groupBy(_._2).filter(_._2.length > 1).keys.toArray.sorted
    val timeOf = scala.collection.mutable.Map[Int, Int]()
    for (t <- 0 until nT; id <- slices(t).iterator if id > 0)
      if (!timeOf.contains(id)) timeOf(id) = t
    val queues = Array.fill(nT)(scala.collection.mutable.Queue[Int]())
    initial.foreach(c => queues(timeOf(c)).enqueue(c))

    for (t <- 0 until nT) {
      val cur = slices(t)
      val prev = if (t > 0) slices(t - 1) else new Array[Int](mesh.nCells)
      while (queues(t).nonEmpty) {
        val childId = queues(t).dequeue()
        val childCells = (0 until mesh.nCells).filter(cur(_) == childId).toArray
        if (childCells.nonEmpty) {
          val childArea = childCells.map(mesh.area).sum
          // parents at t−1 with overlap/min ≥ threshold, ascending id order
          val potential = childCells.map(prev).filter(_ > 0).distinct.sorted
          val kept = potential.flatMap { pid =>
            val pArea = areaOf(prev, pid, mesh)
            val ovArea = childCells.filter(prev(_) == pid).map(mesh.area).sum
            if (ovArea / math.min(pArea, childArea) >= thr)
              Some((pid, pArea, ovArea))
            else None
          }
          if (kept.length >= 2) {
            val parentIds = kept.map(_._1)
            val newIds = Array.tabulate(parentIds.length - 1)(k => counter + k)
            counter += parentIds.length - 1
            val childIds = childId +: newIds
            ledger += MergeEvent(t, childIds, parentIds, kept.map(_._3))
            // area-weighted spherical parent centroids (track.py:4006–4026)
            val centroids = parentIds.map { pid =>
              var cx = 0.0; var cy = 0.0; var cz = 0.0
              var i = 0
              while (i < mesh.nCells) {
                if (prev(i) == pid) {
                  val a = mesh.area(i)
                  val la = math.toRadians(mesh.lat(i)); val lo = math.toRadians(mesh.lon(i))
                  cx += a * math.cos(la) * math.cos(lo)
                  cy += a * math.cos(la) * math.sin(lo)
                  cz += a * math.sin(la)
                }
                i += 1
              }
              val norm = math.sqrt(cx * cx + cy * cy + cz * cz)
              var lonD = math.toDegrees(math.atan2(cy, cx))
              if (lonD > 180) lonD -= 360 else if (lonD < -180) lonD += 360
              (math.toDegrees(math.asin(cz / norm)), lonD)
            }
            val maxDistance = math.max(
              (math.sqrt(kept.map(_._2).max / meanCellArea) * 2.0).toInt, 20) * 2
            val assign =
              if (cfg.nnPartitioning)
                partitionNN(childCells, prev, parentIds, centroids, mesh, maxDistance)
              else
                childCells.map { c =>
                  var best = Double.PositiveInfinity; var bp = 0
                  for (k <- centroids.indices) {
                    val d = greatCircle(mesh.lat(c), mesh.lon(c),
                      centroids(k)._1, centroids(k)._2)
                    if (d < best) { best = d; bp = k }
                  }
                  bp
                }
            var k = 0
            while (k < childCells.length) {
              cur(childCells(k)) = childIds(assign(k))
              k += 1
            }
            // forward check: fragments vs t+1 children, STRICT > threshold
            if (t < nT - 1) {
              val next = slices(t + 1)
              childIds.foreach { cid =>
                val fragCells = (0 until mesh.nCells).filter(cur(_) == cid)
                if (fragCells.nonEmpty) {
                  val a0 = fragCells.map(mesh.area).sum
                  fragCells.map(next).filter(_ > 0).distinct.sorted.foreach { pc =>
                    val a1 = areaOf(next, pc, mesh)
                    val ov = fragCells.filter(next(_) == pc).map(mesh.area).sum
                    if (ov / math.min(a0, a1) > thr && !queues(t + 1).contains(pc))
                      queues(t + 1).enqueue(pc)
                  }
                }
              }
            }
          }
        }
      }
    }
    (slices, times, ledger.toSeq)
  }

  private[marex] def greatCircle(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    2 * math.atan2(math.sqrt(a), math.sqrt(1 - a))
  }

  /** Frontier-BFS nearest-parent-cell partitioning
    * (partition_nn_unstructured_optimised, track.py:5246–5357): rounds of
    * parent-ordered expansion along the mesh's listed-neighbor direction,
    * with the nv-row cascade (cells claimed via row i expand via row i+1 in
    * the same round), stopping when no CHILD cell was claimed in a round;
    * stragglers fall back to the great-circle-nearest parent centroid. */
  private[marex] def partitionNN(childCells: Array[Int], prev: Array[Int],
      parentIds: Array[Int], centroids: Array[(Double, Double)], mesh: Mesh,
      maxDistance: Int): Array[Int] = {
    val np = parentIds.length
    val kOf = new java.util.HashMap[Int, Int]()
    parentIds.zipWithIndex.foreach { case (p, k) => kOf.put(p, k) }
    val frontier = Array.fill(mesh.nCells)(255)
    // Work-list BFS with the SAME claim schedule as a full-mesh rescan: a
    // cell claimed via nv row i expands via rows i+1..2 in the same round
    // (the cascade) and rows 0..i the next round; any later re-expansion is
    // a no-op (its neighbors are already claimed), so each claim is
    // expanded exactly once per row — O(claimed cells), not
    // O(parents × rounds × nCells). Entries encode (cell << 2 | claimRow);
    // seeds carry claimRow 2 so round 1 expands them through every row.
    var prevClaims = Array.fill(np)(new scala.collection.mutable.ArrayBuffer[Long])
    var i0 = 0
    while (i0 < mesh.nCells) {
      if (prev(i0) != 0) {
        val k = kOf.getOrDefault(prev(i0), -1)
        if (k >= 0) { frontier(i0) = k; prevClaims(k) += ((i0.toLong << 2) | 2L) }
      }
      i0 += 1
    }
    val isChild = new Array[Boolean](mesh.nCells)
    childCells.foreach(isChild(_) = true)

    var dist = 0
    var anyUnassigned = childCells.exists(frontier(_) == 255)
    var break = false
    while (dist < maxDistance && anyUnassigned && !break) {
      dist += 1
      var updates = false
      val cur = Array.fill(np)(new scala.collection.mutable.ArrayBuffer[Long])
      var k = 0
      while (k < np) {
        var row = 0
        while (row < 3) {
          def expand(c: Int): Unit = {
            val n = mesh.nbr(row)(c)
            if (n >= 0 && frontier(n) == 255) {
              frontier(n) = k
              cur(k) += ((n.toLong << 2) | row.toLong)
              if (isChild(n)) updates = true
            }
          }
          // due now: last round's claims still owing this row…
          prevClaims(k).foreach { e => if ((e & 3L) >= row) expand((e >> 2).toInt) }
          // …plus this round's earlier-row claims (snapshot length: entries
          // appended during this row carry claimRow == row and wait)
          val curK = cur(k)
          val snapLen = curK.length
          var j = 0
          while (j < snapLen) {
            val e = curK(j)
            if ((e & 3L) < row) expand((e >> 2).toInt)
            j += 1
          }
          row += 1
        }
        k += 1
      }
      prevClaims = cur
      if (!updates) break = true
      else anyUnassigned = childCells.exists(frontier(_) == 255)
    }
    childCells.map { c =>
      if (frontier(c) != 255) frontier(c)
      else {
        var best = Double.PositiveInfinity; var bp = 0
        for (k <- centroids.indices) {
          val d = greatCircle(mesh.lat(c), mesh.lon(c), centroids(k)._1, centroids(k)._2)
          if (d < best) { best = d; bp = k }
        }
        bp
      }
    }
  }
}
