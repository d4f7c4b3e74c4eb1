package graft.marex

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequential-in-time split/merge (strict T15/T17) — a faithful re-expression
  * of the reference's gridded consolidation algorithm
  * (track.py:3337–3802 `split_and_merge_objects`, :2554–2656
  * `consolidate_object_ids`, :4973–5115 `partition_nn_grid`,
  * :4827–4885 centroid partitioning):
  *
  *  - timesteps are processed in order; resolving timestep t reads the
  *    ALREADY-UPDATED t−1 and t−2 slices (decisions propagate forward);
  *  - at each t, object ids at t−1 are first consolidated: a t−2 parent
  *    overlapping ≥2 t−1 children (above threshold) re-merges those
  *    children into the first child id — a pure split therefore keeps ONE
  *    id, it does not mint new events;
  *  - children at t claimed by ≥2 parents are recorded ONCE in the merge
  *    ledger and partitioned cell-by-cell to the nearest parent (nearest
  *    parent CELL via the reference's grid-block search, or nearest parent
  *    centroid), each partition taking a fresh id (fragment 0 keeps the
  *    child id) — iterated within the timestep until no multi-parent child
  *    remains (≤10 rounds);
  *  - all geometry is in pixel-index space with wrapped x (the reference's
  *    structured-grid branch ignores cell areas: areas are pixel counts,
  *    centroids are regionprops index centroids with the wrap fix).
  *
  * This is inherently order-dependent and therefore driver-orchestrated over
  * per-timestep slices — exactly the reference's own execution shape (numpy
  * slices in a sequential chunk loop). It exists for merge-ledger parity
  * with the reference fixtures; [[Track.splitAndMerge]] (batch-parallel, one
  * Spark job per round over all timesteps) remains the default scale path.
  * A 0.25° global slice is ~4 MB as int32: 100-timestep windows fit easily
  * on the driver; multi-decade runs should use the batch path.
  */
private[marex] object SequentialSplitMerge {

  private final class Prop(var area: Long, var cy: Double, var cx: Double)

  private final case class MergeEvent(
      t: Int, childIds: Array[Int], parentIds: Array[Int], areas: Array[Long])

  /** @return (updated id field (time,y,x,gid), merges (time, child_id,
    *         parent_ids, child_ids, overlap_areas, n_parents, n_children) —
    *         the reference's full merge-events genealogy, track.py:3776–3793:
    *         `child_ids` are the fragment ids the partitioning minted
    *         (fragment 0 keeps the child id), `overlap_areas` is
    *         parent-aligned (pixel counts in the structured branch), `time`
    *         is the reference's `merge_time`) */
  def run(ids: DataFrame, spec: GridSpec, cfg: TrackConfig,
      timeAxis: Option[DataFrame]): (DataFrame, DataFrame) = {
    val spark = ids.sparkSession
    import spark.implicits._
    spec.requireRaster()
    val ny = spec.ny; val nx = spec.nx
    val wrap = spec.periodicX

    val idx = Track.timeIndex(ids, timeAxis)
    val times: Array[Timestamp] = idx.orderBy("t_idx").select("time")
      .collect().map(_.getTimestamp(0))
    val nT = times.length
    val slices = Array.fill(nT)(new Array[Int](ny * nx))
    ids.join(idx, "time")
      .select(col("t_idx").cast("int"), col("y").cast("int"),
        col("x").cast("int"), col("gid").cast("long"))
      .collect()
      .foreach { r =>
        val g = r.getLong(3)
        require(g <= Int.MaxValue, s"gid $g exceeds Int range")
        slices(r.getInt(0) - 1)(r.getInt(1) * nx + r.getInt(2)) = g.toInt
      }

    // ── regionprops-equivalent properties (pixel count + index centroid
    //    with the reference's wrap fix, track.py:2050–2107) ────────────────
    def computeProps(slice: Array[Int], only: Set[Int] = null): Map[Int, Prop] = {
      val cells = scala.collection.mutable.Map[Int, scala.collection.mutable.ArrayBuffer[Int]]()
      var i = 0
      while (i < slice.length) {
        val id = slice(i)
        if (id > 0 && (only == null || only(id)))
          cells.getOrElseUpdate(id, scala.collection.mutable.ArrayBuffer[Int]()) += i
        i += 1
      }
      cells.map { case (id, cs) =>
        val ysum = cs.iterator.map(_ / nx).sum.toDouble
        val cy = ysum / cs.length
        val xs = cs.iterator.map(_ % nx).toArray
        // wrap fix: a CONNECTED object crosses the periodic seam iff it
        // holds cells at BOTH x=0 and x=nx−1 (the wrap adjacency) — the
        // exact test at any nx; its right-side x indices shift by −nx
        // before averaging. (A fixed edge band misfires on every object
        // once nx ≤ 2×band.)
        val cx =
          if (wrap && xs.contains(0) && xs.contains(nx - 1)) {
            val adj = xs.map(x => if (x > nx / 2) (x - nx).toDouble else x.toDouble)
            val m = adj.sum / adj.length
            if (m < 0) m + nx else m
          } else xs.map(_.toDouble).sum / xs.length
        id -> new Prop(cs.length.toLong, cy, cx)
      }.toMap
    }

    val props = scala.collection.mutable.Map[Int, Prop]()
    slices.foreach(s => props ++= computeProps(s))
    var nextNewId = (if (props.isEmpty) 0 else props.keys.max) + 1

    // ── overlap pairs between two slices, (parent, child, pixel count),
    //    sorted ascending — check_overlap_slice (track.py:2396) ────────────
    def overlapSlice(a: Array[Int], b: Array[Int]): Array[(Int, Int, Long)] = {
      val counts = scala.collection.mutable.Map[(Int, Int), Long]()
      var i = 0
      while (i < a.length) {
        if (a(i) > 0 && b(i) > 0) {
          val k = (a(i), b(i))
          counts(k) = counts.getOrElse(k, 0L) + 1L
        }
        i += 1
      }
      counts.iterator.map { case ((p, c), n) => (p, c, n) }.toArray
        .sortBy(r => (r._1, r._2))
    }

    def enforceThreshold(list: Array[(Int, Int, Long)]): Array[(Int, Int, Long)] =
      list.filter { case (p, c, n) =>
        props.contains(p) && props.contains(c) &&
          n.toDouble / math.min(props(p).area, props(c).area) >= cfg.overlapThreshold
      }

    // ── consolidate ids at slice `cur` against its predecessor `prev`
    //    (track.py:2554–2656) ──────────────────────────────────────────────
    def consolidate(prev: Array[Int], cur: Array[Int]): Unit = {
      val backward = enforceThreshold(overlapSlice(prev, cur))
      if (backward.isEmpty) return
      val parentCounts = backward.groupBy(_._1)
      val splitting = parentCounts.filter(_._2.length > 1).keys.toArray.sorted
      splitting.foreach { parent =>
        if (props.contains(parent)) {
          val children = parentCounts(parent).map(_._2) // ascending (sorted rows)
          if (children.length > 1 && props.contains(children(0))) {
            val first = children(0)
            var renamed = false
            children.drop(1).foreach { child =>
              if (props.contains(child)) {
                var i = 0
                while (i < cur.length) { if (cur(i) == child) cur(i) = first; i += 1 }
                props.remove(child)
                renamed = true
              }
            }
            if (renamed) computeProps(cur, Set(first)).get(first)
              .foreach(p => props(first) = p)
          }
        }
      }
    }

    @inline def wrappedDist(y1: Double, x1: Double, y2: Double, x2: Double): Double = {
      val dy = y1 - y2
      var dx = x1 - x2
      if (wrap) {
        if (dx > nx / 2.0) dx -= nx else if (dx < -nx / 2.0) dx += nx
      }
      math.sqrt(dy * dy + dx * dx)
    }

    // ── partition_nn_grid (track.py:4973): nearest parent CELL via the
    //    reference's 3×3 grid-block search; centroid fallback ──────────────
    def partitionNN(childCells: Array[Int], prev: Array[Int],
        parentIds: Array[Int], centroids: Array[(Double, Double)]): Array[Int] = {
      val maxArea = parentIds.map(p => props(p).area).max
      val maxDistance = math.max((math.sqrt(maxArea.toDouble) * 3.0).toInt, 40)
      val gridSize = math.max(2, maxDistance / 4)
      val nGy = (ny + gridSize - 1) / gridSize
      val nGx = (nx + gridSize - 1) / gridSize
      val n = childCells.length
      val minDist = Array.fill(n)(Double.PositiveInfinity)
      val assign = new Array[Int](n)
      val foundClose = new Array[Boolean](n)
      for (pIdx <- parentIds.indices) {
        val pid = parentIds(pIdx)
        // bucket this parent's cells into grid blocks
        val blocks = Array.fill(nGy * nGx)(scala.collection.mutable.ArrayBuffer[Int]())
        var i = 0
        while (i < prev.length) {
          if (prev(i) == pid) {
            val gy = math.min((i / nx) / gridSize, nGy - 1)
            val gx = math.min((i % nx) / gridSize, nGx - 1)
            blocks(gy * nGx + gx) += i
          }
          i += 1
        }
        if (blocks.exists(_.nonEmpty)) {
          var c = 0
          while (c < n) {
            if (!foundClose(c)) {
              val cy = childCells(c) / nx; val cx = childCells(c) % nx
              val gy = math.min(cy / gridSize, nGy - 1)
              val gx = math.min(cx / gridSize, nGx - 1)
              var best = Double.PositiveInfinity
              var dy = -1
              while (dy <= 1 && !foundClose(c)) {
                val by = (((gy + dy) % nGy) + nGy) % nGy
                var dx = -1
                while (dx <= 1 && !foundClose(c)) {
                  val bx = (((gx + dx) % nGx) + nGx) % nGx
                  val pts = blocks(by * nGx + bx)
                  var k = 0
                  while (k < pts.length && !foundClose(c)) {
                    val pi = pts(k)
                    val d = wrappedDist(cy, cx, pi / nx, pi % nx)
                    if (d <= maxDistance) {
                      if (d < best) best = d
                      if (d < 1e-6) { best = d; foundClose(c) = true }
                    }
                    k += 1
                  }
                  dx += 1
                }
                dy += 1
              }
              if (best < minDist(c)) { minDist(c) = best; assign(c) = pIdx }
            }
            c += 1
          }
        }
      }
      // centroid fallback for cells no parent cell reached
      var c = 0
      while (c < n) {
        if (minDist(c).isInfinity) {
          val cy = childCells(c) / nx; val cx = childCells(c) % nx
          var best = Double.PositiveInfinity; var bp = 0
          for (pIdx <- parentIds.indices) {
            val d = wrappedDist(cy, cx, centroids(pIdx)._1, centroids(pIdx)._2)
            if (d < best) { best = d; bp = pIdx }
          }
          assign(c) = bp
        }
        c += 1
      }
      assign
    }

    // centroid partitioning (track.py:4827, wrapped planar index distances)
    def partitionCentroid(childCells: Array[Int],
        centroids: Array[(Double, Double)]): Array[Int] =
      childCells.map { cell =>
        val cy = cell / nx; val cx = cell % nx
        var best = Double.PositiveInfinity; var bp = 0
        for (pIdx <- centroids.indices) {
          val d = wrappedDist(cy, cx, centroids(pIdx)._1, centroids(pIdx)._2)
          if (d < best) { best = d; bp = pIdx }
        }
        bp
      }

    // ── main sequential loop ──────────────────────────────────────────────
    val ledger = scala.collection.mutable.ArrayBuffer[MergeEvent]()
    val zeros = new Array[Int](ny * nx)
    for (t <- 0 until nT) {
      val cur = slices(t)
      if (t >= 1) consolidate(if (t >= 2) slices(t - 2) else zeros, slices(t - 1))
      val prev = if (t >= 1) slices(t - 1) else zeros

      var overlaps = enforceThreshold(overlapSlice(prev, cur))
        .map(r => Array[Long](r._1, r._2, r._3)) // mutable rows
      var converged = false
      var iter = 0
      while (!converged && iter < cfg.maxInnerIter) {
        val merging = overlaps.groupBy(_(1)).filter(_._2.length > 1)
          .keys.toArray.sorted
        if (merging.isEmpty) converged = true
        else {
          merging.foreach { childL =>
            val childId = childL.toInt
            val rows = overlaps.filter(_(1) == childL) // positional order
            val parentIds = rows.map(_(0).toInt)
            val nP = parentIds.length
            val newIds = Array.tabulate(nP - 1)(k => nextNewId + k)
            nextNewId += nP - 1
            // rewrite 2nd+ rows of the overlap list to the fresh child ids
            var seen = 0
            overlaps.foreach { r =>
              if (r(1) == childL) {
                if (seen > 0) r(1) = newIds(seen - 1)
                seen += 1
              }
            }
            val childIds = childId +: newIds
            ledger += MergeEvent(t, childIds, parentIds, rows.map(_(2)))
            // partition the child's cells among the parents
            val childCells = (0 until ny * nx).filter(cur(_) == childId).toArray
            val centroids = parentIds.map(p => (props(p).cy, props(p).cx))
            val assign =
              if (cfg.nnPartitioning) partitionNN(childCells, prev, parentIds, centroids)
              else partitionCentroid(childCells, centroids)
            var k = 0
            while (k < childCells.length) {
              cur(childCells(k)) = childIds(assign(k))
              k += 1
            }
            // refresh properties of the surviving fragments
            val fragProps = computeProps(cur, childIds.toSet)
            childIds.foreach { cid =>
              fragProps.get(cid) match {
                case Some(p) => props(cid) = p
                case None => props.remove(cid) // fragment got no cells
              }
            }
          }
          overlaps = enforceThreshold(overlapSlice(prev, cur))
            .map(r => Array[Long](r._1, r._2, r._3))
          iter += 1
        }
      }
    }
    // end-of-sequence consolidation of the final timestep (track.py:3603)
    if (nT >= 2) consolidate(slices(nT - 2), slices(nT - 1))

    // ── rebuild DataFrames ────────────────────────────────────────────────
    val outRows = for {
      t <- (0 until nT).iterator
      i <- (0 until ny * nx).iterator
      if slices(t)(i) > 0
    } yield (times(t), i / nx, i % nx, slices(t)(i).toLong)
    val outDf = spark.createDataset(outRows.toSeq).toDF("time", "y", "x", "gid")

    val mergeRows = ledger.map(m =>
      (times(m.t), m.childIds(0).toLong, m.parentIds.map(_.toLong).toSeq,
        m.childIds.map(_.toLong).toSeq, m.areas.map(_.toDouble).toSeq,
        m.parentIds.length.toLong, m.childIds.length.toLong)).toSeq
    val mergesDf = spark.createDataset(mergeRows)
      .toDF("time", "child_id", "parent_ids", "child_ids", "overlap_areas",
        "n_parents", "n_children")
    (outDf, mergesDf)
  }
}
