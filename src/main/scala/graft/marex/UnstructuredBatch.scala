package graft.marex

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed batch-parallel split/merge for unstructured meshes — the
  * SCALE path for T18 on meshes, mirroring the reference's
  * `split_and_merge_objects_parallel` (track.py:3804–4814) the way
  * [[Track.splitAndMerge]] mirrors the gridded batch variant:
  *
  *  - each round is one Spark job pipeline over ALL timesteps: area-weighted
  *    overlap pairs (cell equi-join) → multi-parent children → child-cell
  *    partitioning → id reassignment, `localCheckpoint` truncating lineage
  *    per round. Round 1 seeds from every initially multi-parent child (the
  *    reference's initial queue fill); round N+1 considers only children
  *    forward-reached by round N's fragments with STRICT > threshold
  *    (track.py:4115) — the queue's forward check, batched;
  *  - fragments mint NEW ids from collision-free per-merge slots (the
  *    reference's `next_id_offsets` scheme, track.py:4441–4449): fragment 0
  *    keeps the child id, fragment k gets
  *    `maxGid + (merge_idx−1)·(maxNp−1) + k` — deterministic, no driver
  *    coordination;
  *  - overlap fractions are CELL-AREA weighted throughout (the unstructured
  *    branch's semantics);
  *  - partitioning runs the EXACT queue kernels
  *    ([[UnstructuredTracker.partitionNN]] frontier BFS with the reference's
  *    nv-row cascade, or great-circle centroid argmin) INSIDE
  *    `flatMapGroups` — one executor task per merge event, the static mesh
  *    broadcast once (the reference's own shape: a numba kernel over one
  *    chunk's arrays). Per-task memory is O(nCells) for the frontier array
  *    (4 MB per 10⁶-cell mesh), NOT O(field).
  *
  * The driver sees only per-round one-row aggregates (max gid, max np,
  * emptiness) — never a slice, never the field. The order-exact queue
  * variant in [[UnstructuredTracker]] remains the parity tool;
  * GoldenTrackingSpec asserts both paths agree on the reference fixture.
  */
/** Per-merge payload row for [[UnstructuredBatch]]'s kernel stage: kind 0 =
  * contested child cell, kind 1 = parent cell (ordinal k), kind 2 = parent
  * centroid/area (ordinal k, v1 = lat, v2 = lon, v3 = area). Top-level so
  * the Dataset encoder's generated code can reach it. */
final case class KernelRow(m: Long, kind: Int, cell: Int, k: Int,
    v1: Double, v2: Double, v3: Double)

private[marex] object UnstructuredBatch {

  /** Area-weighted overlap pairs between consecutive timesteps (dense-index
    * paired like [[Track.overlapPairs]]; fraction = overlap_area /
    * min(parent_area, child_area) ≥ threshold).
    * @param ids (time, cell, gid); @param geom (cell, …, area)
    * @return (time = parent ts, ctime = child ts, id_p, id_c, ov_area, frac) */
  def overlapPairs(ids: DataFrame, geom: DataFrame, thr: Double,
      timeAxis: Option[DataFrame]): DataFrame = {
    val idx = Track.timeIndex(ids, timeAxis)
    val withIdx = ids.join(idx, "time")
    val withArea = withIdx.join(geom.select("cell", "area"), "cell")
    val objArea = withArea.groupBy("t_idx", "gid").agg(sum("area").as("obj_area"))
    val a = withArea.select(col("t_idx"), col("time"), col("cell"),
      col("gid").as("id_p"), col("area"))
    val b = withIdx.select((col("t_idx") - 1).as("t_idx"),
      col("time").as("ctime"), col("cell"), col("gid").as("id_c"))
    val ov = a.join(b, Seq("t_idx", "cell"))
      .groupBy("t_idx", "time", "ctime", "id_p", "id_c")
      .agg(sum("area").as("ov_area"))
    ov
      .join(objArea.select(col("t_idx"), col("gid").as("id_p"),
        col("obj_area").as("a_p")), Seq("t_idx", "id_p"))
      .join(objArea.select((col("t_idx") - 1).as("t_idx"), col("gid").as("id_c"),
        col("obj_area").as("a_c")), Seq("t_idx", "id_c"))
      .withColumn("frac", col("ov_area") / least(col("a_p"), col("a_c")))
      .filter(col("frac") >= thr)
      .select("time", "ctime", "id_p", "id_c", "ov_area", "frac")
  }

  /** The round-based split/merge iteration.
    * @return (resolved id field (time, cell, gid), merges genealogy — same
    *         schema as [[Track.splitAndMerge]] plus minted fragment ids) */
  def splitAndMerge(ids0: DataFrame, mesh: UnstructuredTracker.Mesh,
      cfg: TrackConfig, timeAxis: Option[DataFrame]): (DataFrame, DataFrame) = {
    val spark = ids0.sparkSession
    import spark.implicits._
    val geom = mesh.geomDf(spark).localCheckpoint()
    val meshB = spark.sparkContext.broadcast(mesh)
    val meanCellArea = mesh.area.sum / mesh.nCells
    val thr = cfg.overlapThreshold
    val nnMode = cfg.nnPartitioning

    var ids = graft.core.Plans.iterCheckpoint(ids0)
    var mergesAcc: DataFrame =
      Seq.empty[(java.sql.Timestamp, Long, Seq[Long], Seq[Long], Seq[Double])]
        .toDF("time", "child_id", "parent_ids", "child_ids", "overlap_areas")
    // fragments minted last round — None on round 1 (= consider every child)
    var minted: Option[DataFrame] = None
    var iter = 0
    var done = false
    while (!done && iter < cfg.maxOuterIter) {
      // iterCheckpoint everywhere in this loop — inherited stats
      // estimates compound exponentially across rounds otherwise
      // (see Plans.iterCheckpoint)
      val pairs = graft.core.Plans.iterCheckpoint(overlapPairs(ids, geom, thr, timeAxis))
      // round scope: round 1 takes all children; later rounds only children
      // reached FORWARD from a fresh fragment with STRICT > threshold — the
      // queue's forward-check enqueue (track.py:4115), batched per round
      val scoped = minted match {
        case None => pairs
        case Some(m) =>
          val cand = pairs.join(m, pairs("id_p") === m("gid"), "left_semi")
            .filter(col("frac") > thr)
            .select("ctime", "id_c").distinct()
          pairs.join(cand, Seq("ctime", "id_c"), "left_semi")
      }
      // children claimed by ≥2 parents, parents + overlap areas kept
      // index-aligned via ONE sorted struct list (ascending parent id — the
      // queue kernel's processing order)
      val multi0 = scoped.groupBy("ctime", "id_c")
        .agg(sort_array(collect_list(struct(col("id_p"), col("ov_area")))).as("po"),
          first(col("time")).as("ptime"), count(lit(1)).as("np"))
        .filter(col("np") > 1)
      val multi = graft.core.Plans.iterCheckpoint(
        Track.denseNumber(multi0, Seq("ctime", "id_c"), "m_idx")
          .withColumn("parents", expr("transform(po, p -> p.id_p)"))
          .withColumn("areas", expr("transform(po, p -> p.ov_area)")))
      if (multi.isEmpty) done = true
      else {
        val maxGid = ids.agg(max("gid")).head().getLong(0)
        val maxNp = multi.agg(max("np")).head().getLong(0)

        // fragment id minting: k = parent ordinal (0-based, ascending id);
        // fragment 0 keeps the child id, k ≥ 1 gets a collision-free slot
        // derived from the checkpointed `multi` by a projection — cheap to
        // recompute per consumer, so no checkpoint of its own
        val frag = multi.select(col("ctime"), col("id_c"), col("ptime"),
            col("m_idx"), posexplode(col("parents")).as(Seq("k", "id_p")))
          .withColumn("frag_gid", when(col("k") === 0, col("id_c"))
            .otherwise(lit(maxGid) + (col("m_idx") - 1) * lit(maxNp - 1) + col("k")))

        // ── kernel payload ──────────────────────────────────────────────
        val childRows = ids
          .join(multi.select(col("ctime").as("time"), col("id_c").as("gid"),
            col("m_idx")), Seq("time", "gid"))
          .select(col("m_idx").as("m"), lit(0).as("kind"),
            col("cell").cast("int").as("cell"), lit(0).as("k"),
            lit(0.0).as("v1"), lit(0.0).as("v2"), lit(0.0).as("v3"))
        val parentKeys = frag.select(col("m_idx"), col("k"),
          col("ptime").as("time"), col("id_p").as("gid"))
        val parentCells = graft.core.Plans.iterCheckpoint(
          ids.join(parentKeys, Seq("time", "gid"))
            .select(col("m_idx"), col("k"), col("cell")))
        val parentRows = parentCells
          .select(col("m_idx").as("m"), lit(1).as("kind"),
            col("cell").cast("int").as("cell"), col("k").cast("int").as("k"),
            lit(0.0).as("v1"), lit(0.0).as("v2"), lit(0.0).as("v3"))
        // area-weighted spherical parent centroids (track.py:4006–4026)
        val centroidRows = parentCells
          .join(geom, "cell")
          .withColumn("phi", radians(col("lat")))
          .withColumn("lam", radians(col("lon")))
          .groupBy("m_idx", "k")
          .agg(sum("area").as("p_area"),
            sum(col("area") * cos(col("phi")) * cos(col("lam"))).as("cx"),
            sum(col("area") * cos(col("phi")) * sin(col("lam"))).as("cy"),
            sum(col("area") * sin(col("phi"))).as("cz"))
          .withColumn("norm", sqrt(col("cx") * col("cx") + col("cy") * col("cy")
            + col("cz") * col("cz")))
          .withColumn("p_lat", degrees(asin(col("cz") / col("norm"))))
          .withColumn("p_lon_raw", degrees(atan2(col("cy"), col("cx"))))
          .withColumn("p_lon",
            when(col("p_lon_raw") > 180, col("p_lon_raw") - 360)
              .when(col("p_lon_raw") < -180, col("p_lon_raw") + 360)
              .otherwise(col("p_lon_raw")))
          .select(col("m_idx").as("m"), lit(2).as("kind"),
            lit(0).as("cell"), col("k").cast("int").as("k"),
            col("p_lat").as("v1"), col("p_lon").as("v2"), col("p_area").as("v3"))

        // ── one kernel task per merge event — the queue's exact
        //    partitioning code on the executor (mesh broadcast) ───────────
        val assigned = childRows.unionByName(parentRows).unionByName(centroidRows)
          .as[KernelRow]
          .groupByKey(_.m)
          .flatMapGroups { (m, it) =>
            val rows = it.toArray
            val children = rows.filter(_.kind == 0).map(_.cell).sorted
            val np = rows.iterator.filter(_.kind == 2).map(_.k).max + 1
            val cen = new Array[(Double, Double)](np)
            var maxArea = 0.0
            rows.iterator.filter(_.kind == 2).foreach { r =>
              cen(r.k) = (r.v1, r.v2); maxArea = math.max(maxArea, r.v3)
            }
            val mm = meshB.value
            val assign =
              if (nnMode) {
                val prev = new Array[Int](mm.nCells)
                rows.iterator.filter(_.kind == 1).foreach(r => prev(r.cell) = r.k + 1)
                val parentIds = Array.tabulate(np)(_ + 1)
                val maxDistance = math.max(
                  (math.sqrt(maxArea / meanCellArea) * 2.0).toInt, 20) * 2
                UnstructuredTracker.partitionNN(children, prev, parentIds, cen, mm, maxDistance)
              } else
                children.map { c =>
                  var best = Double.PositiveInfinity; var bp = 0
                  for (k <- cen.indices) {
                    val d = UnstructuredTracker.greatCircle(
                      mm.lat(c), mm.lon(c), cen(k)._1, cen(k)._2)
                    if (d < best) { best = d; bp = k }
                  }
                  bp
                }
            children.indices.iterator.map(i => (m, children(i), assign(i)))
          }
          .toDF("m_idx", "cell", "k")

        val newCells = assigned
          .join(multi.select("m_idx", "ctime", "id_c"), "m_idx")
          .join(frag.select(col("ctime"), col("id_c"), col("k"), col("frag_gid")),
            Seq("ctime", "id_c", "k"))
          .select(col("ctime").as("time"), col("cell"), col("frag_gid").as("gid"))
        val untouched = ids.join(
          multi.select(col("ctime").as("time"), col("id_c").as("gid")),
          Seq("time", "gid"), "left_anti")
        ids = graft.core.Plans.iterCheckpoint(
          untouched.select("time", "cell", "gid")
            .union(newCells.select("time", "cell", "gid")))

        val newMerges = multi.select(
          col("ctime").as("time"), col("id_c").cast("long").as("child_id"),
          col("parents").cast("array<long>").as("parent_ids"),
          expr(s"transform(sequence(0, cast(np as int) - 1), " +
            s"k -> if(k = 0, id_c, ${maxGid}L + (m_idx - 1) * ${maxNp - 1}L + k))")
            .cast("array<long>").as("child_ids"),
          col("areas").cast("array<double>").as("overlap_areas"))
        // a child re-examined in a later round (forward-reached by a fresh
        // fragment) gets a NEW record with post-split parents — keep only
        // the newest per (time, child), like the queue's sequential rename
        mergesAcc = graft.core.Plans.iterCheckpoint(
          mergesAcc.join(newMerges.select("time", "child_id"),
              Seq("time", "child_id"), "left_anti")
            .unionByName(newMerges))
        minted = Some(graft.core.Plans.iterCheckpoint(frag.select(col("frag_gid").as("gid"))))
      }
      iter += 1
    }
    (ids, Track.repairGenealogy(mergesAcc, ids)
      .withColumn("n_parents", size(col("parent_ids")).cast("long"))
      .withColumn("n_children", size(col("child_ids")).cast("long")))
  }

}
