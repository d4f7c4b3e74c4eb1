package graft.marex

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TrackSpec extends SparkSpec {
  import spark.implicits._

  private val ny = 16
  private val nx = 32
  private lazy val spec = GridSpec(ny = ny, nx = nx, periodicX = true)
  private lazy val geom = SyntheticData.geometry(spark, ny, nx).cache()

  private lazy val blobs = SyntheticData.movingBlobs(spark, nDays = 12, ny = ny, nx = nx)
    .filter(col("flag")).select("time", "y", "x").cache()

  test("area-filter parameters resolve and validate like the reference (track.py:712–749)") {
    assert(TrackConfig().resolvedQuartile == 0.5) // neither given → default quartile
    assert(TrackConfig(areaFilterQuartile = 0.25).resolvedQuartile == 0.25)
    assert(TrackConfig(areaFilterAbsolute = Some(10.0)).resolvedQuartile == 0.0)
    val neg = intercept[ConfigurationError](
      TrackConfig(areaFilterAbsolute = Some(-100.0)))
    assert(neg.getMessage.contains("must be positive"))
    val both = intercept[ConfigurationError](
      TrackConfig(areaFilterQuartile = 0.5, areaFilterAbsolute = Some(1000.0)))
    assert(both.getMessage.contains("Cannot specify both area filtering parameters"))
  }

  test("single-timestep tracking works end-to-end (test_track_edge_cases.py:748)") {
    val oneDay = (Seq.tabulate(9)(i => (ts(0), 3 + i / 3, 3 + i % 3)) ++
      Seq.tabulate(9)(i => (ts(0), 10 + i / 3, 20 + i % 3))).toDF("time", "y", "x")
    val res = Track.track(oneDay, geom, spec,
      TrackConfig(rFill = 0, tFill = 0, areaFilterQuartile = 0.0,
        dropSmallestObject = false, allowMerging = false))
    assert(res.stats("n_events_final") == 2, s"stats: ${res.stats}")
    assert(res.idField.count() == 18)
    res.events.collect().foreach { r =>
      assert(r.getTimestamp(r.fieldIndex("time_start")) == ts(0))
      assert(r.getTimestamp(r.fieldIndex("time_end")) == ts(0))
      assert(r.getLong(r.fieldIndex("n_timesteps")) == 1L)
    }
  }

  test("per-slice labeling finds the two blobs each day") {
    val labeled = Raster.labelPerSlice(blobs, spec)
    val perT = labeled.groupBy("time").agg(countDistinct("label").as("n"))
      .select("n").collect().map(_.getLong(0))
    // blobs may overlap occasionally when the moving one passes the static one
    assert(perT.forall(n => n == 1 || n == 2), s"labels per slice: ${perT.toSeq}")
    assert(perT.count(_ == 2) >= 8)
  }

  test("periodic-x labeling joins objects across the seam") {
    val wrapped = Seq((ts(0), 5, 0), (ts(0), 5, nx - 1), (ts(0), 5, 1), (ts(0), 5, nx - 2))
      .toDF("time", "y", "x")
    val labeled = Raster.labelPerSlice(wrapped, spec)
    assert(labeled.select("label").distinct().count() == 1)
    val nonPeriodic = Raster.labelPerSlice(wrapped, spec.copy(periodicX = false))
    assert(nonPeriodic.select("label").distinct().count() == 2)
  }

  test("fillHoles closes a 1-cell hole and removes a 1-cell speck") {
    // 5x5 solid square with center hole + isolated speck far away
    val square = for (y <- 4 to 8; x <- 4 to 8; if !(y == 6 && x == 6)) yield (ts(0), y, x)
    val speck = Seq((ts(0), 12, 20))
    val in = (square ++ speck).toDF("time", "y", "x")
    val out = Raster.fillHoles(in, 1, spec).collect().map(r => (r.getInt(1), r.getInt(2))).toSet
    assert(out.contains((6, 6)), "closing must fill the interior hole")
    assert(!out.contains((12, 20)), "opening must remove the isolated speck")
    // mid-edges survive opening; corners are eroded by a disk SE — standard
    // opening behavior, same as the reference's dask_image pipeline
    assert(out.contains((4, 6)) && out.contains((6, 4)) && out.contains((6, 8)))
    assert(!out.contains((4, 4)))
  }

  test("fillTimeGaps fills gaps within tFill only") {
    val in = Seq((ts(0), 3, 3), (ts(3), 3, 3), (ts(10), 3, 3)).toDF("time", "y", "x")
    // gaps are measured in timesteps of the axis — pass the full daily axis
    // (only 3 of the 11 timesteps have any flagged cell here)
    val axis = Some((0 to 10).map(ts).toDF("time"))
    val out = Track.fillTimeGaps(in, tFill = 2, axis)
      .select("time").collect().map(_.getTimestamp(0)).toSet
    assert(out == Set(ts(0), ts(1), ts(2), ts(3), ts(10)),
      s"got ${out.toSeq.sortBy(_.getTime).mkString(",")}")
  }

  test("fillTimeGaps works identically on a sub-daily (6-hourly) axis") {
    val in = Seq((ts6(0), 3, 3), (ts6(3), 3, 3), (ts6(10), 3, 3)).toDF("time", "y", "x")
    val axis = Some((0 to 10).map(ts6).toDF("time"))
    val out = Track.fillTimeGaps(in, tFill = 2, axis)
      .select("time").collect().map(_.getTimestamp(0)).toSet
    assert(out == Set(ts6(0), ts6(1), ts6(2), ts6(3), ts6(10)),
      s"got ${out.toSeq.sortBy(_.getTime).mkString(",")}")
  }

  test("sub-daily axis: overlap pairing is index-based, one drifting event") {
    // 6-hourly steps; a 3×3 blob drifting 1 cell/step overlaps itself heavily
    // step-over-step. Calendar-day pairing would find ZERO overlaps here and
    // shatter this into 8 events.
    val cells = for (t <- 0 until 8; y <- 5 to 7; x <- (5 + t) to (7 + t))
      yield (ts6(t), y, x)
    val in = cells.toDF("time", "y", "x")
    val res = Track.track(in, geom, spec,
      TrackConfig(rFill = 0, tFill = 0, areaFilterQuartile = 0.0, dropSmallestObject = false,
        overlapThreshold = 0.3, allowMerging = false))
    assert(res.stats("n_events_final") == 1,
      s"6-hourly axis must stitch into one event, got ${res.stats("n_events_final")}")
  }

  test("global ids are unique across slices") {
    val labeled = Raster.labelPerSlice(blobs, spec)
    val gids = Track.globalIds(labeled)
    val n = gids.select("gid", "time").distinct()
      .groupBy("gid").agg(countDistinct("time").as("nt"))
      .agg(max("nt")).head().getLong(0)
    assert(n == 1, "a gid must belong to exactly one timestep")
  }

  test("non-merging tracker stitches the moving blob into one event") {
    val res = Track.track(blobs, geom, spec,
      TrackConfig(rFill = 0, tFill = 0, areaFilterQuartile = 0.0, dropSmallestObject = false,
        overlapThreshold = 0.3, allowMerging = false))
    // moving blob overlaps itself day-over-day; static blob likewise; when the
    // mover passes through the static one they may fuse into one event.
    val nEvents = res.stats("n_events_final")
    assert(nEvents >= 1 && nEvents <= 3, s"expected 1–3 events, got $nEvents")
    // every timestep must be covered by the stitched field
    assert(res.idField.select("time").distinct().count() == 12)
    // event props exist for every (time, event)
    assert(res.eventProps.filter(col("area").isNull).count() == 0)
  }

  test("track(coords=...) remaps centroid outputs to the input's units (T21)") {
    val cfg = TrackConfig(rFill = 0, tFill = 0, areaFilterQuartile = 0.0,
      dropSmallestObject = false, overlapThreshold = 0.3, allowMerging = false)
    val plain = Track.track(blobs, geom, spec, cfg)
    val remapped = Track.track(blobs, geom, spec, cfg,
      coords = Some(Unstructured.CoordSystem("radians", 0.0, 2 * math.Pi)))
    val a = plain.eventProps.orderBy("time", "event_id")
      .select("cen_lat", "cen_lon").collect()
    val b = remapped.eventProps.orderBy("time", "event_id")
      .select("cen_lat", "cen_lon").collect()
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (p, r) =>
      assert(math.abs(math.toRadians(p.getDouble(0)) - r.getDouble(0)) < 1e-12)
      val expLon = {
        val v = math.toRadians(p.getDouble(1))
        if (v < 0) v + 2 * math.Pi else v
      }
      assert(math.abs(expLon - r.getDouble(1)) < 1e-12)
    }
    // id field and non-centroid columns are untouched by the remap
    assert(remapped.idField.count() == plain.idField.count())
  }

  test("area filter drops the smaller object at high quartile") {
    val labeled = Track.globalIds(Raster.labelPerSlice(blobs, spec))
    val kept = Track.filterSmallObjects(labeled, geom,
      TrackConfig(areaFilterQuartile = 0.9, tFill = 0, dropSmallestObject = false))
    val nAll = labeled.select("gid").distinct().count()
    val nKept = kept.select("gid").distinct().count()
    assert(nKept < nAll, s"filter kept all $nAll objects")
    assert(nKept > 0)
  }

  test("centroid of a wrapped blob sits on the seam, not at lon 0") {
    val cells = Seq((ts(0), 8, 0), (ts(0), 8, nx - 1)).toDF("time", "y", "x")
      .withColumn("gid", lit(1L))
    val props = Track.objectProps(cells, geom)
    val lon = props.head().getAs[Double]("cen_lon")
    // cells at lon ±(180−δ): spherical mean must land near ±180, not near 0
    assert(math.abs(lon) > 170, s"wrapped centroid lon $lon should be near ±180")
  }

  // blobs start SEPARATED and the mover collides with the static one around
  // day 5 — the default fixture starts fused and only ever splits, which
  // never exercises the multi-parent path
  private lazy val collideLate = SyntheticData.movingBlobs(spark, nDays = 12,
    ny = ny, nx = nx, r0 = 3, speed = 2, staticCx = 20, staticCy = 4)
    .filter(col("flag")).select("time", "y", "x").cache()

  test("merging tracker resolves a genuine merge and records genealogy") {
    val res = Track.track(collideLate, geom, spec,
      TrackConfig(rFill = 0, tFill = 0, areaFilterQuartile = 0.0, dropSmallestObject = false,
        overlapThreshold = 0.2, allowMerging = true))
    // the collision must be detected and ledgered
    assert(res.stats("total_merges") >= 1, "no merge recorded for a real collision")
    val m = res.merges.head()
    assert(m.getAs[Seq[Long]]("parent_ids").length >= 2)
    assert(res.stats("n_events_final") >= 1)
    // field must stay fully labeled after split/merge rounds
    assert(res.idField.count() == collideLate.count())
  }

  test("merges genealogy: parent-aligned overlap areas, child_ids, n_children (track.py:3776-3793)") {
    val res = Track.track(collideLate, geom, spec,
      TrackConfig(rFill = 0, tFill = 0, areaFilterQuartile = 0.0, dropSmallestObject = false,
        overlapThreshold = 0.2, allowMerging = true))
    res.merges.collect().foreach { r =>
      val parents = r.getSeq[Long](r.fieldIndex("parent_ids"))
      val children = r.getSeq[Long](r.fieldIndex("child_ids"))
      val areas = r.getSeq[Double](r.fieldIndex("overlap_areas"))
      assert(areas.length == parents.length, "overlap_areas must be parent-aligned")
      assert(areas.forall(_ > 0), "every ledgered parent overlapped the child")
      assert(r.getAs[Long]("n_parents") == parents.length)
      assert(r.getAs[Long]("n_children") == children.length)
      assert(children.contains(r.getAs[Long]("child_id")),
        "fragment 0 keeps the child id")
    }
  }

  test("merge ledger maps parents to final event ids with full sibling lists (track.py:3026-3106)") {
    val res = Track.track(collideLate, geom, spec,
      TrackConfig(rFill = 0, tFill = 0, areaFilterQuartile = 0.0, dropSmallestObject = false,
        overlapThreshold = 0.2, allowMerging = true))
    val ledger = res.mergeLedger.collect()
    assert(ledger.nonEmpty, "a merging run must produce a sibling ledger")
    val eventIds = res.idField.select("event_id").distinct()
      .collect().map(_.getLong(0)).toSet
    ledger.foreach { r =>
      val e = r.getAs[Long]("event_id")
      val sibs = r.getSeq[Long](r.fieldIndex("sibling_event_ids"))
      assert(eventIds.contains(e), s"ledger event $e not a final event id")
      assert(sibs.contains(e), "sibling list includes the parent itself")
      assert(sibs == sibs.sorted && sibs.distinct == sibs)
      sibs.foreach(s => assert(eventIds.contains(s)))
    }
    // every merge event contributes its parents: ledger rows per time ≥ 1
    assert(ledger.map(_.getAs[java.sql.Timestamp]("time")).distinct.nonEmpty)
  }

  test("non-merging tracker on the same collision fuses into fewer events") {
    val res = Track.track(collideLate, geom, spec,
      TrackConfig(rFill = 0, tFill = 0, areaFilterQuartile = 0.0, dropSmallestObject = false,
        overlapThreshold = 0.2, allowMerging = false))
    assert(res.stats("n_events_final") >= 1)
  }

  test("NN partitioning resolves merges like centroid partitioning") {
    val res = Track.track(collideLate, geom, spec,
      TrackConfig(rFill = 0, tFill = 0, areaFilterQuartile = 0.0, dropSmallestObject = false,
        overlapThreshold = 0.2, allowMerging = true, nnPartitioning = true))
    assert(res.idField.count() == collideLate.count())
    assert(res.stats("total_merges") >= 1, "NN path must also ledger the collision")
    assert(res.stats("n_events_final") >= 1)
  }

  test("event numbering is distributed: no WindowExec produces event_id") {
    val gids = Track.globalIds(Raster.labelPerSlice(blobs, spec))
    val mapping = Track.eventMapping(gids, 0.3)
    val plan = mapping.queryExecution.executedPlan.toString
    // the only windows left are the bounded one-row-per-timestep timeIndex
    // rank; event numbering itself must be the zipWithIndex path
    assert(!plan.split("\n").exists(l => l.contains("Window") && l.contains("event_id")),
      s"event_id must come from denseNumber (sorted zipWithIndex), not a window:\n$plan")
    // ids are still dense 1..N
    val ids = mapping.select("event_id").distinct().orderBy("event_id")
      .collect().map(_.getLong(0))
    assert(ids.toSeq == (1L to ids.length).toSeq)
  }

  test("run metadata JSON round-trips the config and stats") {
    val res = Track.track(blobs, geom, spec,
      TrackConfig(rFill = 0, tFill = 0, areaFilterQuartile = 0.0, dropSmallestObject = false,
        overlapThreshold = 0.3, allowMerging = false))
    val p = java.nio.file.Files.createTempFile("graft_meta", ".json").toString
    Track.writeRunMetadata(res, TrackConfig(rFill = 0, tFill = 0,
      areaFilterQuartile = 0.0, overlapThreshold = 0.3, allowMerging = false), p)
    val s = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))
    assert(s.contains("\"n_events_final\""))
    assert(s.contains("\"overlap_threshold\": 0.3"))
  }

  test("tracker is deterministic: two runs produce identical event fields") {
    // same config as the merging test above (rFill=0 keeps the morphology out
    // of the loop — with rFill=1 the bridged blobs trigger many more
    // resolution rounds and the doubled run blows the suite budget)
    val cfg = TrackConfig(rFill = 0, tFill = 0, areaFilterQuartile = 0.0, dropSmallestObject = false,
      overlapThreshold = 0.2, allowMerging = true)
    def run() = Track.track(collideLate, geom, spec, cfg)
      .idField.orderBy("time", "y", "x")
      .collect().map(r => (r.getTimestamp(0).getTime, r.getInt(1), r.getInt(2), r.getLong(3)))
    val a = run()
    val b = run()
    assert(a.sameElements(b), "tracker output must be run-deterministic")
  }

  test("checkpoint save/resume reproduces the run and skips preprocessing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val base = TrackConfig(rFill = 1, tFill = 0, areaFilterQuartile = 0.0,
      dropSmallestObject = false, overlapThreshold = 0.2, allowMerging = false)
    def dump(r: Track.TrackResult) = r.idField.orderBy("time", "y", "x")
      .collect().map(x => (x.getTimestamp(0).getTime, x.getInt(1), x.getInt(2), x.getLong(3)))
    val saved = Track.track(collideLate, geom, spec,
      base.copy(checkpointMode = "save", checkpointDir = Some(dir)))
    val savedField = dump(saved)
    val savedStats = saved.stats
    assert(new java.io.File(s"$dir/preproc_stats.json").exists())
    val resumed = Track.track(collideLate, geom, spec,
      base.copy(checkpointMode = "load", checkpointDir = Some(dir)))
    assert(dump(resumed).sameElements(savedField),
      "resumed run must reproduce the saved run's event field")
    assert(resumed.stats == savedStats)
  }

  private def ts(day: Int): java.sql.Timestamp =
    new java.sql.Timestamp(java.sql.Timestamp.valueOf("2000-01-01 00:00:00").getTime + day * 86400000L)

  private def ts6(step: Int): java.sql.Timestamp =
    new java.sql.Timestamp(ts(0).getTime + step * 21600000L)
}
