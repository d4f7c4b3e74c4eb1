package graft.marex

import graft.SparkSpec

/** Tracker golden-count parity against the reference's OWN regression
  * fixture and bands (tests/test_gridded_tracking.py): the fixture zarr is
  * read directly (blosc-lz4) and the full detect-output → track pipeline
  * must reproduce the reference's object/event counts within its published
  * tolerances.
  */
class GoldenTrackingSpec extends SparkSpec {

  private val fixtureDir = "/root/reference/tests/data/extremes_gridded.zarr"

  private def haveFixture = new java.io.File(s"$fixtureDir/.zgroup").exists()

  private lazy val loaded = ReferenceFixtures.loadExtremesGridded(spark, fixtureDir)

  test("fixture loads with the expected shape and plausible extreme fraction") {
    assume(haveFixture)
    val (flags, geom, spec) = loaded
    assert(spec.ny == 180 && spec.nx == 360)
    assert(flags.select("time").distinct().count() == 32)
    val nFlag = flags.count()
    // 95th-percentile extremes: a few percent of 32×64800 samples
    assert(nFlag > 20000 && nFlag < 400000, s"implausible flag count $nFlag")
    assert(geom.filter("valid").count() > 30000)
  }

  test("basic tracking matches reference golden counts (549/274/24)") {
    assume(haveFixture)
    val (flags, geom, spec) = loaded
    // test_gridded_tracking.py:25–77: R_fill=4, T_fill=0, quartile=0.5,
    // allow_merging=False, poles masked out
    val res = Track.track(flags, geom, spec,
      TrackConfig(rFill = 4, tFill = 0, areaFilterQuartile = 0.5,
        allowMerging = false))
    val pre = res.stats("n_objects_prefiltered")
    val post = res.stats("n_objects_filtered")
    val events = res.stats("n_events_final")
    info(s"prefiltered=$pre filtered=$post events=$events")
    assert(math.abs(pre - 549L) <= 2, s"N_objects_prefiltered $pre !~ 549±2")
    assert(math.abs(post - 274L) <= 2, s"N_objects_filtered $post !~ 274±2")
    assert(math.abs(events - 24L) <= 1, s"N_events_final $events !~ 24±1")
  }

  test("merging tracking matches reference golden counts (516/258/20/13)") {
    assume(haveFixture)
    val (flags, geom, spec) = loaded
    // test_gridded_tracking.py:82–145: R_fill=4, T_fill=2, quartile=0.5,
    // allow_merging=True, overlap_threshold=0.5, nn_partitioning=True
    val res = Track.track(flags, geom, spec,
      TrackConfig(rFill = 4, tFill = 2, areaFilterQuartile = 0.5,
        overlapThreshold = 0.5, allowMerging = true, nnPartitioning = true,
        sequentialSplitMerge = true))
    val pre = res.stats("n_objects_prefiltered")
    val post = res.stats("n_objects_filtered")
    val events = res.stats("n_events_final")
    val merges = res.stats("total_merges")
    info(s"prefiltered=$pre filtered=$post events=$events merges=$merges")
    assert(math.abs(pre - 516L) <= 2, s"N_objects_prefiltered $pre !~ 516±2")
    assert(math.abs(post - 258L) <= 2, s"N_objects_filtered $post !~ 258±2")
    assert(math.abs(events - 20L) <= 1, s"N_events_final $events !~ 20±1")
    assert(math.abs(merges - 13L) <= 2, s"total_merges $merges !~ 13±2")
  }

  test("centroid-partitioned merging matches reference golden counts (516/258/21/15)") {
    assume(haveFixture)
    val (flags, geom, spec) = loaded
    // test_gridded_tracking.py:148–203 (data-consistency run): R_fill=4,
    // T_fill=2, quartile=0.5, allow_merging=True with DEFAULT partitioning
    // (nn_partitioning=False → centroid) — the partitioning choice shifts
    // the merge ledger (15±2 vs 13±2 under NN) and events (21±1).
    val res = Track.track(flags, geom, spec,
      TrackConfig(rFill = 4, tFill = 2, areaFilterQuartile = 0.5,
        overlapThreshold = 0.5, allowMerging = true, nnPartitioning = false,
        sequentialSplitMerge = true))
    val st = res.stats
    info(s"prefiltered=${st("n_objects_prefiltered")} filtered=${st("n_objects_filtered")} " +
      s"events=${st("n_events_final")} merges=${st("total_merges")}")
    assert(math.abs(st("n_objects_prefiltered") - 516L) <= 2)
    assert(math.abs(st("n_objects_filtered") - 258L) <= 2)
    assert(math.abs(st("n_events_final") - 21L) <= 1)
    assert(math.abs(st("total_merges") - 15L) <= 2)
  }

  test("quartile sweep matches reference golden counts (q=0: 152 events; q=0.8: 21)") {
    assume(haveFixture)
    val (flags, geom, spec) = loaded
    // test_gridded_tracking.py:206–260: R_fill=2, T_fill=0, non-merging.
    // q=0.0 keeps everything except the drop-first-object quirk
    // (1046 → 1045); q=0.8 keeps the top quintile (209).
    def run(q: Double) = Track.track(flags, geom, spec,
      TrackConfig(rFill = 2, tFill = 0, areaFilterQuartile = q,
        allowMerging = false)).stats
    val none = run(0.0)
    info(s"q=0.0: pre=${none("n_objects_prefiltered")} post=${none("n_objects_filtered")} " +
      s"events=${none("n_events_final")}")
    assert(math.abs(none("n_objects_prefiltered") - 1046L) <= 2)
    assert(math.abs(none("n_objects_filtered") - 1045L) <= 2)
    assert(math.abs(none("n_events_final") - 152L) <= 1)
    val high = run(0.8)
    info(s"q=0.8: pre=${high("n_objects_prefiltered")} post=${high("n_objects_filtered")} " +
      s"events=${high("n_events_final")}")
    assert(math.abs(high("n_objects_prefiltered") - 1046L) <= 2)
    assert(math.abs(high("n_objects_filtered") - 209L) <= 2)
    assert(math.abs(high("n_events_final") - 21L) <= 1)
  }

  test("temporal gap filling matches reference golden counts (T_fill 0: 54; 4: 38)") {
    assume(haveFixture)
    val (flags, geom, spec) = loaded
    // test_gridded_tracking.py:263–320: R_fill=2, quartile=0.5, non-merging.
    // T_fill=4 bridges 4-day gaps: fewer, longer events (54 → 38) and a
    // slightly different prefiltered count (1041, gap-filled objects merge).
    def run(tFill: Int) = Track.track(flags, geom, spec,
      TrackConfig(rFill = 2, tFill = tFill, areaFilterQuartile = 0.5,
        allowMerging = false)).stats
    val noGaps = run(0)
    info(s"T_fill=0: pre=${noGaps("n_objects_prefiltered")} post=${noGaps("n_objects_filtered")} " +
      s"events=${noGaps("n_events_final")}")
    assert(math.abs(noGaps("n_objects_prefiltered") - 1046L) <= 2)
    assert(math.abs(noGaps("n_objects_filtered") - 522L) <= 2)
    assert(math.abs(noGaps("n_events_final") - 54L) <= 1)
    val withGaps = run(4)
    info(s"T_fill=4: pre=${withGaps("n_objects_prefiltered")} post=${withGaps("n_objects_filtered")} " +
      s"events=${withGaps("n_events_final")}")
    assert(math.abs(withGaps("n_objects_prefiltered") - 1041L) <= 2)
    assert(math.abs(withGaps("n_objects_filtered") - 522L) <= 2)
    assert(math.abs(withGaps("n_events_final") - 38L) <= 1)
  }

  private val unstructuredDir =
    "/root/reference/tests/data/extremes_unstructured_merging.zarr"

  test("unstructured merging tracking matches reference golden counts (98/97/12/9)") {
    assume(new java.io.File(s"$unstructuredDir/.zgroup").exists())
    val (flags, mesh) = ReferenceFixtures.loadExtremesUnstructured(spark, unstructuredDir)
    // test_unstructured_tracking.py:169–191: R_fill=1, area_filter_absolute=5,
    // T_fill=2, allow_merging=True, overlap_threshold=0.8, nn_partitioning=True
    val res = UnstructuredTracker.track(flags, mesh,
      TrackConfig(rFill = 1, tFill = 2, areaFilterAbsolute = Some(5.0),
        overlapThreshold = 0.8, allowMerging = true, nnPartitioning = true))
    val st = res.stats
    info(s"prefiltered=${st("n_objects_prefiltered")} filtered=${st("n_objects_filtered")} " +
      s"events=${st("n_events_final")} merges=${st("total_merges")}")
    assert(math.abs(st("n_objects_prefiltered") - 98L) <= 2,
      s"N_objects_prefiltered ${st("n_objects_prefiltered")} !~ 98±2")
    assert(math.abs(st("n_objects_filtered") - 97L) <= 2,
      s"N_objects_filtered ${st("n_objects_filtered")} !~ 97±2")
    assert(math.abs(st("n_events_final") - 12L) <= 2,
      s"N_events_final ${st("n_events_final")} !~ 12±2")
    assert(math.abs(st("total_merges") - 9L) <= 1,
      s"total_merges ${st("total_merges")} !~ 9±1")
  }

  test("distributed split/merge path equals the queue tracker on the golden fixture") {
    assume(new java.io.File(s"$unstructuredDir/.zgroup").exists())
    val (flags, mesh) = ReferenceFixtures.loadExtremesUnstructured(spark, unstructuredDir)
    val cfg = TrackConfig(rFill = 1, tFill = 2, areaFilterAbsolute = Some(5.0),
      overlapThreshold = 0.8, allowMerging = true, nnPartitioning = true)
    val dist = UnstructuredTracker.track(flags, mesh, cfg, scalePath = true)
    val queue = UnstructuredTracker.track(flags, mesh, cfg, scalePath = false)
    assert(dist.stats == queue.stats,
      s"path divergence: distributed=${dist.stats} queue=${queue.stats}")
    // full id-field equality: same (time, cell) → event id on every cell
    val d = dist.idField.orderBy("time", "cell").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getInt(1), r.getLong(2)))
    val q = queue.idField.orderBy("time", "cell").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getInt(1), r.getLong(2)))
    assert(d.length == q.length, s"cell counts differ: ${d.length} vs ${q.length}")
    assert(d.sameElements(q), {
      val diffs = d.zip(q).filter { case (a, b) => a != b }.take(5)
      s"${diffs.length}+ cells differ, first: ${diffs.mkString(", ")}"
    })
    // genealogy agrees: same (time, parents) multiset
    def geneal(df: org.apache.spark.sql.DataFrame) =
      df.select("time", "parent_ids", "n_parents", "n_children")
        .collect()
        .map(r => (r.getTimestamp(0).getTime,
          r.getSeq[Long](1).sorted.mkString("|"), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2))
    assert(geneal(dist.merges).sameElements(geneal(queue.merges)))
  }

  private val unstructuredBasicDir =
    "/root/reference/tests/data/extremes_unstructured.zarr"

  test("unstructured QUARTILE-path merging matches reference bands (15/8/3)") {
    assume(new java.io.File(s"$unstructuredBasicDir/.zgroup").exists())
    val (flags, mesh) = ReferenceFixtures.loadExtremesUnstructured(spark, unstructuredBasicDir)
    // test_unstructured_tracking.py:266–290 (data-consistency run): R_fill=3,
    // area_filter_quartile=0.5, T_fill=2, allow_merging=True; bands at
    // :351–353 — N_objects_prefiltered 15±5, filtered 8±2, events 3±1.
    // Exercises the quartile (not absolute) area filter on the mesh path.
    val res = UnstructuredTracker.track(flags, mesh,
      TrackConfig(rFill = 3, tFill = 2, areaFilterQuartile = 0.5,
        allowMerging = true))
    val st = res.stats
    info(s"prefiltered=${st("n_objects_prefiltered")} filtered=${st("n_objects_filtered")} " +
      s"events=${st("n_events_final")}")
    assert(math.abs(st("n_objects_prefiltered") - 15L) <= 5,
      s"N_objects_prefiltered ${st("n_objects_prefiltered")} !~ 15±5")
    assert(math.abs(st("n_objects_filtered") - 8L) <= 2,
      s"N_objects_filtered ${st("n_objects_filtered")} !~ 8±2")
    assert(math.abs(st("n_events_final") - 3L) <= 1,
      s"N_events_final ${st("n_events_final")} !~ 3±1")
  }

  test("unstructured quartile sweep: aggressive filtering yields fewer events") {
    assume(new java.io.File(s"$unstructuredBasicDir/.zgroup").exists())
    val (flags, mesh) = ReferenceFixtures.loadExtremesUnstructured(spark, unstructuredBasicDir)
    // test_unstructured_tracking.py:356–434: same fixture, R_fill=2,
    // T_fill=0, non-merging, quartile 0.1 vs 0.9 — higher filtering must
    // produce fewer or equal events, and the low-filter run must find some.
    def run(q: Double) = UnstructuredTracker.track(flags, mesh,
      TrackConfig(rFill = 2, tFill = 0, areaFilterQuartile = q,
        allowMerging = false)).stats
    val lo = run(0.1)
    val hi = run(0.9)
    info(s"events@0.1=${lo("n_events_final")} events@0.9=${hi("n_events_final")}")
    assert(hi("n_events_final") <= lo("n_events_final"),
      "aggressive filtering produced MORE events than minimal filtering")
    assert(lo("n_events_final") > 0, "low-filter run found no events")
  }
}
