package graft.marex

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end detect → track on synthetic SST, mirroring the reference's
  * integration suite (tests/test_integration.py): statistical tolerances
  * instead of golden rasters, plus cross-method consistency of the anomaly
  * matrix (tests/test_gridded_preprocessing.py's method matrix). */
class IntegrationSpec extends SparkSpec {

  private val ny = 12
  private val nx = 24
  private lazy val spec = GridSpec(ny = ny, nx = nx)
  private lazy val geom = SyntheticData.geometry(spark, ny, nx).cache()
  private lazy val sst = SyntheticData.sstGridded(spark, nDays = 365 * 3, ny = ny, nx = nx,
    noiseAmp = 2.0).cache()

  test("full pipeline: preprocess → extremes → track yields coherent events") {
    val (anom, _, extremes) = Detect.preprocess(sst,
      DetectConfig(methodAnomaly = "fixed_baseline", methodExtreme = "global_extreme",
        thresholdPercentile = 95))
    // ~5% flagged (binomial tolerance, conftest.py:168–232)
    val frac = extremes.agg(avg(col("extreme").cast("double"))).head().getDouble(0)
    assert(frac > 0.035 && frac < 0.065, s"extreme fraction $frac")

    val flags = extremes.filter(col("extreme")).select("time", "y", "x")
    val res = Track.track(flags, geom, spec,
      TrackConfig(rFill = 1, tFill = 2, areaFilterQuartile = 0.5,
        overlapThreshold = 0.25, allowMerging = false))
    val nEvents = res.stats("n_events_final")
    assert(nEvents > 0, "no events tracked")
    // events must be temporally contiguous-ish: start <= end everywhere
    val badSpan = res.events.filter(col("time_start") > col("time_end")).count()
    assert(badSpan == 0)
    // ID field covers only flagged (possibly morphology-altered) cells and
    // every event id in the field has a props row
    val noProps = res.idField.select("time", "event_id").distinct()
      .join(res.eventProps.select("time", "event_id").distinct(),
        Seq("time", "event_id"), "left_anti").count()
    assert(noProps == 0)
    // anomaly sanity feeding the pipeline
    assert(anom.count() == sst.count())
  }

  test("mesh full pipeline: preprocessCells → extremes → UnstructuredTracker") {
    // the reference's unstructured integration test STOPS after
    // preprocessing ("Full unstructured tracking is complex and tested
    // separately", test_integration.py:290–293); here the cell-keyed
    // detect output feeds the tracker directly — one year of the
    // reference's own sst_unstructured.zarr, detrend_harmonic +
    // global_extreme at the reference's percentile 90
    // (test_integration.py:266–273), then a deterministic ring mesh
    // (their mock is np.random neighbours)
    val meshDir = "/root/reference/tests/data/sst_unstructured.zarr"
    assume(new java.io.File(s"$meshDir/.zgroup").exists())
    val field = ReferenceFixtures.loadSstUnstructured(spark, meshDir,
      maxDays = 365, maskedCells = Seq(2))
    val (_, _, ext) = UnstructuredIngest.preprocessCells(field,
      DetectConfig(methodAnomaly = "detrend_harmonic",
        methodExtreme = "global_extreme", thresholdPercentile = 90))
    val frac = ext.agg(avg(col("extreme").cast("double"))).head().getDouble(0)
    assert(frac > 0.08 && frac < 0.12, s"extreme fraction $frac !~ 10%")

    val nCells = 405
    val nbr = Array.ofDim[Int](3, nCells)
    for (i <- 0 until nCells) {
      nbr(0)(i) = if (i > 0) i - 1 else -1
      nbr(1)(i) = if (i < nCells - 1) i + 1 else -1
      nbr(2)(i) = -1
    }
    val mesh = UnstructuredTracker.Mesh(nbr,
      Array.tabulate(nCells)(i => -90.0 + 180.0 * i / nCells),
      Array.tabulate(nCells)(i => -180.0 + 360.0 * i / nCells),
      Array.fill(nCells)(1000.0), Array.fill(nCells)(true))
    val flags = ext.filter(col("extreme")).select("time", "cell")
    val res = UnstructuredTracker.track(flags, mesh,
      TrackConfig(rFill = 0, tFill = 0, areaFilterQuartile = 0.5,
        allowMerging = true, nnPartitioning = true))
    val nEvents = res.idField.select("event_id").distinct().count()
    info(s"mesh events tracked = $nEvents, stats = ${res.stats}")
    assert(nEvents > 0, "no events tracked from mesh extremes")
    // every tracked cell id is a real mesh cell and the masked cell
    // never re-enters through tracking
    val badCells = res.idField
      .filter(col("cell") < 0 || col("cell") >= nCells || col("cell") === 2)
      .count()
    assert(badCells == 0)
  }

  test("anomaly method matrix: all four methods produce near-zero-mean anomalies") {
    val short = SyntheticData.sstGridded(spark, nDays = 365 * 3, ny = 6, nx = 12).cache()
    for (m <- Seq("fixed_baseline", "detrend_harmonic", "detrend_fixed_baseline")) {
      val (anom, _, ext) = Detect.preprocess(short,
        DetectConfig(methodAnomaly = m, methodExtreme = "global_extreme"))
      val mean = math.abs(anom.agg(avg("anomaly")).head().getDouble(0))
      assert(mean < 0.3, s"method $m mean anomaly $mean")
      val frac = ext.agg(avg(col("extreme").cast("double"))).head().getDouble(0)
      assert(frac > 0.02 && frac < 0.09, s"method $m flags $frac")
    }
    // shifting baseline needs window+1 years; 3 years with window=2 leaves 1
    val (anomS, _, extS) = Detect.preprocess(short,
      DetectConfig(methodAnomaly = "shifting_baseline", windowYearBaseline = 2))
    assert(anomS.count() > 0)
    val fracS = extS.agg(avg(col("extreme").cast("double"))).head().getDouble(0)
    assert(fracS > 0.02 && fracS < 0.09, s"shifting baseline flags $fracS")
  }

  test("hobday + approximate histogram path end-to-end") {
    val (_, thr, ext) = Detect.preprocess(sst,
      DetectConfig(methodAnomaly = "fixed_baseline", methodExtreme = "hobday_extreme",
        methodPercentile = "approximate", precision = 0.05, maxAnomaly = 8.0))
    assert(thr.select("doy").distinct().count() >= 365)
    val frac = ext.agg(avg(col("extreme").cast("double"))).head().getDouble(0)
    // histogram approximation loosens the band slightly
    assert(frac > 0.02 && frac < 0.09, s"hobday approx flags $frac")
  }
}
