package graft.marex

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Detect-pipeline parity on the reference's RAW SST fixture: the full
  * anomaly → threshold → extremes pipeline must flag ≈(100−p)% of samples
  * at the p-th percentile, the reference's own regression contract
  * (tests/test_gridded_preprocessing.py:85–88, conftest.py
  * assert_percentile_frequency). Uses a 1500-day subset exactly like the
  * reference integration tests (test_integration.py:103). */
class DetectGoldenSpec extends SparkSpec {

  private val fixtureDir = "/root/reference/tests/data/sst_gridded.zarr"
  private def haveFixture = new java.io.File(s"$fixtureDir/.zgroup").exists()

  private lazy val field =
    ReferenceFixtures.loadSstGridded(spark, fixtureDir, maxDays = 1500)
      .localCheckpoint()

  private def frequency(cfg: DetectConfig): Double = {
    val (_, _, ext) = Detect.preprocess(field, cfg)
    ext.agg(avg(col("extreme").cast("double"))).head().getDouble(0)
  }

  test("fixture loads: ocean-only samples, plausible SST range") {
    assume(haveFixture)
    val n = field.count()
    assert(n > 1000000, s"too few samples $n") // 1500 × (800 − land)
    val mm = field.agg(min("value"), max("value")).head()
    // fixture stores SST in Kelvin
    assert(mm.getDouble(0) > 260 && mm.getDouble(1) < 320,
      s"implausible SST range ${mm.getDouble(0)}..${mm.getDouble(1)}")
  }

  test("fixed_baseline + global_extreme flags ~5% at the 95th percentile") {
    assume(haveFixture)
    val f = frequency(DetectConfig(methodAnomaly = "fixed_baseline",
      methodExtreme = "global_extreme", thresholdPercentile = 95))
    info(f"frequency = $f%.5f")
    // global percentile of the pixel's own anomalies: exact by construction
    assert(math.abs(f - 0.05) < 0.005, s"frequency $f !~ 5%")
  }

  test("detrend_harmonic + hobday_extreme flags ~5% at the 95th percentile") {
    assume(haveFixture)
    val f = frequency(DetectConfig(methodAnomaly = "detrend_harmonic",
      methodExtreme = "hobday_extreme", thresholdPercentile = 95,
      windowDaysHobday = 21))
    info(f"frequency = $f%.5f")
    // per-(pixel, doy) windowed percentile on 4 years: close to 5% but
    // looser than the global method (reference band: binomial 2σ around
    // 0.05 — we allow ±1 percentage point)
    assert(math.abs(f - 0.05) < 0.01, s"frequency $f !~ 5%")
  }

  test("shifting_baseline trims the baseline years and flags ~5%") {
    assume(haveFixture)
    val cfg = DetectConfig(methodAnomaly = "shifting_baseline",
      methodExtreme = "global_extreme", thresholdPercentile = 95,
      windowYearBaseline = 2, smoothDaysBaseline = 7)
    val (anom, _, ext) = Detect.preprocess(field, cfg)
    // the first windowYearBaseline years have no baseline → dropped
    // (reference contract: time shrinks by ~2×365, test_integration.py:125)
    val nDays = anom.select("time").distinct().count()
    info(s"days after trim = $nDays (input 1500)")
    assert(nDays < 1500 && nDays > 1500 - 2 * 366 - 100 && nDays < 1500 - 2 * 365 + 100,
      s"unexpected baseline trim: $nDays days")
    val f = ext.agg(avg(col("extreme").cast("double"))).head().getDouble(0)
    info(f"frequency = $f%.5f")
    assert(math.abs(f - 0.05) < 0.015, s"frequency $f !~ 5%")
  }
}
