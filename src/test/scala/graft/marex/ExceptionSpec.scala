package graft.marex

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exception-taxonomy parity (exceptions.py:11–494) — the subclass set,
  * the suggestion/context formatting, and the error paths
  * test_error_handling.py hits most: unknown detect methods (:88/:98),
  * method_percentile (:633), odd hobday window (:693), T_fill evenness
  * (:432), area-filter validation (:395), coordinate-unit auto-detection
  * (:453), spatial hobday on a mesh (:1362 in detect.py), and the
  * zero-objects tracking guard (track.py:1822). */
class ExceptionSpec extends SparkSpec {
  import spark.implicits._

  test("every subclass is a MarexSparkException and formats suggestion + context") {
    val e = new TrackingError("boom", "try harder", Map("k" -> "v"))
    assert(e.isInstanceOf[MarexSparkException])
    assert(e.getMessage.contains("boom"))
    assert(e.getMessage.contains("suggestion: try harder"))
    assert(e.getMessage.contains("k -> v"))
    // the full reference set exists (exceptions.py taxonomy)
    Seq(new DataValidationError("m"), new ConfigurationError("m"),
      new CoordinateError("m"), new ProcessingError("m"),
      new TrackingError("m"), new DependencyError("m"),
      new VisualisationError("m"))
      .foreach(x => assert(x.isInstanceOf[MarexSparkException]))
  }

  test("unknown detect methods raise ConfigurationError with the reference wording") {
    val a = intercept[ConfigurationError](DetectConfig(methodAnomaly = "invalid_method"))
    assert(a.getMessage.contains("Unknown anomaly method"))
    val x = intercept[ConfigurationError](DetectConfig(methodExtreme = "invalid_method"))
    assert(x.getMessage.contains("Unknown extreme method"))
    val p = intercept[ConfigurationError](DetectConfig(methodPercentile = "invalid_method"))
    assert(p.getMessage.contains("Unknown method_percentile 'invalid_method'"))
    val w = intercept[ConfigurationError](DetectConfig(windowDaysHobday = 10))
    assert(w.getMessage.contains("window_days_hobday must be an odd number"))
  }

  test("tracker parameter validation raises ConfigurationError (T_fill, quartile)") {
    val t = intercept[ConfigurationError](TrackConfig(tFill = 3))
    assert(t.getMessage.contains("T_fill must be even for temporal symmetry"))
    val q = intercept[ConfigurationError](TrackConfig(areaFilterQuartile = 1.5))
    assert(q.getMessage.contains("Invalid area_filter_quartile value"))
    val o = intercept[ConfigurationError](TrackConfig(overlapThreshold = 0.0))
    assert(o.getMessage.contains("overlap_threshold"))
    val c = intercept[ConfigurationError](TrackConfig(checkpointMode = "save"))
    assert(c.getMessage.contains("checkpointDir"))
  }

  test("undetectable coordinate units raise CoordinateError (regional lon span)") {
    val regional = (for (y <- 0 until 4; x <- 0 until 4)
      yield (y, x, 40.0 + y, 10.0 + x, 1.0f, true))
      .toDF("y", "x", "lat", "lon", "area", "valid")
    val e = intercept[CoordinateError](Unstructured.detectCoordSystem(regional))
    assert(e.getMessage.contains("Cannot auto-detect coordinate units"))
    assert(e.getMessage.contains("explicitUnits"))
  }

  test("zero objects under quartile filtering raise TrackingError with suggestions") {
    val emptyIds = Seq.empty[(java.sql.Timestamp, Int, Int, Long)]
      .toDF("time", "y", "x", "gid")
    val geom = (for (y <- 0 until 2; x <- 0 until 2)
      yield (y, x, 1.0f)).toDF("y", "x", "area")
    val e = intercept[TrackingError] {
      Track.filterSmallObjects(emptyIds, geom,
        TrackConfig(areaFilterQuartile = 0.5))
    }
    assert(e.getMessage.contains("No objects found for area-based filtering"))
    assert(e.getMessage.contains("extreme events")) // actionable suggestion
  }

  test("non-finite data raises DataValidationError (detect validation)") {
    val field = Seq(
      (java.sql.Timestamp.valueOf("2000-01-01 00:00:00"), 0, 0, 1.0),
      (java.sql.Timestamp.valueOf("2000-01-01 00:00:00"), 0, 1, Double.NaN))
      .toDF("time", "y", "x", "value")
    val mask = Seq((0, 0, true), (0, 1, true)).toDF("y", "x", "valid")
    val e = intercept[DataValidationError](Detect.validate(field, mask))
    assert(e.getMessage.nonEmpty)
  }
}
