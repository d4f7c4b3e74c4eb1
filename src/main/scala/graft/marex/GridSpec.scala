package graft.marex

/** Engine configuration, mirroring the reference's dimension/coordinate
  * resolution and tracker parameter surface (marEx detect.py:161–202,
  * track.py:323–748) as plain case classes with eager validation.
  */

/** Grid geometry. Fields use a FIXED long-format schema: gridded fields
  * are `(time, y, x, value)`, unstructured fields `(time, cell, value)`,
  * and the static geometry table `(y, x, lat, lon, area, valid)` —
  * rename columns before calling the kernels (a `select` is free). */
final case class GridSpec(
    nx: Int = 0, // raster width (needed for periodic-lon kernels)
    ny: Int = 0,
    periodicX: Boolean = true) {
  def requireRaster(): Unit =
    require(nx > 0 && ny > 0, s"raster kernels need nx/ny > 0 (got $nx×$ny)")
}

/** Detection parameters (marEx preprocess_data, detect.py:287–413). */
final case class DetectConfig(
    methodAnomaly: String = "fixed_baseline", // detrend_harmonic | shifting_baseline | detrend_fixed_baseline
    methodExtreme: String = "global_extreme", // hobday_extreme
    thresholdPercentile: Double = 95,
    windowYearBaseline: Int = 15, // shifting baseline
    smoothDaysBaseline: Int = 21, // smoothed rolling clim
    windowDaysHobday: Int = 11,
    methodPercentile: String = "exact", // approximate
    precision: Double = 0.01, // histogram bin width
    maxAnomaly: Double = 5.0, // histogram range
    stdNormalise: Boolean = false,
    detrendOrders: Seq[Int] = Seq(1), // polynomial orders beyond intercept
    harmonics: Int = 2) { // annual + semi-annual
  // eager validation raises the reference's ConfigurationError with its
  // message wording (test_error_handling.py:88/:98/:633/:693)
  if (!Seq("detrend_harmonic", "shifting_baseline", "fixed_baseline",
      "detrend_fixed_baseline").contains(methodAnomaly))
    throw new ConfigurationError(s"Unknown anomaly method '$methodAnomaly'",
      "valid: fixed_baseline | detrend_fixed_baseline | detrend_harmonic | shifting_baseline")
  if (!Seq("global_extreme", "hobday_extreme").contains(methodExtreme))
    throw new ConfigurationError(s"Unknown extreme method '$methodExtreme'",
      "valid: global_extreme | hobday_extreme")
  if (!Seq("exact", "approximate").contains(methodPercentile))
    throw new ConfigurationError(s"Unknown method_percentile '$methodPercentile'",
      "valid: exact | approximate")
  if (!(thresholdPercentile > 0 && thresholdPercentile < 100))
    throw new ConfigurationError(
      s"threshold_percentile=$thresholdPercentile must be in (0, 100)")
  if (windowDaysHobday % 2 != 1)
    throw new ConfigurationError(
      s"window_days_hobday must be an odd number, got $windowDaysHobday")
}

/** Tracking parameters (marEx tracker, track.py:323–474). */
final case class TrackConfig(
    rFill: Int = 8, // morphology disk radius (cells)
    tFill: Int = 2, // max temporal gap to fill (days); must be even
    // NaN = unset. The two filters are mutually exclusive, resolved like the
    // reference (_resolve_area_filtering_parameters, track.py:712–749):
    // neither given → quartile 0.5; absolute given → quartile mode off.
    // Read via `resolvedQuartile`, never the raw field.
    areaFilterQuartile: Double = Double.NaN,
    areaFilterAbsolute: Option[Double] = None,
    overlapThreshold: Double = 0.5,
    allowMerging: Boolean = true,
    nnPartitioning: Boolean = false, // false → centroid partitioning
    // strict sequential-in-time split/merge (reference gridded semantics,
    // track.py:3337–3802): decisions at t read updated t−1/t−2; driver-
    // orchestrated. false → batch-parallel (the default scale path).
    sequentialSplitMerge: Boolean = false,
    // the reference's structured-grid filter_small_objects unconditionally
    // drops the first object entry (`object_ids_keep[0] = -1`,
    // track.py:1898) — positionally meant for background 0 but regionprops
    // labels start at 1, so object ID 1 is ALWAYS removed. Kept (default)
    // for golden-count parity; set false for the mathematically clean
    // filter.
    dropSmallestObject: Boolean = true,
    // preprocessing checkpoint (reference helper.py:642, run_preprocess
    // checkpoint="save"/"load"): "save" writes the filtered id field +
    // object stats to checkpointDir after preprocessing; "load" skips
    // morphology/gap-fill/filtering entirely and resumes from the saved
    // state. "" = no checkpointing.
    checkpointMode: String = "",
    checkpointDir: Option[String] = None,
    maxInnerIter: Int = 10,
    maxOuterIter: Int = 40) {
  // ConfigurationError with the reference's message wording
  // (test_error_handling.py:395/:404/:432, track.py:692/:714/:736)
  if (tFill % 2 != 0)
    throw new ConfigurationError(
      s"T_fill must be even for temporal symmetry, got $tFill (track.py:714)")
  if (!(overlapThreshold > 0 && overlapThreshold <= 1))
    throw new ConfigurationError(
      s"overlap_threshold=$overlapThreshold must be in (0, 1]")
  if (areaFilterAbsolute.isDefined && !areaFilterQuartile.isNaN)
    throw new ConfigurationError(
      "Cannot specify both area filtering parameters: area_filter_quartile and " +
        "area_filter_absolute are mutually exclusive (track.py:736)")
  if (!areaFilterAbsolute.forall(_ > 0))
    throw new ConfigurationError(
      s"area_filter_absolute=${areaFilterAbsolute.orNull} must be positive (track.py:692)")
  if (!(areaFilterQuartile.isNaN || (areaFilterQuartile >= 0 && areaFilterQuartile < 1)))
    throw new ConfigurationError(
      s"Invalid area_filter_quartile value: $areaFilterQuartile (must be in [0, 1))")
  /** The quartile the filter actually runs with (track.py:712–749). */
  def resolvedQuartile: Double =
    if (!areaFilterQuartile.isNaN) areaFilterQuartile
    else if (areaFilterAbsolute.isDefined) 0.0
    else 0.5
  if (!Set("", "save", "load")(checkpointMode))
    throw new ConfigurationError(
      s"checkpointMode must be ''/'save'/'load', got '$checkpointMode'")
  if (checkpointMode.nonEmpty && checkpointDir.isEmpty)
    throw new ConfigurationError("checkpointMode requires checkpointDir")
}

/** Exception hierarchy mirroring the reference's (exceptions.py:11–494):
  * message + suggestion + context, so callers get actionable errors. */
class MarexSparkException(
    message: String,
    val suggestion: String = "",
    val context: Map[String, String] = Map.empty)
  extends RuntimeException(
    message +
      (if (suggestion.nonEmpty) s"\n  suggestion: $suggestion" else "") +
      (if (context.nonEmpty) s"\n  context: $context" else ""))

/** Invalid or unusable input data (exceptions.py:84). */
class DataValidationError(msg: String, suggestion: String = "",
    context: Map[String, String] = Map.empty)
  extends MarexSparkException(msg, suggestion, context)

/** Invalid parameters or parameter combinations (exceptions.py:180). */
class ConfigurationError(msg: String, suggestion: String = "")
  extends MarexSparkException(msg, suggestion)

/** Coordinate-system problems: undetectable units, out-of-range axes
  * (exceptions.py:122; raised from the unit auto-detection like
  * track.py:923–961's create_coordinate_error). */
class CoordinateError(msg: String, suggestion: String = "",
    context: Map[String, String] = Map.empty)
  extends MarexSparkException(msg, suggestion, context)

/** Numerical/computation failures mid-pipeline — the reference's
  * RuntimeError-equivalent (exceptions.py:151; EXCEPTION_MAP routes
  * RuntimeError here, exceptions.py:425). */
class ProcessingError(msg: String, suggestion: String = "",
    context: Map[String, String] = Map.empty)
  extends MarexSparkException(msg, suggestion, context)

/** Failures inside tracking operations: empty object sets, invariant
  * violations, checkpoint-resume gaps (exceptions.py:255; raised like
  * track.py:1822/:1872/:3968). */
class TrackingError(msg: String, suggestion: String = "",
    context: Map[String, String] = Map.empty)
  extends MarexSparkException(msg, suggestion, context)

/** Missing required capability (exceptions.py:217 — the reference uses it
  * for absent optional python packages). The engine bundles every codec it
  * supports, so nothing raises this at runtime today; it exists so error
  * handling written against the reference taxonomy ports intact. */
class DependencyError(msg: String, suggestion: String = "")
  extends MarexSparkException(msg, suggestion)

/** Plotting failures (exceptions.py:295). The engine's visualisation
  * surface is the plot-support QUERIES (I9) — relational plans with no
  * render step — so nothing raises this at runtime today; kept for
  * taxonomy parity like [[DependencyError]]. */
class VisualisationError(msg: String, suggestion: String = "")
  extends MarexSparkException(msg, suggestion)
