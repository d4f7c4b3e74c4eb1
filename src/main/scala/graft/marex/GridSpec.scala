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
  require(Seq("detrend_harmonic", "shifting_baseline", "fixed_baseline",
    "detrend_fixed_baseline").contains(methodAnomaly), s"bad methodAnomaly $methodAnomaly")
  require(Seq("global_extreme", "hobday_extreme").contains(methodExtreme))
  require(Seq("exact", "approximate").contains(methodPercentile),
    s"bad methodPercentile '$methodPercentile' (exact | approximate)")
  require(thresholdPercentile > 0 && thresholdPercentile < 100)
  require(windowDaysHobday % 2 == 1, "hobday window must be odd")
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
  require(tFill % 2 == 0, "T_fill must be even (matches reference track.py:714)")
  require(overlapThreshold > 0 && overlapThreshold <= 1)
  require(!(areaFilterAbsolute.isDefined && !areaFilterQuartile.isNaN),
    "Cannot specify both area filtering parameters: area_filter_quartile and " +
      "area_filter_absolute are mutually exclusive (track.py:736)")
  require(areaFilterAbsolute.forall(_ > 0),
    s"area_filter_absolute=${areaFilterAbsolute.orNull} must be positive (track.py:692)")
  require(areaFilterQuartile.isNaN || (areaFilterQuartile >= 0 && areaFilterQuartile < 1))
  /** The quartile the filter actually runs with (track.py:712–749). */
  def resolvedQuartile: Double =
    if (!areaFilterQuartile.isNaN) areaFilterQuartile
    else if (areaFilterAbsolute.isDefined) 0.0
    else 0.5
  require(Set("", "save", "load")(checkpointMode),
    s"checkpointMode must be ''/'save'/'load', got '$checkpointMode'")
  require(checkpointMode.isEmpty || checkpointDir.nonEmpty,
    "checkpointMode requires checkpointDir")
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

class DataValidationError(msg: String, suggestion: String = "",
    context: Map[String, String] = Map.empty)
  extends MarexSparkException(msg, suggestion, context)

class ConfigurationError(msg: String, suggestion: String = "")
  extends MarexSparkException(msg, suggestion)
