package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.marex._

/** Reference-scale demonstration: the marEx CI fixture shape is 40 years of
  * daily 20×40 gridded SST (14611×20×40 ≈ 11.7 M samples,
  * tests/conftest.py:128–136). This main runs the full detect → track
  * pipeline at that scale on local[N] and prints stage timings — evidence
  * that the engine handles the reference's own working set interactively.
  * Run: `sbt "runMain graft.ScaleDemo [nYears] [method] [ny] [nx]`.
  *
  * The PRODUCTION shape probe is `ScaleDemo 2 exact 720 1440` — two years of
  * daily 0.25°-global slices (720×1440 ≈ 757 M samples), the reference's
  * stated target resolution: backs PERF.md's 100× extrapolations with a
  * measured operating point.
  */
object ScaleDemo {
  def main(args: Array[String]): Unit = {
    val nYears = if (args.nonEmpty) args(0).toInt else 40
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }

    val ny = if (args.length > 2) args(2).toInt else 20
    val nx = if (args.length > 3) args(3).toInt else 40
    val spec = GridSpec(ny = ny, nx = nx)
    val geom = SyntheticData.geometry(spark, ny, nx).cache()

    val sst = timed(s"generate ${nYears}y daily $ny×$nx") {
      val df = SyntheticData.sstGridded(spark, nDays = 365 * nYears, ny = ny, nx = nx,
        noiseAmp = 2.0).localCheckpoint()
      println(s"[scale] rows = ${df.count()}")
      df
    }

    // Exact (pixel-kernel) vs histogram-approximate hobday, selectable via
    // args(1). Head-to-head at this 40y×20×40 shape (local[32], end of
    // round 3): exact 31.5 s / 5.01% flagged vs approximate 39.3 s / 5.76%.
    // The bin-first pooled-histogram rework (one partial-agg shuffle to
    // (pixel, doy, bin) counts, then the 11× doy window pooled on the
    // bounded aggregate) cut the approx path 5.5× (215 s round 1); the
    // exact pixel-kernel still wins at this modest pixel count, and coarse
    // 0.05-unit bins over-flag — the histogram path pays off when
    // per-group sample counts dwarf the bin count (century archives,
    // std-normalised units).
    val method = if (args.length > 1) args(1) else "exact"
    val (anom, thr, extremes) = timed(s"detect (fixed+hobday $method)") {
      val r = Detect.preprocess(sst, DetectConfig(
        methodAnomaly = "fixed_baseline", methodExtreme = "hobday_extreme",
        thresholdPercentile = 95, methodPercentile = method,
        precision = 0.05, maxAnomaly = 25.0))
      (r._1, r._2, r._3.localCheckpoint())
    }
    timed("extreme fraction") {
      val frac = extremes.agg(avg(col("extreme").cast("double"))).head().getDouble(0)
      println(f"[scale] flagged fraction = $frac%.4f (thr rows=${thr.count()})")
    }

    val flags = extremes.filter(col("extreme")).select("time", "y", "x").localCheckpoint()
    val res = timed("track (non-merging, R=2, T=2)") {
      val r = Track.track(flags, geom, spec, TrackConfig(
        rFill = 2, tFill = 2, areaFilterQuartile = 0.5,
        overlapThreshold = 0.25, allowMerging = false))
      r.idField.count()
      r
    }
    timed("stats") {
      println(s"[scale] ${res.stats}")
    }
    spark.stop()
  }
}
