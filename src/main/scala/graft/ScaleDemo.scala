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
    // Shuffle partitions scale with the FIELD, not the core count: at the
    // production shape (720×1440 × 730 days ≈ 757 M samples) 32 partitions
    // puts ~24 M rows in one sort task and starves execution memory; target
    // ≈4 M samples per shuffle partition like a real cluster deployment
    // (overridable via SPARK_GRAFT_SHUFFLE).
    val dimsNy = if (args.length > 2) args(2).toLong else 20L
    val dimsNx = if (args.length > 3) args(3).toLong else 40L
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
      math.max(cpus.toInt,
        (dimsNy * dimsNx * 365L * nYears / 4000000L).toInt).toString)
    // At production grids the per-pixel dimension tables (climatology /
    // threshold: |pixels|×366 rows ≈ 380 M at 0.25°) are NOT broadcastable
    // — a mis-estimated build side would collect GBs to the driver. Real
    // cluster deployments disable auto-broadcast for these joins at large
    // grid sizes; the CI-fixture shape keeps the default (broadcasting the
    // 293 k-row threshold table there is the right plan).
    val bigGrid = dimsNy * dimsNx > 1000000L
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val builder =
      if (bigGrid)
        builder0
          .config("spark.sql.autoBroadcastJoinThreshold", "-1")
          .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
          // full-field shuffles at this shape are tens of GB on disk; zstd
          // compresses the noisy-double payload ~2× better than lz4, and a
          // 60 s periodic GC releases dereferenced shuffle files promptly —
          // both standard knobs for disk-constrained shuffle service nodes
          .config("spark.io.compression.codec", "zstd")
          .config("spark.cleaner.periodicGC.interval", "60s")
      else builder0
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }

    val ny = dimsNy.toInt
    val nx = dimsNx.toInt
    val spec = GridSpec(ny = ny, nx = nx)
    val geom = SyntheticData.geometry(spark, ny, nx).cache()
    val method = if (args.length > 1) args(1) else "exact"

    // ── trackonly: the production-shape TRACKING workload ──────────────────
    // Detect and track are separate cluster jobs at scale; a single box
    // lacks the aggregate scratch disk for the 2-year detect→track handoff
    // (measured: detect alone peaks ≈76 GB of shuffle+checkpoint). This
    // mode feeds the full merging tracker a realistic ~4–5 %-coverage storm
    // field at the same grid, so the track wall is measured at the true
    // shape with real merge/split events.
    if (method == "trackonly") {
      val flags = timed(s"storm flags ${nYears}y $ny×$nx") {
        val f = SyntheticData.stormFlags(spark, nDays = 365 * nYears, ny = ny, nx = nx)
          .localCheckpoint()
        val n = f.count()
        println(f"[scale] flag density = ${n.toDouble / (365L * nYears * ny * nx)}%.4f ($n rows)")
        f
      }
      val res = timed("track (merging, batch-parallel)") {
        val r = Track.track(flags, geom, spec, TrackConfig(
          rFill = 2, tFill = 2, areaFilterQuartile = 0.5,
          overlapThreshold = 0.25, allowMerging = true))
        r.idField.count()
        r
      }
      timed("stats") { println(s"[scale] ${res.stats}") }
      spark.stop()
      return
    }

    // Big grids skip the source checkpoint: the synthetic generator is
    // deterministic, and pinning a second field-sized copy (≈30 GB at 0.25°
    // × 2 y) next to the anomaly checkpoint exceeds a single box's disk —
    // the two consumers (climatology agg + join-back) regenerate instead,
    // exactly like re-reading a parquet/zarr source twice on a cluster.
    val sst = timed(s"generate ${nYears}y daily $ny×$nx") {
      val df0 = SyntheticData.sstGridded(spark, nDays = 365 * nYears, ny = ny, nx = nx,
        noiseAmp = 2.0)
      val df = if (bigGrid) df0 else df0.localCheckpoint()
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
    val (anom, thr, extremes) = timed(s"detect (fixed+hobday $method)") {
      val r = Detect.preprocess(sst, DetectConfig(
        methodAnomaly = "fixed_baseline", methodExtreme = "hobday_extreme",
        thresholdPercentile = 95, methodPercentile = method,
        precision = 0.05, maxAnomaly = 25.0))
      // big grids keep only the ~5% flag set, not the full boolean field —
      // the extremes frame is a join of two already-checkpointed inputs
      (r._1, r._2, if (bigGrid) r._3 else r._3.localCheckpoint())
    }

    val flags = timed("extreme flags") {
      val f = extremes.filter(col("extreme")).select("time", "y", "x").localCheckpoint()
      val n = f.count()
      println(f"[scale] flagged fraction = ${n.toDouble / (365L * nYears * ny * nx)}%.4f " +
        f"($n rows, thr rows=${thr.count()})")
      f
    }
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
