package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** The documented corrections-vs-streams contract (README "Corrections vs
  * streams"): region writes are INVISIBLE to the stream source (offset =
  * committed shape[0] — streams carry appends, exactly-once), and the
  * consumer picks corrections up with a windowed batch re-read whose
  * pushed range plans only the corrected window's chunks. */
class ZarrRegionStreamContractSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(p: String): String = {
    val d = java.nio.file.Files.createTempDirectory(p).toFile
    d.delete()
    d.getAbsolutePath
  }

  private def cells(nt: Int, tBase: Int = 0, bump: Double = 0.0) =
    (for (t <- 0 until nt; y <- 0 until 2; x <- 0 until 3)
      yield (t, y, x, (t + tBase) * 100.0 + y * 10.0 + x + bump))
      .toDF("time_idx", "y_idx", "x_idx", "sst")

  private def write(df: org.apache.spark.sql.DataFrame, dir: String, nt: Int,
      mode: String, extra: Map[String, String] = Map.empty): Unit = {
    var w = df.write.format("zarr")
      .option("dims", s"time:$nt,y:2,x:3").option("chunks", "2,2,3")
      .option("cols", "sst")
    extra.foreach { case (k, v) => w = w.option(k, v) }
    w.mode(mode).save(dir)
  }

  test("streams carry appends exactly-once; corrections need the windowed batch re-read") {
    val dir = tmpDir("graft_zrsc")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_zrsc_ck").toFile
    val out = java.nio.file.Files.createTempDirectory("graft_zrsc_out").toFile
    def runOnce(): Unit = {
      val q = spark.readStream.format("zarr").option("var", "sst").load(dir)
        .writeStream.outputMode("append").format("parquet")
        .option("path", out.getAbsolutePath)
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    write(cells(4), dir, 4, "append")
    runOnce()
    assert(spark.read.parquet(out.getAbsolutePath).count() == 4 * 6)

    // 1) a REGION correction of t=1..2 (doubled values) — the stream must
    //    NOT re-deliver (offset keys on shape[0], unchanged)
    write(cells(2, tBase = 1, bump = 100000.0), dir, 2, "append",
      Map("region" -> "1"))
    runOnce()
    assert(spark.read.parquet(out.getAbsolutePath).count() == 4 * 6,
      "a region write must be invisible to the stream — no re-delivery")

    // 2) the consumer's recipe: windowed batch re-read of ONLY the
    //    corrected slices, pushed range confined to the window
    val window = spark.read.format("zarr").load(dir)
      .filter(col("time_idx").between(1, 2))
    val plan = window.queryExecution.executedPlan.toString
    assert(plan.contains("time_idx in [1, 2]"),
      s"the corrected-window re-read must push its range: $plan")
    val corrected = window.collect()
    assert(corrected.length == 2 * 6)
    assert(corrected.forall(_.getDouble(3) > 100000.0),
      "the batch re-read must see the corrected values")

    // 3) appends AFTER the correction still stream exactly-once
    write(cells(2, tBase = 4), dir, 2, "append")
    runOnce()
    val all = spark.read.parquet(out.getAbsolutePath)
    assert(all.count() == 6 * 6, "post-correction appends stream once")
    assert(all.filter(col("t_idx") >= 4).count() == 2 * 6)
  }
}
