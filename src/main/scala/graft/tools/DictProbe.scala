package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for VERDICT r11 item 7: dictionary-encode jaccard shingles to
  * dense ints before the pair self-join, to cut shuffle bytes.
  *
  * Locally the self-join BROADCASTS one side (the checkpoint's inherited
  * stats are small), so there is no shingle exchange to shrink — the probe
  * therefore also runs with autoBroadcastJoinThreshold = -1 to force the
  * sort-merge plan the join takes at archive scale, and reports shuffle
  * bytes + wall + CPU for both variants from a SparkListener.
  *
  * Usage: scripts/run.sh graft.tools.DictProbe [sfDir] [reps]
  */
object DictProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shufW = new java.util.concurrent.atomic.AtomicLong
    val cpuMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        shufW.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        cpuMs.addAndGet(s.stageInfo.taskMetrics.executorCpuTime / 1000000L)
      }
    })

    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val t = 0.3

    // variant A: the shipped direct path (strings as join keys)
    def direct(sh: DataFrame): DataFrame = {
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val a = sh.select(col("doc_id").as("doc_a"), col("shingle"))
      val b = sh.select(col("doc_id").as("doc_b"), col("shingle"))
      val common = a.join(b, Seq("shingle"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
      common
        .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
        .withColumn("jaccard", col("common").cast("double") /
          (col("na") + col("nb") - col("common")).cast("double"))
        .filter(col("jaccard") >= t)
    }

    // variant B: encode shingles to dense longs first, self-join on the int
    def dictEncoded(sh: DataFrame): DataFrame = {
      val dict = sh.select("shingle").distinct()
        .withColumn("sid", xxhash64(col("shingle"))) // dense enough: unique-by-probe
      val enc = sh.join(dict, "shingle").select(col("doc_id"), col("sid"))
        .localCheckpoint()
      val sizes = enc.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val a = enc.select(col("doc_id").as("doc_a"), col("sid"))
      val b = enc.select(col("doc_id").as("doc_b"), col("sid"))
      val common = a.join(b, Seq("sid"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
      common
        .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
        .withColumn("jaccard", col("common").cast("double") /
          (col("na") + col("nb") - col("common")).cast("double"))
        .filter(col("jaccard") >= t)
    }

    def run(label: String, broadcastOff: Boolean, mk: DataFrame => DataFrame): Unit = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        if (broadcastOff) "-1" else "10485760")
      (1 to reps).foreach { i =>
        val sh = graft.operators.Dedup
          .shingles(docs, 3).localCheckpoint()
        shufW.set(0); cpuMs.set(0)
        val t0 = System.nanoTime()
        val n = mk(sh).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[dictprobe] $label rep$i rows=$n%d wall=$dt%.3f s " +
          f"cpu=${cpuMs.get / 1000.0}%.2f s shufW=${shufW.get / 1024}%d KB")
        System.gc()
      }
    }

    run("direct/bcast-on ", broadcastOff = false, direct)
    run("dict  /bcast-on ", broadcastOff = false, dictEncoded)
    run("direct/bcast-OFF", broadcastOff = true, direct)
    run("dict  /bcast-OFF", broadcastOff = true, dictEncoded)
    spark.stop()
  }
}
