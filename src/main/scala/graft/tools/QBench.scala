package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query micro-bench: `runMain graft.tools.QBench <query> [reps] [sfDir]`.
  * Runs one registered query N times in a warm JVM and prints per-rep wall
  * times — for isolating a query's cost from full-registry GC/variance noise.
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
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
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => }
    val fn = graft.SparkEntry.queries(name)
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[qbench] $name%s rows=$n%d time=$dt%.3f s")
      dt
    }
    println(f"[qbench] $name min=${times.min}%.3f median=${times.sorted.apply(reps / 2)}%.3f")
    spark.stop()
  }
}
