package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Mirrors the reference's exact-vs-approx agreement test
  * (tests/test_detect_helpers.py:524–600): the histogram quantile must land
  * within one bin width of the exact quantile. */
class HistogramQuantileSpec extends SparkSpec {

  test("histogram quantile tracks exact quantile within bin resolution") {
    // sf0.01 gives ~80 samples/brand; with sparse groups the interpolation
    // anchor is the previous *present* bin, so the bound is a few widths,
    // mirroring the reference's precision-tied tolerance.
    val part = Tables.load(spark, "/root/testdata/sf0.01", "part")
    val width = 25.0
    val approx = HistogramQuantile.quantile(
      part, Seq("p_brand"), "p_retailprice", 0.95, 0.0, width, 200, out = "approx")
    val exact = part.groupBy("p_brand")
      .agg(expr("percentile(p_retailprice, 0.95)").as("exact"))
    val errs = approx.join(exact, "p_brand")
      .select(abs(col("approx") - col("exact")).as("err"))
      .collect().map(_.getDouble(0))
    assert(errs.nonEmpty)
    errs.foreach(e => assert(e <= 3 * width, s"approx quantile off by $e > ${3 * width}"))
  }

  test("quantile of uniform bin content interpolates inside the range") {
    import spark.implicits._
    val df = (1 to 1000).map(i => ("g", i.toDouble)).toDF("g", "v")
    val r = HistogramQuantile.quantile(df, Seq("g"), "v", 0.5, 0.0, 100.0, 20, out = "q")
      .collect().head.getAs[Double]("q")
    assert(r > 400 && r < 600, s"median of 1..1000 ≈ 500, got $r")
  }

  test("all mass below range clamps to lo") {
    import spark.implicits._
    val df = Seq(("g", -5.0), ("g", -3.0)).toDF("g", "v")
    val r = HistogramQuantile.quantile(df, Seq("g"), "v", 0.9, 0.0, 1.0, 10, out = "q")
      .collect().head.getAs[Double]("q")
    assert(r == 0.0)
  }

  test("aggregate CDF scan is bit-identical to the window-walk formulation") {
    // The r11 optimization replaced the Exchange+Sort+Window CDF walk with a
    // single-aggregate array scan; this pins the two formulations equal
    // bit-for-bit on randomized per-(group, bin) counts (seeded).
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11)
    val rows = for {
      g <- 0 until 40
      bin <- 0 to 60
      if rnd.nextDouble() < 0.4 // sparse: exercise absent bins / prev-present
    } yield (s"g$g", bin, (rnd.nextInt(50) + 1).toLong)
    import spark.implicits._
    val binned = rows.toDF("g", "bin", "cnt")
    val q = 0.9; val lo = 0.0; val width = 0.25
    val fast = HistogramQuantile.quantileFromCounts(binned, Seq("g"), q, lo, width, "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // reference: the pre-r11 window formulation, verbatim
    val wOrd = Window.partitionBy(col("g")).orderBy(col("bin"))
    val wAll = Window.partitionBy(col("g"))
    def center(b: org.apache.spark.sql.Column) =
      when(b >= 1, lit(lo) + (b.cast("double") - lit(0.5)) * lit(width)).otherwise(lit(lo))
    val slow = binned
      .withColumn("cum", sum("cnt").over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum("cnt").over(wAll))
      .withColumn("cdf", col("cum").cast("double") / col("tot").cast("double"))
      .withColumn("prev_cdf", lag(col("cdf"), 1).over(wOrd))
      .withColumn("prev_bin", lag(col("bin"), 1).over(wOrd))
      .filter(col("cdf") >= q && (col("prev_cdf").isNull || col("prev_cdf") < q))
      .withColumn("cdf_prev", coalesce(col("prev_cdf"), lit(0.0)))
      .withColumn("c_prev", when(col("prev_bin").isNull, lit(lo)).otherwise(center(col("prev_bin"))))
      .withColumn("v", when(col("bin") === 0, lit(lo)).otherwise(
        col("c_prev") + (lit(q) - col("cdf_prev")) / (col("cdf") - col("cdf_prev")) *
          (center(col("bin")) - col("c_prev"))))
      .select("g", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(fast.keySet == slow.keySet, s"group sets differ")
    fast.foreach { case (g, v) =>
      assert(java.lang.Double.doubleToLongBits(v) ==
        java.lang.Double.doubleToLongBits(slow(g)),
        s"group $g: scan=$v window=${slow(g)} not bit-identical")
    }
  }
}
