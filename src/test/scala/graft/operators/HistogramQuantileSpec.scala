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
}
