package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.operators.HistogramQuantile

class HistogramQuantileAggSpec extends SparkSpec {
  import spark.implicits._

  test("single-pass aggregate equals the relational operator exactly") {
    val part = Tables.load(spark, "/root/testdata/sf0.01", "part")
    val viaAgg = part.groupBy("p_brand")
      .agg(HistogramQuantileAgg.histogramQuantile(
        col("p_retailprice"), 0.95, 0.0, 25.0, 200).as("s"))
    val viaRel = HistogramQuantile.quantile(
      part, Seq("p_brand"), "p_retailprice", 0.95, 0.0, 25.0, 200, out = "r")
    val bad = viaAgg.join(viaRel, "p_brand")
      .filter(col("s") =!= col("r")).count()
    assert(bad == 0, "sketch aggregate diverges from relational histogram quantile")
  }

  test("partial aggregation across many partitions merges buffers correctly") {
    val df = spark.range(0, 10000).repartition(16)
      .select(lit("g").as("g"), (col("id") % 1000).cast("double").as("v"))
    val r = df.groupBy("g")
      .agg(HistogramQuantileAgg.histogramQuantile(col("v"), 0.5, 0.0, 10.0, 100).as("med"))
      .head().getDouble(1)
    assert(r > 400 && r < 600, s"median of 0..999 ≈ 500, got $r")
  }

  test("empty group below range clamps; no rows yields null") {
    val below = Seq(("g", -3.0), ("g", -1.0)).toDF("g", "v")
    val r = below.groupBy("g")
      .agg(HistogramQuantileAgg.histogramQuantile(col("v"), 0.9, 0.0, 1.0, 10).as("q"))
      .head().getDouble(1)
    assert(r == 0.0)
    val empty = Seq(("g", Double.NaN)).toDF("g", "v")
    val rn = empty.groupBy("g")
      .agg(HistogramQuantileAgg.histogramQuantile(col("v"), 0.9, 0.0, 1.0, 10).as("q"))
      .head()
    assert(rn.isNullAt(1))
  }
}
