package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Histogram-approximate grouped quantile, the marEx thresholding primitive.
  *
  * Re-expresses the reference's fixed-bin histogram quantile
  * (`marEx/detect.py:2737–2865`: asymmetric bins — one catch-all bin below
  * `lo`, then `nBins` uniform bins of `width` — per-group counts, CDF, and
  * linear interpolation between bin centers) as a fully relational Spark
  * plan: a single shuffle to `groupBy(group..., bin)`, then per-group window
  * cumsum and closed-form interpolation expressions. No UDAF and no driver
  * collection, so it scales to any number of groups; the per-group state is
  * `nBins` rows, independent of input size, and partial aggregation
  * (map-side combine) collapses the input before the shuffle.
  *
  * Algorithm (deterministic, pure arithmetic — bit-identical across engines,
  * which the DuckDB-oracle gate relies on):
  *   bin(v)    = 0 if v < lo else min(floor((v-lo)/width)+1, nBins)
  *   center(b) = lo + (b-0.5)*width for b >= 1; center(0) = lo
  *   b*        = first bin (ascending) whose cdf >= q, cdf = cum_count/total
  *   result    = c_prev + (q - cdf_prev)/(cdf* - cdf_prev) * (center(b*) - c_prev)
  * where (cdf_prev, c_prev) come from the previous *present* bin, or (0, lo)
  * when b* is the first present bin. If b* = 0 the result is `lo` (all mass
  * below range), mirroring the reference's clamp (detect.py:2839–2864).
  */
object HistogramQuantile {

  def binCol(value: Column, lo: Double, width: Double, nBins: Int): Column =
    when(value < lo, lit(0))
      .otherwise(least(floor((value - lo) / width).cast("int") + 1, lit(nBins)))

  /** Per-group approximate quantile.
    *
    * @param df        input
    * @param groupCols grouping key columns
    * @param valueCol  numeric column to take the quantile of
    * @param q         quantile in (0,1)
    * @param lo        lower edge of the uniform bin range
    * @param width     bin width
    * @param nBins     number of uniform bins (values above lo+nBins*width clamp
    *                  into the last bin)
    * @param out       name of the output quantile column
    */
  def quantile(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      q: Double,
      lo: Double,
      width: Double,
      nBins: Int,
      out: String = "approx_quantile"): DataFrame = {
    val binned = df
      .withColumn("bin", binCol(col(valueCol), lo, width, nBins))
      .groupBy(groupCols.map(col) :+ col("bin"): _*)
      .agg(count(lit(1)).as("cnt"))
    quantileFromCounts(binned, groupCols, q, lo, width, out)
  }

  /** Quantile from pre-aggregated per-(group, bin) counts in columns
    * `bin`/`cnt`. Entry point for callers that pool histograms (sum counts
    * across windows or neighborhoods) before interpolating — pooling
    * aggregated counts instead of fanned-out raw rows is the histogram
    * method's whole scale advantage (detect.py:2494–2500 pools per-chunk
    * histograms the same way). */
  def quantileFromCounts(
      binned: DataFrame,
      groupCols: Seq[String],
      q: Double,
      lo: Double,
      width: Double,
      out: String = "approx_quantile"): DataFrame = {
    val gc = groupCols.map(col)
    val wOrd = Window.partitionBy(gc: _*).orderBy(col("bin"))
    val wAll = Window.partitionBy(gc: _*)
    val withCdf = binned
      .withColumn("cum", sum("cnt").over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum("cnt").over(wAll))
      .withColumn("cdf", col("cum").cast("double") / col("tot").cast("double"))
      .withColumn("prev_cdf", lag(col("cdf"), 1).over(wOrd))
      .withColumn("prev_bin", lag(col("bin"), 1).over(wOrd))

    def center(b: Column): Column =
      when(b >= 1, lit(lo) + (b.cast("double") - lit(0.5)) * lit(width)).otherwise(lit(lo))

    val target = withCdf
      .filter(col("cdf") >= q && (col("prev_cdf").isNull || col("prev_cdf") < q))
      .withColumn("cdf_prev", coalesce(col("prev_cdf"), lit(0.0)))
      .withColumn("c_prev", when(col("prev_bin").isNull, lit(lo)).otherwise(center(col("prev_bin"))))
      .withColumn(out,
        when(col("bin") === 0, lit(lo)).otherwise(
          col("c_prev") +
            (lit(q) - col("cdf_prev")) / (col("cdf") - col("cdf_prev")) *
            (center(col("bin")) - col("c_prev"))))

    target.select(gc :+ col(out): _*)
  }
}
