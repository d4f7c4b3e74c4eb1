package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests in the spirit of the reference's wrapped-distance checks
  * (tests/test_track_helpers.py:370–401): symmetry, identity, triangle
  * inequality — plus SQL registration through SparkSessionExtensions. */
class HaversineSpec extends AnyFunSuite {

  // Own session: needs withExtensions, so not the shared SparkSpec builder.
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .withExtensions(new GraftExtensions)
    .getOrCreate()

  test("known distance: London to Paris ≈ 344 km") {
    val d = HaversineKernel.compute(51.5074, -0.1278, 48.8566, 2.3522)
    assert(math.abs(d - 344) < 2, s"got $d")
  }

  test("identity, symmetry, triangle inequality (property sweep)") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 200) {
      val (a1, o1) = (rnd.nextDouble * 180 - 90, rnd.nextDouble * 360 - 180)
      val (a2, o2) = (rnd.nextDouble * 180 - 90, rnd.nextDouble * 360 - 180)
      val (a3, o3) = (rnd.nextDouble * 180 - 90, rnd.nextDouble * 360 - 180)
      assert(HaversineKernel.compute(a1, o1, a1, o1) == 0.0)
      val dab = HaversineKernel.compute(a1, o1, a2, o2)
      val dba = HaversineKernel.compute(a2, o2, a1, o1)
      assert(math.abs(dab - dba) < 1e-9)
      val dac = HaversineKernel.compute(a1, o1, a3, o3)
      val dcb = HaversineKernel.compute(a3, o3, a2, o2)
      assert(dab <= dac + dcb + 1e-6, s"triangle violated: $dab > $dac + $dcb")
    }
  }

  test("expression evaluates under codegen and matches the kernel") {
    import spark.implicits._
    val df = Seq((51.5074, -0.1278, 48.8566, 2.3522), (0.0, 0.0, 0.0, 90.0))
      .toDF("la1", "lo1", "la2", "lo2")
    val got = df.select(HaversineKm.haversineKm(col("la1"), col("lo1"), col("la2"), col("lo2")))
      .collect().map(_.getDouble(0))
    assert(got(0) == HaversineKernel.compute(51.5074, -0.1278, 48.8566, 2.3522))
    assert(math.abs(got(1) - math.Pi / 2 * 6371.0) < 1.0)
  }

  test("SQL function registered via extensions; casts int args") {
    // getOrCreate may return a shared session from another suite (without
    // extensions applied) — exercise the extensions builder explicitly and
    // register through the same code path on the live session.
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(exts) // must not throw
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "haversine_km", GraftExtensions.haversineBuilder, "scala_udf")
    val r = spark.sql("SELECT haversine_km(0, 0, 0, 180) AS d").head().getDouble(0)
    assert(math.abs(r - math.Pi * 6371.0) < 1.0)
  }

  test("hist_quantile SQL aggregate matches the Column-API UDAF") {
    import spark.implicits._
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hist_quantile", GraftExtensions.histQuantileBuilder, "scala_udf")
    val rnd = new scala.util.Random(23)
    val df = (1 to 2000).map(_ => (rnd.nextInt(4), rnd.nextDouble() * 20.0))
      .toDF("k", "v")
    df.createOrReplaceTempView("hq_t")
    val viaSql = spark.sql(
      "SELECT k, hist_quantile(v, 0.9, 0.0, 0.1, 200) AS q FROM hq_t GROUP BY k")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val viaCol = df.groupBy("k")
      .agg(HistogramQuantileAgg.histogramQuantile(col("v"), 0.9, 0.0, 0.1, 200).as("q"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(viaSql == viaCol, s"$viaSql != $viaCol")
    // non-literal sketch parameter must be rejected at analysis, not runtime
    val err = intercept[Exception] {
      spark.sql("SELECT hist_quantile(v, v, 0.0, 0.1, 200) FROM hq_t").collect()
    }
    assert(err.getMessage.contains("literal") || err.getMessage.contains("foldable"))
  }

  test("null input yields null") {
    import spark.implicits._
    val df = Seq((Some(1.0), None: Option[Double])).toDF("a", "b")
    val r = df.select(HaversineKm.haversineKm(col("a"), col("b"), col("a"), col("a")))
      .collect().head
    assert(r.isNullAt(0))
  }
}
