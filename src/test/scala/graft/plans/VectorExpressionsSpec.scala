package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native DotProduct must be BIT-equal to the higher-order-function
  * fold it replaced — the oracle-gated similarity/dedup queries hash
  * against DuckDB on exactly that arithmetic. */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("bit-equal to the HOF fold on random float arrays") {
    val rnd = new scala.util.Random(41)
    val rows = (1 to 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2f - 1f),
        Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.select(
        DotProduct.dotProduct(col("a"), col("b")).as("native"),
        hofDot(col("a"), col("b")).as("hof"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"native ${r.getDouble(0)} != hof ${r.getDouble(1)}")
    }
  }

  test("float x double-literal planes match the HOF form too") {
    val rnd = new scala.util.Random(43)
    val plane = typedlit(Seq.fill(16)(if (rnd.nextBoolean()) 1.0 else -1.0))
    val df = (1 to 50).map(i => (i.toLong, Array.fill(16)(rnd.nextFloat())))
      .toDF("id", "a")
    val out = df.select(
      DotProduct.dotProduct(col("a"), plane).as("native"),
      hofDot(col("a"), plane).as("hof")).collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("null semantics mirror zip_with padding: mismatch or null gives null") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f), Array(3.0f)), // length mismatch
      (2L, Array(1.0f, 2.0f), Array(3.0f, 4.0f))
    ).toDF("id", "a", "b")
    val out = df.orderBy("id")
      .select(DotProduct.dotProduct(col("a"), col("b"))).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0) == 11.0)
    val nullArr = df.filter(col("id") === 1)
      .select(DotProduct.dotProduct(lit(null).cast("array<float>"), col("b")))
      .collect().head
    assert(nullArr.isNullAt(0))
  }

  test("stays inside whole-stage codegen") {
    // row-dependent inputs so neither ConvertToLocalRelation nor constant
    // folding can pre-evaluate the expression
    val df = spark.range(10)
      .select(DotProduct.dotProduct(
        array(col("id").cast("float"), lit(2.0f)),
        array(lit(3.0f), col("id").cast("float"))).as("d"), col("id"))
    val codegenned = df.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(codegenned, s"no codegen span in:\n${df.queryExecution.executedPlan}")
    val got = df.collect().map(r => r.getLong(1) -> r.getDouble(0)).toMap
    assert(got(4L) == 4.0 * 3.0 + 2.0 * 4.0)
  }
}
