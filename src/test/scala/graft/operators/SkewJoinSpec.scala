package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // 1 hot key with 50k rows + 100 cold keys
  private lazy val skewed = spark.range(0, 50000).select(lit(7L).as("k"), col("id").as("v"))
    .union(spark.range(0, 1000).select((col("id") % 100 + 100).as("k"), col("id").as("v")))
  private lazy val dim = (0L until 300L).map(k => (k, s"name_$k")).toDF("k", "name")

  test("salted join returns exactly the plain join's rows") {
    val plain = skewed.join(dim, Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
    val salted = SkewJoin.saltedJoin(skewed, dim, Seq("k"), salts = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
    val diff = plain.join(salted.withColumnRenamed("n", "n2").withColumnRenamed("s", "s2"), "k")
      .filter(col("n") =!= col("n2") || col("s") =!= col("s2")).count()
    assert(diff == 0)
    assert(salted.count() == plain.count())
  }

  test("hot key is spread across all salts") {
    val rowHash = xxhash64(skewed.columns.map(col).toSeq: _*)
    val spread = skewed.filter(col("k") === 7)
      .withColumn("salt", pmod(rowHash, lit(8L)))
      .select("salt").distinct().count()
    assert(spread == 8, s"hot key only landed on $spread of 8 salts")
  }

  test("salted aggregation matches direct aggregation") {
    val direct = skewed.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
    val salted = SkewJoin.saltedAggregate(skewed, Seq("k"), 8,
      partial = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
      merge = Seq(sum("ps").as("s"), sum("pn").as("n")))
    val diff = direct.join(
      salted.withColumnRenamed("s", "s2").withColumnRenamed("n", "n2"), "k")
      .filter(col("s") =!= col("s2") || col("n") =!= col("n2")).count()
    assert(diff == 0)
  }
}
