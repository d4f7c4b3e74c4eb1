package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** `df.write.format("hdf5table")` — SQL symmetry for the compound-table
  * format: the write wraps [[NetCDF4Source.writeCompoundTable]] and the
  * store reads back through the same `format("hdf5table")` scan, including
  * nested STRUCT columns (nested compound members) and i64 exactness. */
class Hdf5TableWriteSpec extends SparkSpec {
  import spark.implicits._

  private def tmpFile(): String = {
    val f = java.io.File.createTempFile("graft_h5w", ".h5")
    f.delete()
    f.getAbsolutePath
  }

  test("flat table round-trips: doubles, longs, strings") {
    val path = tmpFile()
    val in = Seq(
      ("alpha", 1L, 1.5), ("beta", -7L, 2.25), ("gamma", 1L << 40, -0.5))
      .toDF("name", "id", "score")
    in.write.format("hdf5table").option("var", "stats")
      .mode("overwrite").save(path)
    val back = spark.read.format("hdf5table").option("var", "stats").load(path)
    assert(back.schema.fieldNames.toSeq == Seq("name", "id", "score"))
    // numerics read back as DOUBLE (the read-side mapping); i64 is exact
    // in-file and exact through double below 2^53
    assert(back.count() == 3)
    assert(back.filter(col("name") === "gamma")
      .head.getDouble(1) == (1L << 40).toDouble)
    assert(back.filter(col("name") === "beta").head.getDouble(2) == 2.25)
  }

  test("nested STRUCT columns write as nested compounds and read back as STRUCTs") {
    val path = tmpFile()
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("geo", StructType(Seq(
        StructField("lat", DoubleType),
        StructField("lon", DoubleType),
        StructField("label", StringType)))),
      StructField("note", StringType)))
    val rows = Seq(
      Row(1L, Row(54.5, 11.25, "north"), "a"),
      Row(2L, Row(-3.75, 170.0, "pacific"), "bb"))
    val in = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    in.write.format("hdf5table").option("var", "obs")
      .mode("overwrite").save(path)
    val back = spark.read.format("hdf5table").option("var", "obs").load(path)
    assert(back.schema("geo").dataType.isInstanceOf[StructType])
    val r = back.filter(col("id") === 2.0).select("geo.lat", "geo.lon", "geo.label", "note")
      .head
    assert(r.getDouble(0) == -3.75 && r.getDouble(1) == 170.0)
    assert(r.getString(2) == "pacific" && r.getString(3) == "bb")
  }

  test("append onto a CONTIGUOUS file fails by name; overwrite replaces") {
    val path = tmpFile()
    val in = Seq(("x", 1.0)).toDF("k", "v")
    // no chunkRows → contiguous layout: only CHUNKED tables can grow
    // (Hdf5AppendSpec covers the chunked append=True path)
    in.write.format("hdf5table").option("var", "t").mode("append").save(path)
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val e = intercept[Exception](
      in.write.format("hdf5table").option("var", "t").mode("append").save(path))
    assert(msgs(e).exists(m => m.contains("CHUNKED") || m.contains("chunkRows")))
    Seq(("y", 2.0)).toDF("k", "v").write.format("hdf5table").option("var", "t")
      .mode("overwrite").save(path)
    val back = spark.read.format("hdf5table").option("var", "t").load(path)
    assert(back.count() == 1 && back.head.getString(0) == "y")
  }

  test("chunkRows + stringSizes options thread through; chunked file scans back") {
    val path = tmpFile()
    val in = (0 until 100).map(i => (s"name_$i", i * 1.5)).toDF("name", "v")
    in.write.format("hdf5table").option("var", "t")
      .option("chunkRows", "16").option("stringSizes", "name:32")
      .mode("overwrite").save(path)
    val back = spark.read.format("hdf5table").option("var", "t").load(path)
    assert(back.count() == 100)
    assert(back.filter(col("name") === "name_63").head.getDouble(1) == 63 * 1.5)
    // fixed size honored: a longer string than data requires would truncate,
    // so assert via the declared type size through a too-small size error
    val eSize = intercept[Exception](
      in.write.format("hdf5table").option("var", "t")
        .option("stringSizes", "name:3").mode("overwrite").save(path))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(eSize).exists(_.contains("exceeds fixed size")))
  }
}
