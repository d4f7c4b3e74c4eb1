package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical access to the driver-generated test tables.
  *
  * All engine code loads inputs through here so schema quirks are fixed in
  * exactly one place. The only quirk today: `events.ts` is written as parquet
  * INT64 TIMESTAMP(NANOS) which Spark cannot read natively; with
  * `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as a long of epoch
  * nanoseconds, which we floor-divide to microseconds — the same truncation
  * DuckDB applies when it reads TIMESTAMP_NS parquet into its µs TIMESTAMP,
  * so Spark results and the DuckDB oracle see identical instants.
  *
  * At 100 TB scale this loader is where partition discovery / bucketing
  * metadata would attach; the tables here are plain single parquet files, so
  * Spark's own file-source splitting (maxPartitionBytes) governs parallelism.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session settings every entry point must apply. */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }

  /** Schema-inference cache: `spark.read.parquet(path)` runs a one-task
    * footer-read JOB per call, and the bench/verify drivers load the same
    * handful of files hundreds of times — that is a driver round-trip per
    * table per query for metadata that never changes within a run. Caching
    * the inferred StructType per path (the role a catalog/metastore plays)
    * lets every subsequent load plan with `.schema(...)` and zero jobs.
    * Only schemas are cached — never data or results. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    configure(spark)
    val path = s"$sfDir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    val df = spark.read.schema(schema).parquet(path)
    name match {
      case "events" =>
        // Two generations of the driver data exist: INT64 TIMESTAMP(NANOS)
        // (arrives as a long under nanosAsLong — floor-divide in *integer*
        // space, ns values exceed 2^53) and native TIMESTAMP(MICROS)
        // (arrives as TIMESTAMP_NTZ — instant-preserving cast under the UTC
        // session zone). Both normalize to the same µs TIMESTAMP column, the
        // type every query and the DuckDB oracle were built against.
        df.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
          case org.apache.spark.sql.types.TimestampType => df
          case _ =>
            df.withColumn("ts",
              col("ts").cast(org.apache.spark.sql.types.TimestampType))
        }
      case _ => df
    }
  }
}
