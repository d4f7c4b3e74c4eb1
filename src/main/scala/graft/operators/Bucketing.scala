package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-layout utilities — the §7.2(c) optimization: tables that join or
  * aggregate repeatedly on the same key (the marEx pixel key (y, x); a
  * fact/dim pair's join key) are written `bucketBy` that key so Catalyst
  * elides the exchange on every subsequent join/groupBy.
  *
  * At 100 TB this is the difference between shuffling the field once per
  * *query* and once per *ingest*: climatology, threshold compare, and
  * anomaly subtraction all key on (y, x[, doy]) — with the field bucketed on
  * (y, x), each is a zero-exchange stage.
  *
  * Note bucketed tables go through the session catalog (`saveAsTable`), not
  * plain parquet paths — bucket metadata lives in the catalog.
  */
object Bucketing {

  /** Write `df` bucketed by `keys` as a managed table. */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int, keys: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** True iff the physical plan of `df` contains a shuffle exchange. */
  def hasExchange(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange")

  /** Co-bucketed equi-join: both sides read from bucketed tables on the join
    * key — Catalyst plans a SortMergeJoin with no Exchange on either side. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)
}
