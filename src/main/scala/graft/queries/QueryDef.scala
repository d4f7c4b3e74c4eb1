package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: a Spark implementation plus (when SQL-expressible) an
  * ANSI-SQL oracle the driver runs in DuckDB over the same parquet tables.
  * Column names and types must match between the two — the correctness gate
  * sorts columns by name and hash-compares values. Conventions used across
  * the registry to make the hash compare bit-faithful:
  *   - integer-valued outputs are cast to BIGINT on both sides;
  *   - computed doubles are `round(x, k)` on both sides (absorbs the
  *     last-ulp nondeterminism of distributed summation order);
  *   - event timestamps are µs-truncated identically (see graft.core.Tables).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

trait QueryRegistry {
  def all: Seq[QueryDef]
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap
  final def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
