package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{MarexQueries, PipelineQueries, QueryDef, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries live in typed registries under `graft.queries`; this object
  * just flattens them into the driver's Map-based contract.
  */
object SparkEntry {

  private def registries: Seq[graft.queries.QueryRegistry] = Seq(
    RelationalQueries, PipelineQueries, MarexQueries)

  private lazy val allDefs: Seq[QueryDef] = registries.flatMap(_.all)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_join5")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
