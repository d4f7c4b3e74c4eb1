package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deliberate pre-salting for skewed keys (SURVEY §0 scale checklist).
  *
  * AQE's skew-join handles sort-merge join skew at runtime, but two cases
  * still need explicit salting at 100 TB: (a) a replicated-dimension join
  * where one hot key dominates a partition even after AQE splitting, and
  * (b) skewed aggregation state (e.g. collect_list/distinct per hot key).
  *
  * [[saltedJoin]] spreads the big side's hot keys over `salts` synthetic
  * sub-keys and replicates the small side once per salt — the shuffle key
  * becomes (key, salt), so a hot key's rows land on `salts` partitions
  * instead of one. Salt assignment hashes the full row (deterministic, no
  * rand()), so replays and retries stay consistent.
  */
object SkewJoin {

  /** Equi-join `large ⋈ small` on `keys`, with the large side salted.
    * `small` is replicated `salts`× — keep it dimension-sized.
    *
    * Restricted to join types where an unmatched SMALL-side row produces no
    * output: under right/full_outer the `salts`-fold replication would emit
    * one null-padded row per salt for every unmatched small row. */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    require(Set("inner", "left", "leftouter", "left_outer", "leftsemi",
      "left_semi", "leftanti", "left_anti", "cross")
      .contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin does not support joinType='$joinType': replicated small-side " +
        "rows that match nothing would appear once per salt under right/full joins")
    val rowHash: Column = xxhash64(large.columns.map(col).toSeq: _*)
    val saltedLarge = large.withColumn("__salt", pmod(rowHash, lit(salts.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase salted aggregation for algebraic aggregates over skewed keys:
    * partial per (key, salt), then final per key. `partial` and `merge`
    * build the two layers (e.g. partial = sum(x) as s, merge = sum(s)). */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salts: Int,
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val rowHash: Column = xxhash64(df.columns.map(col).toSeq: _*)
    df.withColumn("__salt", pmod(rowHash, lit(salts.toLong)).cast("int"))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }
}
