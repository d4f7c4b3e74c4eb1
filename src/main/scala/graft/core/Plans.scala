package graft.core

import org.apache.spark.sql.DataFrame

/** Plan-hygiene helpers for iterative algorithms. */
object Plans {

  /** localCheckpoint + STATS RESET — required in iterative loops, instead
    * of a plain `localCheckpoint`.
    *
    * Spark's (local)checkpoint propagates the origin plan's estimated
    * `Statistics` into the new `LogicalRDD` leaf (to aid AQE). In a loop
    * whose round-k plan joins the round-(k−1) checkpoint with itself, the
    * size-only estimator then compounds: joins MULTIPLY child sizeInBytes
    * and aggregates only rescale it, so the inherited estimate grows like
    * S^(p^k) — its digit count is exponential in the round number. By
    * round ~6 of the batch split/merge at 720×1440×730 the driver ground
    * single-core for 20+ minutes multiplying million-digit BigIntegers
    * (jstack: BigInteger.multiplyToomCook3 under
    * SizeInBytesOnlyStatsPlanVisitor.visitJoin, inside AQE reOptimize).
    *
    * Re-wrapping the checkpointed RDD as a fresh DataFrame drops the
    * inherited estimate (the fresh leaf reports the session default), so
    * every round's estimation is O(plan size). Join strategy is unaffected
    * where it matters: the small sides we broadcast (geometry, per-object
    * tables) carry their own real stats. The Row round-trip is
    * executor-side and linear in the data. */
  def iterCheckpoint(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }
}
