package graft.queries

import graft.SparkSpec

/** Physical-plan shape assertions: the scale properties we rely on must be
  * visible in the optimized plan, not just hoped for — filter pushdown into
  * the parquet scan, column pruning, broadcast dimension joins, and partial
  * (map-side) aggregation. A regression that silently turns a broadcast
  * join into a shuffle join or widens a scan fails here. */
class PlanShapeSpec extends SparkSpec {

  private def planOf(name: String): String = {
    val df = RelationalQueries.queries(name)(spark, "/root/testdata/sf0.01")
    df.queryExecution.executedPlan.toString
  }

  test("q05: dims broadcast, date filter pushed, lineitem scan pruned") {
    val p = planOf("q05_join5")
    assert(p.contains("BroadcastHashJoin"), "dimension joins must broadcast")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual")
      || p.contains("GreaterThanOrEqual(o_orderdate"), "date filter must reach the scan")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>"),
      "lineitem scan must read only the 3 needed columns")
  }

  test("q09: two-phase hash aggregation with pushed filter") {
    val p = planOf("q09_agg_q1")
    assert("HashAggregate".r.findAllIn(p).length >= 2, "partial+final aggregation expected")
    assert(p.contains("LessThanOrEqual(l_shipdate"), "shipdate filter must reach the scan")
  }

  test("q19: top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = planOf("q19_topk")
    assert(p.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject, plan:\n${p.take(500)}")
  }

  test("q03: projection prunes the scan to 5 of 16 lineitem columns") {
    val p = planOf("q03_project_cast")
    // ReadSchema is truncated in plan strings; assert on the scan's column list
    val pruned = ("FileScan parquet \\[l_orderkey#\\d+L,l_linenumber#\\d+,l_quantity#\\d+," +
      "l_extendedprice#\\d+,l_discount#\\d+\\]").r
    assert(pruned.findFirstIn(p).isDefined, "scan must be pruned to the 5 used columns")
  }
}
