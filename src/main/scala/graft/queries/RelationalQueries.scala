package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{ConnectedComponents, HistogramQuantile}

/** The declared relational inventory (SURVEY.md §2.4, Q01–Q28): every
  * relational capability the reference exercises in xarray/Dask disguise,
  * restated as a Spark DataFrame program with a DuckDB-checkable oracle.
  *
  * Scale notes are attached per query; the common themes:
  *  - dimension tables (region/nation/customer/supplier/part) are broadcast —
  *    at 100 TB the fact tables shuffle at most once, on their natural key;
  *  - aggregations are declared so partial (map-side) aggregation applies;
  *  - window functions partition on high-cardinality keys (customer, pixel),
  *    never on a global ordering, except where the post-aggregation row count
  *    is already tiny (daily counts, day-of-year climatology).
  */
object RelationalQueries extends QueryRegistry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // Revenue expression used throughout (TPC-H style).
  private val revenue: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** Exact money summation: sums `round(c·10^scale)` as BIGINT and divides
    * once at the end. Distributed double summation is order-dependent in its
    * last ulps and `round(sum, 2)` sits on a half-boundary whenever the true
    * value has exactly `scale` decimals — integer summation sidesteps both,
    * making Spark and the DuckDB oracle bit-identical. Scale is chosen as the
    * number of true decimal places of the summand (prices 2, price×(1−disc)
    * 4, ×(1+tax) 6). */
  private def moneySum(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    sum(round(c * f, 0).cast("long")).cast("double") / f
  }

  /** Deterministic mean of fixed-decimal values: exact scaled sum, then
    * divide — mirrored exactly in the oracle SQL ((s/f)/n, same op order). */
  private def moneyAvg(c: Column, scale: Int): Column =
    moneySum(c, scale) / count(lit(1))

  val all: Seq[QueryDef] = Seq(

    // ── Q01: source scan + count ────────────────────────────────────────────
    QueryDef("q01_scan_count",
      (s, d) => t(s, d, "lineitem").agg(count(lit(1)).as("n_rows")),
      Some("SELECT count(*) AS n_rows FROM lineitem"),
      "Full scan; witness for spark.read.parquet (marEx open_zarr, detect.py:409)"),

    // ── Q02: sink + read-back ───────────────────────────────────────────────
    QueryDef("q02_sink_roundtrip",
      (s, d) => {
        val out = s"${System.getProperty("java.io.tmpdir")}/graft_q02_roundtrip"
        t(s, d, "orders").filter(col("o_totalprice") > 100000)
          .write.mode("overwrite").parquet(out)
        s.read.parquet(out)
          .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice"), 2).as("sum_price"))
      },
      Some("""SELECT count(*) AS n,
                     CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
              FROM orders WHERE o_totalprice > 100000"""),
      "Parquet write + read-back (marEx to_zarr, track.py:1748)"),

    // ── Q03: projection / cast / arithmetic ────────────────────────────────
    QueryDef("q03_project_cast",
      (s, d) => t(s, d, "lineitem").select(
        col("l_orderkey").cast("long").as("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_quantity").cast("int").cast("long").as("qty_int"),
        // price and discount carry 2 decimals each → the product has exactly
        // 4; rounding at 4 never lands on a half-boundary (rounding at 2 does).
        round(revenue, 4).as("net_price")),
      Some("""SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
                     CAST(l_linenumber AS BIGINT) AS l_linenumber,
                     CAST(CAST(l_quantity AS INT) AS BIGINT) AS qty_int,
                     round(l_extendedprice * (1 - l_discount), 4) AS net_price
              FROM lineitem"""),
      "Projection + cast pushed into the parquet scan (marEx float32 cast, detect.py:600)"),

    // ── Q04: multi-predicate filter ────────────────────────────────────────
    QueryDef("q04_filter",
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderstatus") === "F" &&
          col("o_orderdate") >= lit("1995-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp") &&
          col("o_totalprice") > 50000)
        .select(col("o_orderkey").cast("long").as("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"),
          to_date(col("o_orderdate")).as("o_date")),
      Some("""SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
                     round(o_totalprice, 2) AS o_totalprice,
                     CAST(o_orderdate AS DATE) AS o_date
              FROM orders
              WHERE o_orderstatus = 'F'
                AND o_orderdate >= TIMESTAMP '1995-07-01'
                AND o_orderdate <  TIMESTAMP '1996-07-01'
                AND o_totalprice > 50000"""),
      "Predicate pushdown witness (marEx year trim, detect.py:640–641)"),

    // ── Q05: multi-way equi-join (TPC-H Q5 shape) ──────────────────────────
    QueryDef("q05_join5",
      (s, d) => {
        val li = t(s, d, "lineitem"); val o = t(s, d, "orders")
        val c = t(s, d, "customer"); val n = t(s, d, "nation"); val r = t(s, d, "region")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(moneySum(revenue, 4).as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some("""SELECT r_name, n_name,
                     CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
                     count(*) AS n_items
              FROM lineitem
              JOIN orders   ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation   ON c_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
              WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate <  TIMESTAMP '1997-01-01'
              GROUP BY r_name, n_name"""),
      "Fact-fact shuffle join + broadcast dims (marEx threshold compare join, detect.py:2001)"),

    // ── Q06: self-join on shifted key ──────────────────────────────────────
    QueryDef("q06_shifted_selfjoin",
      (s, d) => {
        val e = t(s, d, "events").withColumn("day", to_date(col("ts")))
        val e1 = e.select(col("user_id").as("u"), col("day").as("d1"), col("event_type").as("type_prev"))
        val e2 = e.select(col("user_id").as("u2"), col("day").as("d2"), col("event_type").as("type_next"))
        e1.join(e2, col("u") === col("u2") && col("d2") === date_add(col("d1"), 1))
          .groupBy("type_prev", "type_next").agg(count(lit(1)).as("n_pairs"))
      },
      Some("""SELECT e1.event_type AS type_prev, e2.event_type AS type_next,
                     count(*) AS n_pairs
              FROM events e1
              JOIN events e2 ON e2.user_id = e1.user_id
                            AND CAST(e2.ts AS DATE) = CAST(e1.ts AS DATE) + 1
              GROUP BY 1, 2"""),
      "t↔t+1 overlap self-join (marEx check_overlap_slice, track.py:2474)"),

    // ── Q07: semi / anti join ──────────────────────────────────────────────
    QueryDef("q07_semi_anti",
      (s, d) => {
        val sup = t(s, d, "supplier"); val li = t(s, d, "lineitem")
        val withLi = sup.join(li, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .agg(count(lit(1)).as("n")).withColumn("kind", lit("with"))
        val withoutLi = sup.join(li, col("s_suppkey") === col("l_suppkey"), "left_anti")
          .agg(count(lit(1)).as("n")).withColumn("kind", lit("without"))
        withLi.unionByName(withoutLi).select("kind", "n")
      },
      Some("""SELECT 'with' AS kind, count(*) AS n FROM supplier
              WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem)
              UNION ALL
              SELECT 'without' AS kind, count(*) AS n FROM supplier
              WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem)"""),
      "Keep-IDs semi-join filter (marEx filter_small_objects, track.py:1891–1895)"),

    // ── Q08: as-of join (nearest prior event) ──────────────────────────────
    QueryDef("q08_asof",
      (s, d) => {
        // For each purchase, the latest strictly-earlier click of the same
        // user. Scalable shape: one shuffle on user_id, a single ordered
        // window pass (no per-row range join). kind_rank orders purchases
        // before clicks at equal (µs) timestamps so "strictly earlier" holds.
        val e = t(s, d, "events")
          .filter(col("event_type").isin("purchase", "click"))
          .withColumn("kind_rank", when(col("event_type") === "purchase", 0).otherwise(1))
          .withColumn("click_ts", when(col("event_type") === "click", col("ts")))
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("kind_rank"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        e.withColumn("prior_click", last(col("click_ts"), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id").cast("long").as("event_id"),
            unix_millis(col("prior_click")).as("prior_click_ms"))
      },
      Some("""SELECT CAST(p.event_id AS BIGINT) AS event_id,
                     CAST(epoch_ms(max(c.ts)) AS BIGINT) AS prior_click_ms
              FROM events p
              LEFT JOIN events c ON c.user_id = p.user_id
                                AND c.event_type = 'click'
                                AND c.ts < p.ts
              WHERE p.event_type = 'purchase'
              GROUP BY p.event_id"""),
      "As-of flavor via ordered window (marEx doy-window membership, D14)"),

    // ── Q09: grouped aggregation (TPC-H Q1 shape) ──────────────────────────
    QueryDef("q09_agg_q1",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          moneySum(col("l_quantity"), 2).as("sum_qty"),
          moneySum(col("l_extendedprice"), 2).as("sum_base"),
          moneySum(revenue, 4).as("sum_disc_price"),
          moneySum(revenue * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
          moneyAvg(col("l_quantity"), 2).as("avg_qty"),
          moneyAvg(col("l_extendedprice"), 2).as("avg_price"),
          moneyAvg(col("l_discount"), 2).as("avg_disc"),
          count(lit(1)).as("count_order")),
      Some("""SELECT l_returnflag, l_linestatus,
                     CAST(sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
                     CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base,
                     CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
                     CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_charge,
                     (CAST(sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS DOUBLE) / 100.0) / count(*) AS avg_qty,
                     (CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS DOUBLE) / 100.0) / count(*) AS avg_price,
                     (CAST(sum(CAST(round(l_discount * 100.0) AS BIGINT)) AS DOUBLE) / 100.0) / count(*) AS avg_disc,
                     count(*) AS count_order
              FROM lineitem
              WHERE l_shipdate <= TIMESTAMP '2000-09-02'
              GROUP BY l_returnflag, l_linestatus"""),
      "Partial-agg groupBy (marEx climatology means, detect.py:2365)"),

    // ── Q10: dense key domain (empty groups materialized) ──────────────────
    QueryDef("q10_dense_groups",
      (s, d) => {
        val o = t(s, d, "orders")
          .withColumn("yr", year(col("o_orderdate")).cast("long"))
          .withColumn("mth", month(col("o_orderdate")).cast("long"))
        val years = o.select("yr").distinct()
        val months = s.range(1, 13).select(col("id").as("mth"))
        val rev = o.groupBy("yr", "mth").agg(moneySum(col("o_totalprice"), 2).as("s"))
        years.crossJoin(months)
          .join(rev, Seq("yr", "mth"), "left")
          .select(col("yr"), col("mth"), coalesce(col("s"), lit(0.0)).as("revenue"))
      },
      Some("""WITH yrs AS (SELECT DISTINCT CAST(year(o_orderdate) AS BIGINT) AS yr FROM orders),
                   mths AS (SELECT CAST(unnest(generate_series(1, 12)) AS BIGINT) AS mth),
                   rev AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
                                  CAST(month(o_orderdate) AS BIGINT) AS mth,
                                  CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 AS s
                           FROM orders GROUP BY 1, 2)
              SELECT yrs.yr, mths.mth, coalesce(rev.s, 0.0) AS revenue
              FROM yrs CROSS JOIN mths
              LEFT JOIN rev ON rev.yr = yrs.yr AND rev.mth = mths.mth"""),
      "Dense expected-groups domain (marEx flox expected_groups, detect.py:1665)"),

    // ── Q11: distinct ──────────────────────────────────────────────────────
    QueryDef("q11_distinct",
      (s, d) => t(s, d, "orders")
        .select(col("o_custkey"), year(col("o_orderdate")).as("yr"))
        .distinct()
        .agg(count(lit(1)).as("n")),
      Some("""SELECT count(*) AS n FROM
                (SELECT DISTINCT o_custkey, year(o_orderdate) FROM orders)"""),
      "Distinct pair dedup (marEx np.unique pair encoding, track.py:2493)"),

    // ── Q12: exact grouped percentile ──────────────────────────────────────
    QueryDef("q12_percentile_exact",
      (s, d) => t(s, d, "part")
        .groupBy("p_brand")
        .agg(round(expr("percentile(p_retailprice, 0.95)"), 4).as("p95")),
      Some("""SELECT p_brand,
                     round(CAST(percentile_cont(0.95) WITHIN GROUP (ORDER BY p_retailprice) AS DOUBLE), 4) AS p95
              FROM part GROUP BY p_brand"""),
      "Exact per-group quantile (marEx global_extreme exact path, detect.py:2899)"),

    // ── Q13: histogram-approximate percentile (our operator) ───────────────
    QueryDef("q13_percentile_hist",
      (s, d) => HistogramQuantile.quantile(
        t(s, d, "part"), Seq("p_brand"), "p_retailprice",
        q = 0.95, lo = 0.0, width = 25.0, nBins = 200, out = "p95_approx")
        .select(col("p_brand"), round(col("p95_approx"), 4).as("p95_approx")),
      Some("""WITH binned AS (
                SELECT p_brand,
                       CASE WHEN p_retailprice < 0.0 THEN 0
                            ELSE least(CAST(floor((p_retailprice - 0.0) / 25.0) AS INT) + 1, 200)
                       END AS bin,
                       count(*) AS cnt
                FROM part GROUP BY 1, 2),
              cdf AS (
                SELECT p_brand, bin, cnt,
                       CAST(sum(cnt) OVER (PARTITION BY p_brand ORDER BY bin
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                         / CAST(sum(cnt) OVER (PARTITION BY p_brand) AS DOUBLE) AS cdf,
                       lag(bin) OVER (PARTITION BY p_brand ORDER BY bin) AS prev_bin,
                       CAST(sum(cnt) OVER (PARTITION BY p_brand ORDER BY bin
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS DOUBLE)
                         / CAST(sum(cnt) OVER (PARTITION BY p_brand) AS DOUBLE) AS prev_cdf
                FROM binned),
              hit AS (
                SELECT *,
                       coalesce(prev_cdf, 0.0) AS cdf_prev,
                       CASE WHEN prev_bin IS NULL OR prev_bin < 1 THEN 0.0
                            ELSE 0.0 + (CAST(prev_bin AS DOUBLE) - 0.5) * 25.0 END AS c_prev,
                       CASE WHEN bin >= 1 THEN 0.0 + (CAST(bin AS DOUBLE) - 0.5) * 25.0 ELSE 0.0 END AS c_cur
                FROM cdf
                WHERE cdf >= 0.95 AND (prev_cdf IS NULL OR prev_cdf < 0.95))
              SELECT p_brand,
                     round(CASE WHEN bin = 0 THEN 0.0
                           ELSE c_prev + (0.95 - cdf_prev) / (cdf - cdf_prev) * (c_cur - c_prev)
                           END, 4) AS p95_approx
              FROM hit"""),
      "Histogram-binned quantile, marEx D13 algorithm (detect.py:2737–2865)"),

    // ── Q14: centered moving average ───────────────────────────────────────
    QueryDef("q14_moving_avg",
      (s, d) => {
        val daily = t(s, d, "events").groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val w = Window.orderBy("day").rowsBetween(-3, 3)
        daily.withColumn("ma7", round(avg("n").over(w), 4)).select("day", "n", "ma7")
      },
      Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
                             FROM events GROUP BY 1)
              SELECT day, n,
                     round(avg(n) OVER (ORDER BY day
                           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 4) AS ma7
              FROM daily"""),
      "Centered rolling mean (marEx 21-day smoothing, detect.py:1810). Global " +
        "window is safe: input pre-aggregated to one row per day"),

    // ── Q15: circular day-of-year rolling mean ─────────────────────────────
    QueryDef("q15_circular_doy",
      (s, d) => {
        // Per-doy mean, then mean over the circular ±5-day neighborhood.
        // The base aggregate reduces to ≤366 rows regardless of input size,
        // so the circular self-join is O(366·11) — scale-free.
        val base = t(s, d, "events")
          .groupBy(dayofyear(col("ts")).cast("long").as("doy"))
          .agg(moneyAvg(col("value"), 2).as("v"))
        val b2 = base.select(col("doy").as("doy2"), col("v").as("v2"))
        val dist = least(
          pmod(col("doy") - col("doy2") + 366, lit(366)),
          pmod(col("doy2") - col("doy") + 366, lit(366)))
        base.join(b2, dist <= 5)
          .groupBy("doy")
          .agg(round(avg("v2"), 4).as("circ_mean"), count(lit(1)).as("n_nbrs"))
      },
      Some("""WITH base AS (SELECT CAST(dayofyear(ts) AS BIGINT) AS doy,
                                   (CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS DOUBLE) / 100.0) / count(*) AS v
                            FROM events GROUP BY 1)
              SELECT b1.doy,
                     round(avg(b2.v), 4) AS circ_mean,
                     count(*) AS n_nbrs
              FROM base b1
              JOIN base b2
                ON least((b1.doy - b2.doy + 366) % 366, (b2.doy - b1.doy + 366) % 366) <= 5
              GROUP BY b1.doy"""),
      "Circular doy window (marEx wrap-padded rolling, detect.py:2271, 2494)"),

    // ── Q16: cumulative sum ────────────────────────────────────────────────
    QueryDef("q16_running_sum",
      (s, d) => {
        // Scaled-long all the way through the window: running sums of
        // integers are exact, so the cumulative values are engine-independent.
        val daily = t(s, d, "orders")
          .groupBy(col("o_custkey"), to_date(col("o_orderdate")).as("day"))
          .agg(sum(round(col("o_totalprice") * 100.0, 0).cast("long")).as("rev_s"))
        val w = Window.partitionBy("o_custkey").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily.withColumn("running", sum("rev_s").over(w).cast("double") / 100.0)
          .select(col("o_custkey").cast("long").as("o_custkey"), col("day"), col("running"))
      },
      Some("""WITH daily AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
                                    sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS rev_s
                             FROM orders GROUP BY 1, 2)
              SELECT CAST(o_custkey AS BIGINT) AS o_custkey, day,
                     CAST(sum(rev_s) OVER (PARTITION BY o_custkey ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS running
              FROM daily"""),
      "Cumulative sum / CDF machinery (marEx detect.py:2780, track.py:2763)"),

    // ── Q17: lag / delta ───────────────────────────────────────────────────
    QueryDef("q17_lag_delta",
      (s, d) => {
        val daily = t(s, d, "events").groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val w = Window.orderBy("day")
        daily.withColumn("delta", col("n") - lag("n", 1).over(w))
          .select("day", "n", "delta")
      },
      Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
                             FROM events GROUP BY 1)
              SELECT day, n, n - lag(n) OVER (ORDER BY day) AS delta
              FROM daily"""),
      "Shift/lag (marEx track.py:2474). Tiny post-agg domain → global window OK"),

    // ── Q18: argmin/argmax over time ───────────────────────────────────────
    QueryDef("q18_argminmax",
      (s, d) => t(s, d, "orders")
        .groupBy(col("o_custkey").cast("long").as("o_custkey"))
        .agg(
          to_date(min(col("o_orderdate"))).as("first_date"),
          to_date(max(col("o_orderdate"))).as("last_date"),
          min_by(col("o_orderkey"), struct(col("o_orderdate"), col("o_orderkey"))).cast("long").as("first_key"),
          max_by(col("o_orderkey"), struct(col("o_orderdate"), col("o_orderkey"))).cast("long").as("last_key")),
      Some("""WITH r AS (SELECT o_custkey, o_orderkey, o_orderdate,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey) AS rn_a,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn_d
              FROM orders)
              SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
                     min(CASE WHEN rn_a = 1 THEN CAST(o_orderdate AS DATE) END) AS first_date,
                     max(CASE WHEN rn_d = 1 THEN CAST(o_orderdate AS DATE) END) AS last_date,
                     CAST(min(CASE WHEN rn_a = 1 THEN o_orderkey END) AS BIGINT) AS first_key,
                     CAST(min(CASE WHEN rn_d = 1 THEN o_orderkey END) AS BIGINT) AS last_key
              FROM r GROUP BY o_custkey"""),
      "min_by/max_by with struct tiebreak (marEx time_start/end argmax, track.py:3112)"),

    // ── Q19: global top-k ──────────────────────────────────────────────────
    QueryDef("q19_topk",
      (s, d) => t(s, d, "orders")
        .groupBy(col("o_custkey").cast("long").as("o_custkey"))
        .agg(moneySum(col("o_totalprice"), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("o_custkey"))
        .limit(10),
      Some("""SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
                     CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
              FROM orders GROUP BY o_custkey
              ORDER BY revenue DESC, o_custkey LIMIT 10"""),
      "Top-k with deterministic tiebreak; Spark plans TakeOrderedAndProject " +
        "(no global sort materialization)"),

    // ── Q20: per-group top-k (windowed rank) ───────────────────────────────
    QueryDef("q20_group_topk",
      (s, d) => {
        val sup = t(s, d, "supplier"); val n = t(s, d, "nation")
        val w = Window.partitionBy("n_name").orderBy(col("s_acctbal").desc, col("s_suppkey"))
        sup.join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("n_name"), col("s_name"),
            round(col("s_acctbal"), 2).as("acctbal"), col("rn").cast("long").as("rn"))
      },
      Some("""SELECT n_name, s_name, round(s_acctbal, 2) AS acctbal,
                     CAST(rn AS BIGINT) AS rn
              FROM (SELECT n_name, s_name, s_acctbal,
                           row_number() OVER (PARTITION BY n_name
                                              ORDER BY s_acctbal DESC, s_suppkey) AS rn
                    FROM supplier JOIN nation ON s_nationkey = n_nationkey)
              WHERE rn <= 3"""),
      "Windowed rank top-k (marEx largest-events selection, T11)"),

    // ── Q21: set operations ────────────────────────────────────────────────
    QueryDef("q21_setops",
      (s, d) => {
        // intersect/except semantics in one scan: Catalyst itself rewrites
        // INTERSECT→left-semi and EXCEPT→left-anti; pre-aggregating per-year
        // membership flags gets all three counts from a single shuffle
        // instead of six scans + three joins.
        val o = t(s, d, "orders")
        val flags = o
          .filter(year(col("o_orderdate")).isin(1995, 1996))
          .groupBy("o_custkey")
          .agg(max(when(year(col("o_orderdate")) === 1995, 1).otherwise(0)).as("in95"),
            max(when(year(col("o_orderdate")) === 1996, 1).otherwise(0)).as("in96"))
        flags.agg(
          count(when(col("in95") === 1 && col("in96") === 1, 1)).as("both"),
          count(when(col("in95") === 1 && col("in96") === 0, 1)).as("only_1995"),
          count(when(col("in95") === 0 && col("in96") === 1, 1)).as("only_1996"))
          .select(explode(array(
            struct(lit("both").as("kind"), col("both").as("n")),
            struct(lit("only_1995").as("kind"), col("only_1995").as("n")),
            struct(lit("only_1996").as("kind"), col("only_1996").as("n")))).as("r"))
          .select(col("r.kind").as("kind"), col("r.n").as("n"))
      },
      Some("""WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
                   b AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
              SELECT 'both' AS kind, count(*) AS n FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
              UNION ALL
              SELECT 'only_1995', count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
              UNION ALL
              SELECT 'only_1996', count(*) FROM (SELECT * FROM b EXCEPT SELECT * FROM a)"""),
      "intersect/except (marEx mask set logic, track.py:1895)"),

    // ── Q22: rollup ────────────────────────────────────────────────────────
    QueryDef("q22_rollup",
      (s, d) => {
        val o = t(s, d, "orders"); val c = t(s, d, "customer")
        val n = t(s, d, "nation"); val r = t(s, d, "region")
        o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .select("r_name", "n_name", "o_totalprice")
          // col() form: the String-varargs rollup overload trips Spark's
          // ambiguous-self-join check on post-join frames
          .rollup(col("r_name"), col("n_name"))
          .agg(moneySum(col("o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
      },
      Some("""SELECT r_name, n_name,
                     CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
                     count(*) AS n_orders
              FROM orders
              JOIN customer ON o_custkey = c_custkey
              JOIN nation   ON c_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
              GROUP BY ROLLUP (r_name, n_name)"""),
      "Rollup hierarchy totals"),

    // ── Q23: trig/haversine + bucketed histogram ───────────────────────────
    QueryDef("q23_haversine",
      (s, d) => {
        // Deterministic synthetic coordinates from user_id (events carry no
        // geo columns); haversine distance to (0,0), bucketed at 2000 km.
        val u = t(s, d, "events").select("user_id").distinct()
          .withColumn("lat", (col("user_id") % 18).cast("double") * 10.0 - 85.0)
          .withColumn("lon", (col("user_id") % 36).cast("double") * 10.0 - 175.0)
        val dist = lit(2.0 * 6371.0) * asin(sqrt(
          pow(sin(radians(col("lat")) / 2), 2) +
            cos(radians(col("lat"))) * cos(lit(0.0)) * pow(sin(radians(col("lon")) / 2), 2)))
        u.withColumn("dist_km", dist)
          .groupBy(floor(col("dist_km") / 2000.0).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n_users"), round(avg("dist_km"), 3).as("avg_km"))
      },
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
                   coord AS (SELECT user_id,
                                    CAST(user_id % 18 AS DOUBLE) * 10.0 - 85.0 AS lat,
                                    CAST(user_id % 36 AS DOUBLE) * 10.0 - 175.0 AS lon
                             FROM u),
                   dist AS (SELECT user_id,
                                   2.0 * 6371.0 * asin(sqrt(
                                     pow(sin(radians(lat) / 2), 2) +
                                     cos(radians(lat)) * cos(0.0) * pow(sin(radians(lon) / 2), 2))) AS dist_km
                            FROM coord)
              SELECT CAST(floor(dist_km / 2000.0) AS BIGINT) AS bucket,
                     count(*) AS n_users,
                     round(avg(dist_km), 3) AS avg_km
              FROM dist GROUP BY 1"""),
      "Spherical trig as column exprs (marEx haversine, track.py:5406–5411)"),

    // ── Q24: day-of-year climatology ───────────────────────────────────────
    QueryDef("q24_doy_climatology",
      (s, d) => t(s, d, "events")
        .groupBy(dayofyear(col("ts")).cast("long").as("doy"))
        .agg(moneyAvg(col("value"), 2).as("clim"), count(lit(1)).as("n")),
      Some("""SELECT CAST(dayofyear(ts) AS BIGINT) AS doy,
                     (CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS DOUBLE) / 100.0) / count(*) AS clim,
                     count(*) AS n
              FROM events GROUP BY 1"""),
      "Doy climatology groupBy (marEx fixed_baseline, detect.py:2365–2373)"),

    // ── Q25: array functions ───────────────────────────────────────────────
    QueryDef("q25_arrays",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_orderkey").cast("long").as("l_orderkey"))
        .agg(sort_array(collect_list(col("l_partkey"))).as("parts"))
        .select(
          col("l_orderkey"),
          size(col("parts")).cast("long").as("n_parts"),
          array_min(col("parts")).cast("long").as("min_part"),
          array_max(col("parts")).cast("long").as("max_part"),
          size(array_distinct(col("parts"))).cast("long").as("n_distinct")),
      Some("""SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
                     count(*) AS n_parts,
                     CAST(min(l_partkey) AS BIGINT) AS min_part,
                     CAST(max(l_partkey) AS BIGINT) AS max_part,
                     count(DISTINCT l_partkey) AS n_distinct
              FROM lineitem GROUP BY l_orderkey"""),
      "collect_list/sort_array/array_* (marEx merge-ledger arrays, §1.4)"),

    // ── Q26: string functions ──────────────────────────────────────────────
    QueryDef("q26_strings",
      (s, d) => t(s, d, "part")
        .groupBy(substring(col("p_name"), 1, 3).as("pfx"))
        .agg(
          count(lit(1)).as("n"),
          count(when(col("p_name").rlike("red|blue"), 1)).as("n_match"),
          round(avg(length(col("p_name"))), 4).as("avg_len")),
      Some("""SELECT substring(p_name, 1, 3) AS pfx,
                     count(*) AS n,
                     count(*) FILTER (WHERE regexp_matches(p_name, 'red|blue')) AS n_match,
                     round(avg(length(p_name)), 4) AS avg_len
              FROM part GROUP BY 1"""),
      "like/regexp/substr aggregation"),

    // ── Q27: sessionization ────────────────────────────────────────────────
    QueryDef("q27_sessionize",
      (s, d) => {
        // Gap-based sessions (30 min), one shuffle on user_id + one ordered
        // window pass — the batch equivalent of session_window (marEx T7
        // temporal gap fill is the same lag/cumsum shape).
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        t(s, d, "events")
          .withColumn("prev_ts", lag("ts", 1).over(w))
          .withColumn("new_sess",
            when(col("prev_ts").isNull ||
              unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L)
              .otherwise(0L))
          .groupBy(col("user_id").cast("long").as("user_id"))
          .agg(sum("new_sess").as("n_sessions"), count(lit(1)).as("n_events"))
      },
      Some("""WITH o AS (SELECT user_id, ts,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
              FROM events)
              SELECT CAST(user_id AS BIGINT) AS user_id,
                     CAST(sum(CASE WHEN prev_ts IS NULL
                                     OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                                   THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
                     count(*) AS n_events
              FROM o GROUP BY user_id"""),
      "Sessionization with gap (marEx fill_time_gaps dual, track.py:1675)"),

    // ── Q28: connected components ──────────────────────────────────────────
    QueryDef("q28_connected_components",
      (s, d) => {
        // Synthetic deterministic graph over supplier keys: i — (3i+7) mod 100.
        val edges = t(s, d, "supplier").select(
          col("s_suppkey").cast("long").as("src"),
          ((col("s_suppkey") * 3 + 7) % 100).cast("long").as("dst"))
        ConnectedComponents.auto(edges)
          .select(col("node").cast("long").as("node"), col("component").cast("long").as("component"))
      },
      Some("""WITH RECURSIVE
                e AS (SELECT CAST(s_suppkey AS BIGINT) AS src,
                             CAST((s_suppkey * 3 + 7) % 100 AS BIGINT) AS dst
                      FROM supplier),
                ud AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
                reach(a, b) AS (
                  SELECT src, src FROM ud
                  UNION
                  SELECT r.a, ud.dst FROM reach r JOIN ud ON ud.src = r.b)
              SELECT a AS node, min(b) AS component
              FROM reach GROUP BY a"""),
      "Min-label-propagation CC vs recursive-CTE oracle (marEx T8/T16)")
  )
}
