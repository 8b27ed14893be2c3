package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact
import graft.sources.Tables

/** Relational coverage over the TPC-H-ish tables: joins (broadcast, semi,
  * anti), multi-way joins, rollup, SQL window functions, distinct
  * aggregation, set operations, top-k.
  *
  * The reference has no joins at all (SURVEY.md §2 "everything else is
  * absent"); these are the extension surface a user needs from a general
  * analytics engine, each written so Catalyst picks the scale-correct
  * physical plan:
  *  - dimension tables (`customer`, `part`, `supplier`, `nation`, `region`)
  *    are `broadcast()` — at 100 TB the fact tables shuffle 0 bytes for
  *    these joins;
  *  - filters sit on the scan side of every join so parquet pushdown
  *    prunes row groups before the join;
  *  - top-k uses `orderBy.limit` which Spark executes as TakeOrderedAndProject
  *    (per-partition heap + driver merge), never a full sort.
  */
object RelationalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Z-order (Morton) layout key over two range-bucketed dimensions —
    // the multi-dimensional clustering device (Delta/Iceberg OPTIMIZE
    // ZORDER): write sorted by this key and parquet min/max stats prune
    // row groups for predicates on EITHER dimension (measured in
    // ZOrderSpec; one-column sorts only serve their leading column).
    // Declared as the key computation itself — narrow, codegen'd
    // (functions.expressions.ZOrderExpression), zero shuffle. Inputs are
    // bucketed mod 1024: a layout key wants coarse locality, and 10-bit
    // inputs keep every bit position engine-portable.
    "q_zorder_key" -> ((s, dir) =>
      Tables.orders(s, dir).select(col("o_orderkey"),
        graft.functions.expressions.ZOrderExpression
          .z_order(col("o_custkey") % 1024, col("o_orderkey") % 1024)
          .as("zkey"))),

    // TPC-H Q1 shape: wide aggregate over the biggest fact table with a
    // pushed-down date filter. Exact decimal sums (see Exact) keep the
    // result bit-stable under any partitioning.
    "q_tpch_pricing" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1999-01-01 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Exact.sum2(col("l_quantity")).as("sum_qty"),
          Exact.sum2(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("sum_disc_price"),
          Exact.avg2(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("cnt"))),

    // Broadcast hash join: fact (orders) joined to a broadcast dimension
    // (customer). Revenue per market segment.
    "q_join_segment_revenue" -> ((s, dir) =>
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)),
              col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(Exact.sum2(col("o_totalprice")).as("revenue"),
             count(lit(1)).as("n_orders"))),

    // Multi-way join: one fact scan, two broadcast dimensions, no
    // fact-side shuffle until the final aggregation.
    "q_join_brand_volume" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .groupBy("p_brand")
        .agg(Exact.sum2(col("l_quantity")).as("sum_qty"),
             countDistinct(col("s_suppkey")).as("n_suppliers"),
             count(lit(1)).as("n_lines"))),

    // ROLLUP grouping sets over a snowflake join (customer -> nation ->
    // region, both broadcast).
    // NB: rollup(String*) trips the analyzer's ambiguous-self-join check on
    // join outputs; rollup(Column*) over a projected frame does not.
    "q_rollup_region_nation" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .select("r_name", "n_name", "c_acctbal")
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
             Exact.sum2(col("c_acctbal")).as("sum_acctbal"))),

    // Top-k: TakeOrderedAndProject (bounded per-partition heaps), not a
    // global sort — the only plan that survives 100 TB. Deterministic
    // tiebreak on the key.
    "q_topk_orders" -> ((s, dir) =>
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")),

    // SQL window function (rank within partition) — note "window" here is
    // the analytic kind, not the event-time kind (SURVEY.md §2 note).
    "q_window_rank_orders" -> ((s, dir) =>
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
                col("rn").cast("long").as("rn"))),

    // Distinct aggregation (expand + two-phase aggregate in Spark).
    "q_distinct_users" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
             count(lit(1)).as("n_events"))),

    // Left semi join (EXISTS): parts that shipped at least once.
    "q_semi_parts_shipped" -> ((s, dir) =>
      Tables.part(s, dir)
        .join(Tables.lineitem(s, dir).select("l_partkey"),
              col("p_partkey") === col("l_partkey"), "left_semi")
        .select("p_partkey", "p_brand")),

    // Left anti join (NOT EXISTS): customers with no orders in 2001+.
    // The filter lands on the build side before the join.
    "q_anti_dormant_customers" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir)
                .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("2001-01-01 00:00:00")))
                .select("o_custkey"),
              col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_mktsegment")),

    // TPC-H Q5 shape: 6-table join tree (two broadcast snowflake dims, two
    // fact-fact joins) with a region filter and a date-range filter pushed
    // to the scans. Catalyst orders the joins; local-supplier condition
    // (customer and supplier share a nation) correlates the branches.
    "q_tpch_local_supplier" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
                col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
        // SHUFFLE_HASH on the customer-x-filtered-orders side: the
        // lineitem probe side is ~13x its rows (4x fact ratio x the ~30%
        // date filter), and sort-merge would SORT those lineitem
        // partitions — measured at the x100 probe: 1.9 GB of sort spill,
        // the whole 1.5 -> 37 s superlinearity (SCALE.md round 5). A
        // per-partition hash map of the small side streams lineitem
        // unsorted; build size stays ~7% of the probe partition at every
        // scale because both sides split on the same key space.
        .hint("SHUFFLE_HASH")
        .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.supplier(s, dir)),
              col("l_suppkey") === col("s_suppkey") &&
                col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)),
              col("n_regionkey") === col("r_regionkey") && col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
                 (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
               .cast("double").as("revenue"),
             count(lit(1)).as("n_lines"))),

    // Exact median (continuous interpolation) per group — Spark sorts per
    // group; DuckDB's quantile_cont uses the same p*(n-1) interpolation.
    // NOTE exact percentile buffers each group's values (unbounded state);
    // at 100 TB use approx_percentile — this query documents the exact
    // semantics at oracle-checkable scale.
    "q_median_price" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderstatus")
        .agg(expr("percentile(o_totalprice, 0.5)").as("median_price"),
             count(lit(1)).as("n"))),

    // The declared 100 TB path beside q_median_price: sketch percentile with
    // BOUNDED state per group (exact percentile buffers every value). No
    // DuckDB oracle — sketch internals are engine-specific, so the driver
    // records a rows-only check; SketchSpec bounds the error against the
    // exact median instead.
    "q_approx_median_price" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderstatus")
        .agg(expr("approx_percentile(o_totalprice, 0.5, 10000)").as("approx_median"),
             count(lit(1)).as("n"))),

    // The declared 100 TB path beside q_distinct_users: HLL++ distinct
    // counting with CONSTANT state per group (exact distinct shuffles
    // every distinct value). Same oracle-less discipline as the sketch
    // percentile — driver records rows-only, SketchSpec bounds the error
    // against the exact count at 3x the configured rsd.
    "q_approx_distinct_users" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), rsd = 0.05)
               .as("approx_users"),
             count(lit(1)).as("n_events"))),

    // CUBE grouping sets (all 4 combinations of the two dimensions).
    "q_cube_order_status" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select("o_orderpriority", "o_orderstatus", "o_totalprice")
        .cube(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
             Exact.sum2(col("o_totalprice")).as("sum_price"))),

    // PIVOT: long-to-wide reshape with EXPLICIT pivot values — the values
    // list keeps the output schema static (an inferred pivot would collect
    // distinct values to the driver first: an extra job, and a schema that
    // drifts with the data). Cells with no rows coalesce to 0.
    "q_pivot_status" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))),

    // Arbitrary GROUPING SETS (beyond rollup/cube) through the SQL API —
    // Spark plans one Expand + single aggregate, not two scans.
    "q_grouping_sets" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""".stripMargin)
    }),

    // UNION ALL across differently-sourced relations.
    "q_union_roles" -> ((s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_nationkey").cast("long").as("nationkey"), lit("customer").as("role"))
        .unionByName(
          Tables.supplier(s, dir)
            .select(col("s_nationkey").cast("long").as("nationkey"), lit("supplier").as("role")))
        .groupBy("nationkey", "role")
        .agg(count(lit(1)).as("n"))),

    // Scalar-subquery shape: parts above their brand's average price
    // (decimal-exact average; the aggregate side is broadcast).
    "q_above_brand_avg" -> ((s, dir) => {
      val p = Tables.part(s, dir)
      val brandAvg = p.groupBy(col("p_brand").as("b_brand"))
        .agg((sum(col("p_retailprice").cast("decimal(18,2)")).cast("double") /
              count(lit(1))).as("avg_price"))
      p.join(broadcast(brandAvg), col("p_brand") === col("b_brand"))
        .filter(col("p_retailprice") > col("avg_price"))
        .select("p_partkey", "p_brand", "p_retailprice")
    }),

    // Gap-based sessionization: a new session starts when a user's
    // inter-event gap exceeds 30 minutes; session_id = running count of
    // session starts (lag + conditional cumulative sum — one shuffle on
    // the user key, two window passes over the same sort order, which
    // Spark executes as a single Sort + two Window operators).
    "q_sessionize" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("ts").asc, col("event_id").asc)))
        // microsecond-exact gap: cast('long') truncates to SECONDS, and a
        // 1800.3s gap would then read as exactly 1800 here while the
        // oracle's fractional epoch() saw > 1800 — boundary divergence
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
               unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_session")).over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("ts").asc, col("event_id").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("event_id", "user_id", "ts", "session_id")),

    // Analytic offset functions (lag): per-user previous value with a
    // deterministic (ts, event_id) order — one shuffle on the key.
    "q_window_lag" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("prev_value", lag(col("value"), 1).over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("ts").asc, col("event_id").asc)))
        .select("event_id", "user_id", "value", "prev_value")),

    // Range (inequality-predicate) join: events banded by value against a
    // tiny bounds relation. The bands side is broadcast, so the inequality
    // join is a broadcast nested-loop over 4 rows per event — the only
    // shape that scales (a shuffle range join would have no equi-key).
    "q_range_join_bands" -> ((s, dir) => {
      val bands = broadcast(s.createDataFrame(Seq(
        ("b0_low", 0.0, 25.0), ("b1_mid", 25.0, 50.0),
        ("b2_high", 50.0, 100.0), ("b3_tail", 100.0, 1e9)))
        .toDF("band", "lo", "hi"))
      Tables.events(s, dir)
        .join(bands, col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("cnt"), Exact.sum2(col("value")).as("sum_value"))
    }),

    // Interval join: equi-key + time-range predicate (each purchase joined
    // to the same user's views in the preceding 30 minutes). The equi key
    // carries the shuffle; the range predicate is a post-join filter inside
    // the sort-merge join — the batch analog of the streaming interval
    // join (StreamJoinSpec), and the scalable shape for temporal
    // correlation (no cross product, no broadcast needed on either side).
    "q_interval_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("v_ts"))
      purchases.join(views,
          purchases("user_id") === views("user_id") &&
            col("v_ts") <= col("p_ts") &&
            unix_micros(col("p_ts")) - unix_micros(col("v_ts")) <= 1800000000L,
          "left")
        .groupBy("purchase_id")
        .agg(count(col("v_ts")).as("n_views_30m"))
    }),

    // Set operation: nations that have both customers and suppliers.
    "q_intersect_nations" -> ((s, dir) =>
      Tables.customer(s, dir).select(col("c_nationkey").cast("long").as("nationkey"))
        .intersect(Tables.supplier(s, dir).select(col("s_nationkey").cast("long").as("nationkey")))))

  def oracles: Map[String, String] = Map(
    "q_zorder_key" ->
      s"""SELECT o_orderkey, ${graft.functions.expressions.ZOrderExpression
             .zOrderSql("(o_custkey % 1024)", "(o_orderkey % 1024)")} AS zkey
         |FROM orders""".stripMargin,
    "q_tpch_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
        |  count(*) AS cnt
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_join_segment_revenue" ->
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q_join_brand_volume" ->
      """SELECT p_brand,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(DISTINCT s_suppkey) AS n_suppliers,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY p_brand""".stripMargin,

    "q_rollup_region_nation" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin,

    "q_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,

    "q_window_rank_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn <= 3""".stripMargin,

    "q_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY event_type""".stripMargin,

    "q_semi_parts_shipped" ->
      """SELECT p_partkey, p_brand FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)""".stripMargin,

    "q_anti_dormant_customers" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')""".stripMargin,

    "q_tpch_local_supplier" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM customer
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin,

    "q_median_price" ->
      """SELECT o_orderstatus, quantile_cont(o_totalprice, 0.5) AS median_price,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q_cube_order_status" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY CUBE(o_orderpriority, o_orderstatus)""".stripMargin,

    "q_pivot_status" ->
      """SELECT o_orderpriority,
        |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""".stripMargin,

    "q_union_roles" ->
      """SELECT nationkey, role, count(*) AS n FROM (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey, 'customer' AS role FROM customer
        |  UNION ALL
        |  SELECT CAST(s_nationkey AS BIGINT) AS nationkey, 'supplier' AS role FROM supplier)
        |GROUP BY nationkey, role""".stripMargin,

    "q_above_brand_avg" ->
      """SELECT p_partkey, p_brand, p_retailprice
        |FROM part JOIN (
        |  SELECT p_brand AS b_brand,
        |    CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
        |  FROM part GROUP BY p_brand) ON p_brand = b_brand
        |WHERE p_retailprice > avg_price""".stripMargin,

    "q_intersect_nations" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        |INTERSECT
        |SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier""".stripMargin,

    "q_interval_join" ->
      """SELECT purchase_id, count(v_ts) AS n_views_30m FROM (
        |  SELECT p.event_id AS purchase_id, v.ts AS v_ts
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |    ON p.user_id = v.user_id
        |   AND CAST(v.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
        |   AND epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(v.ts AS TIMESTAMP)) <= 1800000000)
        |GROUP BY purchase_id""".stripMargin,

    "q_sessionize" ->
      """SELECT event_id, user_id, ts, session_id FROM (
        |  SELECT event_id, user_id, ts,
        |    CAST(sum(new_session) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM (
        |    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |      CASE WHEN prev_ts IS NULL
        |             OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(prev_ts) > 1800000000
        |           THEN 1 ELSE 0 END AS new_session
        |    FROM (
        |      SELECT event_id, user_id, ts,
        |        lag(CAST(ts AS TIMESTAMP), 1) OVER (
        |          PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |      FROM events)))""".stripMargin,

    "q_window_lag" ->
      """SELECT event_id, user_id, value,
        |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        |FROM events""".stripMargin,

    "q_range_join_bands" ->
      """SELECT band, count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |JOIN (VALUES ('b0_low', 0.0, 25.0), ('b1_mid', 25.0, 50.0),
        |             ('b2_high', 50.0, 100.0), ('b3_tail', 100.0, 1e9))
        |  AS bands(band, lo, hi)
        |  ON value >= lo AND value < hi
        |GROUP BY band""".stripMargin)
}
