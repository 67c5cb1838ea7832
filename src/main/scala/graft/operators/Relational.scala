package graft.operators

import graft.{QueryDef, Tables => T}
import graft.QueryDef._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** The relational-operator surface.
  *
  * The reference delegates ALL relational algebra to PostgreSQL through its
  * `--query` passthrough (`cli/src/main.rs:54-58`, `README.md:48-52`); this
  * engine supplies the same query surface natively through Catalyst
  * (SURVEY.md §2.4). Every query below is declarative DataFrame API — no
  * RDDs, no collect loops — so predicate pushdown, column pruning,
  * partial aggregation and join-strategy selection are Catalyst's job.
  *
  * Scale notes (100 TB design stance):
  *  - Dimension tables (region/nation/supplier/part/customer at TPC-H
  *    ratios) are broadcast explicitly; fact-fact joins (lineitem⋈orders)
  *    shuffle on the join key, which AQE re-plans at runtime.
  *  - Aggregations are partial (map-side combine) automatically because
  *    they are expressed as `groupBy().agg()` over codegen'd expressions.
  *  - Window functions partition on high-cardinality keys (custkey,
  *    suppkey, user_id) so per-partition state stays small.
  */
object Relational {

  private def ts(lit_ : String): Column = to_timestamp(lit(lit_))

  val queries: Seq[QueryDef] = Seq(

    // ---- q01: full-scan aggregation (TPC-H Q1 shape): partial agg +
    // decimal-exact sums; scan prunes to 9 of 11 columns.
    QueryDef(
      "q01_pricing_summary",
      (s, d) => {
        val li = T.lineitem(s, d)
        li.filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_extendedprice")).as("avg_price"),
            davg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some(s"""
        SELECT l_returnflag, l_linestatus,
          ${dsumSql("l_quantity")} AS sum_qty,
          ${dsumSql("l_extendedprice")} AS sum_base_price,
          ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
          ${dsumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
          ${davgSql("l_quantity")} AS avg_qty,
          ${davgSql("l_extendedprice")} AS avg_price,
          ${davgSql("l_discount")} AS avg_disc,
          COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      headline = true),

    // ---- q02: filter + projection; both must reach the parquet scan
    // (PushedFilters + 4-column ReadSchema).
    QueryDef(
      "q02_filter_project",
      (s, d) =>
        T.lineitem(s, d)
          .filter(col("l_quantity") >= lit(45.0) && col("l_discount") > lit(0.08))
          .select(
            col("l_orderkey"), col("l_linenumber"),
            (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1.0 - l_discount) AS net_price
        FROM lineitem
        WHERE l_quantity >= 45.0 AND l_discount > 0.08
        ORDER BY l_orderkey, l_linenumber""")),

    // ---- q03: broadcast dim join (customer is the small side at TPC-H
    // ratio 1:10 vs orders) + aggregation.
    QueryDef(
      "q03_join_agg_segment",
      (s, d) => {
        val o = T.orders(s, d)
        val c = T.customer(s, d)
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(
            dsum(col("o_totalprice")).as("total_revenue"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("c_mktsegment"))
      },
      Some(s"""
        SELECT c_mktsegment,
               ${dsumSql("o_totalprice")} AS total_revenue,
               COUNT(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment"""),
      headline = true),

    // ---- q04: 5-way join through the dim chain (TPC-H Q5 shape).
    // lineitem⋈orders shuffles on orderkey; every dim is broadcast.
    QueryDef(
      "q04_join5_nation_revenue",
      (s, d) => {
        val li = T.lineitem(s, d)
        val o = T.orders(s, d).filter(
          col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
          col("o_orderdate") < ts("1998-01-01 00:00:00"))
        val c = T.customer(s, d)
        val n = T.nation(s, d)
        val r = T.region(s, d)
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
               count(lit(1)).as("n_items"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some(s"""
        SELECT r_name, n_name,
               ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name"""),
      headline = true),

    // ---- q05: left-semi join (EXISTS) — customers that have at least one
    // urgent order; semi-join avoids materializing the join product.
    QueryDef(
      "q05_semi_join",
      (s, d) => {
        val c = T.customer(s, d)
        val o = T.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        ORDER BY c_custkey""")),

    // ---- q06: left-anti join (NOT EXISTS) — customers with no orders.
    QueryDef(
      "q06_anti_join",
      (s, d) => {
        val c = T.customer(s, d)
        val o = T.orders(s, d)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey""")),

    // ---- q07: window top-k per group — row_number with a unique
    // tiebreak (orderkey) so results are deterministic in both engines.
    QueryDef(
      "q07_topk_per_customer",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        T.orders(s, d)
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk"))
          .orderBy(col("o_custkey"), col("rk"))
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rk
          FROM orders) t
        WHERE rk <= 3
        ORDER BY o_custkey, rk"""),
      headline = true),

    // ---- q08: running-total window. The running sum is decimal-exact so
    // Spark's incremental accumulation and DuckDB's segment-tree
    // accumulation agree bit-for-bit — and the final decimal→double cast
    // goes through the SAME DECIMAL(27,4) re-scale as QueryDef.dsum
    // (half-up ROUND on the SQL side), because a direct (38,10)→double
    // cast is only exactly rounded while the unscaled value fits 2^53
    // (running quantities pass that around SF 30; see the dsum scaladoc).
    QueryDef(
      "q08_running_total",
      (s, d) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T.lineitem(s, d)
          .filter(col("l_suppkey") <= 10)
          .select(
            col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            sum(dec(col("l_quantity"))).over(w)
              .cast(DecimalType(27, 4)).cast(DoubleType).as("running_qty"))
          .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
      },
      Some("""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(38,10))) OVER (
                 PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                 AS DECIMAL(27,4)) AS DOUBLE) AS running_qty
        FROM lineitem
        WHERE l_suppkey <= 10
        ORDER BY l_suppkey, l_orderkey, l_linenumber""")),

    // ---- q09: global sort + limit (top-k). Spark executes this as a
    // TakeOrderedAndProject — no full sort materialization.
    QueryDef(
      "q09_global_topk",
      (s, d) =>
        T.orders(s, d)
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(100)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 100""")),

    // ---- q10: distinct (shuffle dedup on the grouping key).
    QueryDef(
      "q10_distinct",
      (s, d) =>
        T.customer(s, d)
          .select(col("c_mktsegment"), col("c_nationkey"))
          .distinct()
          .orderBy(col("c_mktsegment"), col("c_nationkey")),
      Some("""
        SELECT DISTINCT c_mktsegment, c_nationkey
        FROM customer
        ORDER BY c_mktsegment, c_nationkey""")),

    // ---- q11/q12/q13: set operations.
    QueryDef(
      "q11_union",
      (s, d) => {
        val a = T.customer(s, d).filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
        val b = T.customer(s, d).filter(col("c_acctbal") > 9000.0).select(col("c_custkey").as("k"))
        a.union(b).distinct().orderBy(col("k"))
      },
      Some("""
        SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000.0
        ORDER BY k""")),

    QueryDef(
      "q12_intersect",
      (s, d) => {
        val a = T.customer(s, d).filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
        val b = T.orders(s, d).filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
        a.intersect(b).orderBy(col("k"))
      },
      Some("""
        SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        ORDER BY k""")),

    QueryDef(
      "q13_except",
      (s, d) => {
        val a = T.customer(s, d).filter(col("c_mktsegment") === "MACHINERY").select(col("c_custkey").as("k"))
        val b = T.orders(s, d).filter(col("o_orderpriority") === "5-LOW").select(col("o_custkey").as("k"))
        a.except(b).orderBy(col("k"))
      },
      Some("""
        SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'MACHINERY'
        EXCEPT
        SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '5-LOW'
        ORDER BY k""")),

    // ---- q14: rollup (hierarchical grouping sets). NULLS FIRST ordering
    // matches Spark's ascending default.
    QueryDef(
      "q14_rollup",
      (s, d) =>
        T.lineitem(s, d)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some(s"""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               ${dsumSql("l_quantity")} AS qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // ---- q15: cube.
    QueryDef(
      "q15_cube",
      (s, d) =>
        T.orders(s, d)
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
      Some(s"""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               ${dsumSql("o_totalprice")} AS total
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    // ---- q16: SQL passthrough — the reference's `--query` surface
    // (`cli/src/main.rs:54-58`): arbitrary SQL executed by the engine,
    // here with GROUPING SETS to cover the third grouping-set form.
    QueryDef(
      "q16_sql_grouping_sets",
      (s, d) => {
        T.orders(s, d).createOrReplaceTempView("orders_v")
        s.sql(s"""
          SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
          FROM orders_v
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")
      },
      Some("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    // ---- q17: group-filter (HAVING).
    QueryDef(
      "q17_having",
      (s, d) =>
        T.part(s, d)
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_parts"), davg(col("p_retailprice")).as("avg_price"))
          .filter(col("n_parts") > 20)
          .orderBy(col("p_brand")),
      Some(s"""
        SELECT p_brand, COUNT(*) AS n_parts, ${davgSql("p_retailprice")} AS avg_price
        FROM part
        GROUP BY p_brand
        HAVING COUNT(*) > 20
        ORDER BY p_brand""")),

    // ---- q18: scalar subquery — customers above the global mean balance.
    // The global aggregate is a 1-row broadcast; mean is decimal-exact so
    // the filter boundary is identical in both engines.
    QueryDef(
      "q18_scalar_subquery",
      (s, d) => {
        val c = T.customer(s, d)
        val avgBal = c.agg(davg(col("c_acctbal")).as("avg_bal"))
        c.join(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .select(col("c_custkey"), col("c_acctbal"))
          .orderBy(col("c_custkey"))
      },
      Some(s"""
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT ${davgSql("c_acctbal")} FROM customer)
        ORDER BY c_custkey""")),

    // ---- q19: conditional aggregation (CASE inside agg).
    QueryDef(
      "q19_case_agg",
      (s, d) =>
        T.orders(s, d)
          .groupBy(col("o_orderpriority"))
          .agg(
            sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_finished"),
            sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_open"),
            dsum(when(col("o_totalprice") > 100000.0, col("o_totalprice")).otherwise(lit(0.0))).as("big_total"))
          .orderBy(col("o_orderpriority")),
      Some(s"""
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
               ${dsumSql("CASE WHEN o_totalprice > 100000.0 THEN o_totalprice ELSE 0.0 END")} AS big_total
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // ---- q20: string scalar functions (projection-only; codegen'd).
    QueryDef(
      "q20_string_funcs",
      (s, d) =>
        T.part(s, d)
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("uname"),
            lower(col("p_brand")).as("lbrand"),
            length(col("p_name")).as("name_len"),
            substring(col("p_type"), 1, 5).as("type_prefix"),
            concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
            regexp_replace(col("p_name"), " ", "_").as("snake_name"))
          .orderBy(col("p_partkey")),
      Some("""
        SELECT p_partkey,
               UPPER(p_name) AS uname,
               LOWER(p_brand) AS lbrand,
               CAST(LENGTH(p_name) AS INT) AS name_len,
               SUBSTRING(p_type, 1, 5) AS type_prefix,
               CONCAT_WS('|', p_brand, p_type) AS brand_type,
               REGEXP_REPLACE(p_name, ' ', '_', 'g') AS snake_name
        FROM part
        ORDER BY p_partkey""")),

    // ---- q21: date/time functions + aggregation by calendar bucket.
    QueryDef(
      "q21_date_funcs",
      (s, d) =>
        T.orders(s, d)
          .groupBy(
            year(col("o_orderdate")).as("y"),
            month(col("o_orderdate")).as("m"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("y"), col("m")),
      Some(s"""
        SELECT CAST(YEAR(o_orderdate) AS INT) AS y, CAST(MONTH(o_orderdate) AS INT) AS m,
               COUNT(*) AS n_orders, ${dsumSql("o_totalprice")} AS total
        FROM orders
        GROUP BY 1, 2
        ORDER BY y, m""")),

    // ---- q22: pivot (wide conditional aggregation).
    QueryDef(
      "q22_pivot",
      (s, d) =>
        T.orders(s, d)
          .groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .count()
          .na.fill(0L, Seq("F", "O", "P"))
          .orderBy(col("o_orderpriority")),
      Some("""
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // ---- q23: theta / banded join — parts against a tiny literal
    // bucket dimension via non-equi BETWEEN condition (broadcast NLJ).
    QueryDef(
      "q23_theta_band_join",
      (s, d) => {
        import s.implicits._
        val buckets = Seq(
          (0, 10, "small"), (11, 25, "medium"), (26, 40, "large"), (41, 1000, "xlarge"))
          .toDF("lo", "hi", "size_class")
        T.part(s, d)
          .join(broadcast(buckets),
            col("p_size") >= col("lo") && col("p_size") <= col("hi"))
          .groupBy(col("size_class"))
          .agg(count(lit(1)).as("n"), davg(col("p_retailprice")).as("avg_price"))
          .orderBy(col("size_class"))
      },
      Some(s"""
        SELECT size_class, COUNT(*) AS n, ${davgSql("p_retailprice")} AS avg_price
        FROM part
        JOIN (VALUES (0,10,'small'),(11,25,'medium'),(26,40,'large'),(41,1000,'xlarge'))
             AS b(lo, hi, size_class)
          ON p_size >= lo AND p_size <= hi
        GROUP BY size_class
        ORDER BY size_class""")),

    // ---- q24: as-of join — for each purchase event, the most recent
    // click by the same user at or before it. Implemented as a single
    // window pass over the union (one shuffle on user_id, no self-join
    // blowup) — the scalable formulation of ASOF JOIN. Timestamps are
    // truncated to milliseconds in both engines so the ns-vs-µs storage
    // difference cannot flip any comparison.
    QueryDef(
      "q24_asof_join",
      (s, d) => {
        val ev = T.events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(
            col("event_id"), col("user_id"), col("event_type"),
            date_trunc("millisecond", col("ts")).as("mts"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("mts").asc, col("is_click").desc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.withColumn("is_click", (col("event_type") === "click").cast("int"))
          .withColumn("prev_click_ms",
            last(when(col("is_click") === 1, unix_millis(col("mts"))), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("prev_click_ms"))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT e.event_id, e.user_id,
               (SELECT MAX(epoch_ms(date_trunc('millisecond', CAST(c.ts AS TIMESTAMP))))
                FROM events c
                WHERE c.user_id = e.user_id AND c.event_type = 'click'
                  AND date_trunc('millisecond', CAST(c.ts AS TIMESTAMP))
                      <= date_trunc('millisecond', CAST(e.ts AS TIMESTAMP))) AS prev_click_ms
        FROM events e
        WHERE e.event_type = 'purchase'
        ORDER BY e.event_id""")),

    // ---- q25: count distinct + exact distinct-per-group.
    QueryDef(
      "q25_count_distinct",
      (s, d) =>
        T.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(col("l_partkey")).as("n_part"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("l_returnflag")),
      Some("""
        SELECT l_returnflag,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT l_partkey) AS n_part,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag"""),
      headline = true),

    // ---- q26: correlated-style per-group max join-back (TPC-H Q2 shape):
    // max acctbal per nation, then the suppliers achieving it.
    QueryDef(
      "q26_groupwise_max",
      (s, d) => {
        val sup = T.supplier(s, d)
        val mx = sup.groupBy(col("s_nationkey").as("mk"))
          .agg(max(col("s_acctbal")).as("max_bal"))
        sup.join(broadcast(mx),
            col("s_nationkey") === col("mk") && col("s_acctbal") === col("max_bal"))
          .select(col("s_nationkey"), col("s_suppkey"), col("s_acctbal"))
          .orderBy(col("s_nationkey"), col("s_suppkey"))
      },
      Some("""
        SELECT s_nationkey, s_suppkey, s_acctbal
        FROM supplier s
        JOIN (SELECT s_nationkey AS mk, MAX(s_acctbal) AS max_bal
              FROM supplier GROUP BY s_nationkey) m
          ON s.s_nationkey = m.mk AND s.s_acctbal = m.max_bal
        ORDER BY s_nationkey, s_suppkey""")),

    // ---- q27: full outer join with coalesced keys.
    QueryDef(
      "q27_full_outer_join",
      (s, d) => {
        val byC = T.orders(s, d).filter(col("o_orderstatus") === "P")
          .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n_pending"))
        val byB = T.customer(s, d).filter(col("c_acctbal") < 0)
          .select(col("c_custkey").as("k"), lit(1L).as("overdrawn"))
        byC.join(byB, Seq("k"), "full_outer")
          .select(col("k"), coalesce(col("n_pending"), lit(0L)).as("n_pending"),
                  coalesce(col("overdrawn"), lit(0L)).as("overdrawn"))
          .orderBy(col("k"))
      },
      Some("""
        SELECT COALESCE(a.k, b.k) AS k,
               COALESCE(a.n_pending, 0) AS n_pending,
               COALESCE(b.overdrawn, 0) AS overdrawn
        FROM (SELECT o_custkey AS k, COUNT(*) AS n_pending FROM orders
              WHERE o_orderstatus = 'P' GROUP BY o_custkey) a
        FULL OUTER JOIN (SELECT c_custkey AS k, CAST(1 AS BIGINT) AS overdrawn FROM customer
              WHERE c_acctbal < 0) b
          ON a.k = b.k
        ORDER BY k""")),

    // ---- q28: lag/lead windows over the events stream.
    QueryDef(
      "q28_lag_lead",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("mts").asc, col("event_id").asc)
        T.events(s, d)
          .filter(col("user_id") <= 50)
          .select(col("event_id"), col("user_id"), col("event_type"),
                  unix_millis(date_trunc("millisecond", col("ts"))).as("mts"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .withColumn("gap_ms", col("mts") - lag(col("mts"), 1).over(w))
          .select(col("event_id"), col("user_id"), col("prev_type"), col("next_type"), col("gap_ms"))
          .orderBy(col("event_id"))
      },
      Some("""
        SELECT event_id, user_id,
               LAG(event_type, 1) OVER w AS prev_type,
               LEAD(event_type, 1) OVER w AS next_type,
               mts - LAG(mts, 1) OVER w AS gap_ms
        FROM (SELECT event_id, user_id, event_type,
                     epoch_ms(date_trunc('millisecond', CAST(ts AS TIMESTAMP))) AS mts
              FROM events WHERE user_id <= 50) e
        WINDOW w AS (PARTITION BY user_id ORDER BY mts ASC, event_id ASC)
        ORDER BY event_id""")),

    // ---- q29: JSON extraction from the events props column.
    QueryDef(
      "q29_json_extract",
      (s, d) =>
        T.events(s, d)
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").cast(IntegerType).as("k_val"))
          .filter(col("k_val") >= 50)
          .orderBy(col("event_id")),
      Some("""
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k_val
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 50
        ORDER BY event_id""")),

    // ---- q30: sessionization — classic event-stream gap analysis: a new
    // session starts after a >30-minute silence; one window pass, then a
    // running count of session starts (all integer arithmetic → exact).
    QueryDef(
      "q30_sessionize",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("mts"), col("event_id"))
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T.events(s, d)
          .select(col("event_id"), col("user_id"),
            unix_millis(date_trunc("millisecond", col("ts"))).as("mts"))
          .withColumn("new_sess",
            when(col("mts") - lag(col("mts"), 1).over(w) > 30L * 60000L, 1L)
              .when(lag(col("mts"), 1).over(w).isNull, 1L).otherwise(0L))
          .withColumn("session_no", sum(col("new_sess")).over(wRun))
          .groupBy(col("user_id"), col("session_no"))
          .agg(count(lit(1)).as("n_events"), min(col("mts")).as("start_ms"), max(col("mts")).as("end_ms"))
          .orderBy(col("user_id"), col("session_no"))
      },
      Some("""
        WITH e AS (
          SELECT event_id, user_id,
                 epoch_ms(date_trunc('millisecond', CAST(ts AS TIMESTAMP))) AS mts
          FROM events),
        flagged AS (
          SELECT *, CASE WHEN mts - LAG(mts, 1) OVER w > 30 * 60000 THEN 1
                         WHEN LAG(mts, 1) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY mts, event_id)),
        sess AS (
          SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY mts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
          FROM flagged)
        SELECT user_id, session_no, COUNT(*) AS n_events,
               MIN(mts) AS start_ms, MAX(mts) AS end_ms
        FROM sess
        GROUP BY user_id, session_no
        ORDER BY user_id, session_no"""),
      headline = true),

    // ---- q31: approx_count_distinct (HyperLogLog++). Sketch estimates
    // are engine-specific, so the raw estimate has no DuckDB twin;
    // instead the query emits the exact distinct count alongside a
    // within-tolerance flag for the sketch (rsd=0.02, checked at 5× —
    // wide enough that dataset-dependent drift at other scale factors
    // cannot flip a correct run, tight enough that a broken sketch
    // still fails), which IS oracle-checkable: DuckDB recomputes the
    // exact count and expects the flag true.
    QueryDef(
      "q31_approx_count_distinct",
      (s, d) =>
        T.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("exact_parts"),
            approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx"))
          .select(col("l_returnflag"), col("exact_parts"),
            (abs(col("approx") - col("exact_parts")) <=
              col("exact_parts") * lit(0.10)).as("approx_within_10pct"))
          .orderBy(col("l_returnflag")),
      Some("""
        SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
               true AS approx_within_10pct
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- q32: two-phase salted aggregation — the skew-mitigation plan
    // shape for heavy grouping keys (l_returnflag has 3 values → at
    // 100 TB a plain groupBy funnels the corpus through 3 reducers).
    // Phase 1 fans each key across 16 salts (decimal partials stay
    // exact); phase 2 combines partials. Result is bit-identical to the
    // unsalted plan, so the oracle is the plain GROUP BY.
    QueryDef(
      "q32_salted_agg",
      (s, d) => {
        val salted = T.lineitem(s, d)
          .withColumn("salt", pmod(hash(col("l_orderkey")), lit(16)))
          .groupBy(col("l_returnflag"), col("salt"))
          .agg(sum(dec(col("l_quantity"))).as("part_qty"),
               count(lit(1)).as("part_n"))
        salted.groupBy(col("l_returnflag"))
          .agg(
            sum(col("part_qty")).cast(DecimalType(27, 4)).cast(DoubleType).as("sum_qty"),
            sum(col("part_n")).as("n_rows"))
          .orderBy(col("l_returnflag"))
      },
      Some(s"""
        SELECT l_returnflag,
               ${dsumSql("l_quantity")} AS sum_qty,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // ---- q33: RANGE window frames + first_value/ntile — the
    // value-based frame family (rowsBetween is covered by q08/q24/q30).
    // The 7-day trailing count uses a RANGE frame over epoch-days.
    QueryDef(
      "q33_range_frame",
      (s, d) => {
        val base = T.lineitem(s, d)
          .filter(col("l_suppkey") <= 5)
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            (unix_micros(col("l_shipdate").cast(TimestampType)) / lit(86400000000L))
              .cast(LongType).as("ship_day"))
        val wRange = Window.partitionBy(col("l_suppkey")).orderBy(col("ship_day"))
          .rangeBetween(-6, Window.currentRow)
        val wOrder = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("ship_day"), col("l_orderkey"), col("l_linenumber"))
        base
          .withColumn("n_7day", count(lit(1)).over(wRange))
          .withColumn("first_day", first(col("ship_day")).over(wOrder))
          .withColumn("quartile", ntile(4).over(wOrder))
          .orderBy(col("l_suppkey"), col("ship_day"), col("l_orderkey"), col("l_linenumber"))
      },
      Some("""
        SELECT l_suppkey, l_orderkey, l_linenumber, ship_day,
               COUNT(*) OVER (PARTITION BY l_suppkey ORDER BY ship_day
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS n_7day,
               FIRST_VALUE(ship_day) OVER w AS first_day,
               CAST(NTILE(4) OVER w AS INT) AS quartile
        FROM (SELECT l_suppkey, l_orderkey, l_linenumber,
                     CAST(epoch_us(l_shipdate) // 86400000000 AS BIGINT) AS ship_day
              FROM lineitem WHERE l_suppkey <= 5) t
        WINDOW w AS (PARTITION BY l_suppkey ORDER BY ship_day, l_orderkey, l_linenumber)
        ORDER BY l_suppkey, ship_day, l_orderkey, l_linenumber""")),

    // ---- q34: exact median (half-sums of doubles ending in .0/.5 are
    // exact in both engines, so the interpolated value hash-matches).
    QueryDef(
      "q34_median",
      (s, d) =>
        T.lineitem(s, d)
          .groupBy(col("l_linestatus"))
          .agg(median(col("l_quantity")).as("median_qty"),
               count(lit(1)).as("n"))
          .orderBy(col("l_linestatus")),
      Some("""
        SELECT l_linestatus, median(l_quantity) AS median_qty, COUNT(*) AS n
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // ---- q35: the full rank family — rank/dense_rank/percent_rank/
    // cume_dist (row_number covered by q07). The ratios are exact
    // small-integer divisions, bit-stable across engines.
    QueryDef(
      "q35_rank_family",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        T.orders(s, d)
          .filter(col("o_custkey") <= 100)
          .select(col("o_orderpriority"), col("o_orderkey"),
            rank().over(w).as("rk"),
            dense_rank().over(w).as("drk"),
            percent_rank().over(w).as("prk"),
            cume_dist().over(w).as("cd"))
          .orderBy(col("o_orderpriority"), col("rk"), col("o_orderkey"))
      },
      Some("""
        SELECT o_orderpriority, o_orderkey,
               CAST(RANK() OVER w AS INT) AS rk,
               CAST(DENSE_RANK() OVER w AS INT) AS drk,
               PERCENT_RANK() OVER w AS prk,
               CUME_DIST() OVER w AS cd
        FROM orders WHERE o_custkey <= 100
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey ASC)
        ORDER BY o_orderpriority, rk, o_orderkey""")),

    // ---- q36: map construction + lookup on a fact table —
    // collect_list→array_sort→map_from_entries builds a per-group
    // MAP⟨status,count⟩, then element_at/size query it (the §2.4
    // array/map scalar-function row). The map rides a single groupBy
    // shuffle; the driver-visible projection canonicalizes it to a
    // key-sorted string (nested cells can't be driver-hashed).
    QueryDef(
      "q36_map_funcs",
      (s, d) => {
        val counts = T.lineitem(s, d)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"))
        counts.groupBy(col("l_returnflag"))
          .agg(map_from_entries(array_sort(
            collect_list(struct(col("l_linestatus"), col("n"))))).as("m"))
          .select(col("l_returnflag"),
            QueryDef.canonMap(col("m")).as("status_counts"),
            coalesce(element_at(col("m"), lit("O")), lit(0L)).as("n_open"),
            size(col("m")).as("n_statuses"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        WITH c AS (
          SELECT l_returnflag, l_linestatus, COUNT(*) AS n
          FROM lineitem GROUP BY l_returnflag, l_linestatus)
        SELECT l_returnflag,
               '{' || string_agg(l_linestatus || ':' || n, ',' ORDER BY l_linestatus) || '}' AS status_counts,
               CAST(COALESCE(MAX(CASE WHEN l_linestatus = 'O' THEN n END), 0) AS BIGINT) AS n_open,
               CAST(COUNT(*) AS INT) AS n_statuses
        FROM c GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- q37: approx_percentile (GK sketch) validated like q31 — the
    // query emits the EXACT interpolated p90 (which DuckDB recomputes
    // with quantile_cont; q34 already established the interpolation
    // formulas agree) plus a tolerance flag for the sketch. A sketch
    // drifting past its accuracy bound flips the flag and fails.
    QueryDef(
      "q37_approx_percentile",
      (s, d) =>
        T.lineitem(s, d)
          .groupBy(col("l_linestatus"))
          .agg(
            percentile(col("l_quantity"), lit(0.9)).as("p90_exact"),
            percentile_approx(col("l_quantity"), lit(0.9), lit(10000)).as("p90_approx"))
          .select(col("l_linestatus"), col("p90_exact"),
            (abs(col("p90_approx") - col("p90_exact")) <=
              abs(col("p90_exact")) * lit(0.05) + lit(0.5)).as("approx_close"))
          .orderBy(col("l_linestatus")),
      Some("""
        SELECT l_linestatus, quantile_cont(l_quantity, 0.9) AS p90_exact,
               true AS approx_close
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // ---- q38: correlated EXISTS / NOT EXISTS — Catalyst's subquery
    // DECORRELATION surface (RewritePredicateSubquery turns these into
    // a left-semi and a left-anti join on o_custkey; q05/q06 build the
    // same joins by hand, this proves the declarative spelling lands on
    // the identical physical plan).
    QueryDef(
      "q38_exists_subquery",
      (s, d) => {
        T.customer(s, d).createOrReplaceTempView("customer_v")
        T.orders(s, d).createOrReplaceTempView("orders_v")
        s.sql("""
          SELECT c_custkey, c_name
          FROM customer_v c
          WHERE EXISTS (SELECT 1 FROM orders_v o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_totalprice > 200000)
            AND NOT EXISTS (SELECT 1 FROM orders_v o2
                            WHERE o2.o_custkey = c.c_custkey
                              AND o2.o_orderstatus = 'F')
          ORDER BY c_custkey""")
      },
      Some("""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 200000)
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderstatus = 'F')
        ORDER BY c_custkey""")),

    // ---- q39: first_value / last_value / nth_value window navigation —
    // the frame-edge accessors (the rank/lag families are q28/q35; this
    // completes the navigation-function surface). last_value reads the
    // FULL partition frame (the default running frame is the classic
    // silent-wrong-answer); nth_value(_, 2) is NULL for 1-order
    // customers, exercising frame-edge null semantics.
    QueryDef(
      "q39_window_navigation",
      (s, d) => {
        val full = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        T.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
            first(col("o_totalprice")).over(full).as("first_price"),
            last(col("o_totalprice")).over(full).as("last_price"),
            nth_value(col("o_totalprice"), 2).over(full).as("second_price"))
          .filter(col("o_custkey") % 100 === 0)
          .orderBy(col("o_orderkey"))
      },
      Some("""
        SELECT o_orderkey, o_custkey,
               FIRST_VALUE(o_totalprice) OVER w AS first_price,
               LAST_VALUE(o_totalprice) OVER w AS last_price,
               NTH_VALUE(o_totalprice, 2) OVER w AS second_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC, o_orderkey ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        QUALIFY o_custkey % 100 = 0
        ORDER BY o_orderkey""")),

    // ---- q40: quiet-gap event dedup — [[dedupEventsQuietGap]] at a
    // 1-day window over (user, event_type): the retry-storm /
    // double-fire collapse every event pipeline ships (an event is a
    // duplicate when ANY same-key event precedes it within the window —
    // the lag spelling, so a burst collapses to its first event plus
    // whatever re-fires after a full quiet gap). One key-partitioned
    // window, the q30 shuffle class. The oracle replays the
    // microsecond-epoch lag compare verbatim; at sf0.01 the 1-day
    // window drops ~36% of events and keeps every first-of-key.
    QueryDef(
      "q40_event_quiet_gap",
      (s, d) =>
        dedupEventsQuietGap(T.events(s, d), Seq("user_id", "event_type"),
          "ts", "event_id", windowSec = 86400L)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("ts"))
          .orderBy(col("event_id")),
      Some("""
        WITH e AS (
          SELECT event_id, user_id, event_type, ts,
                 epoch_us(CAST(ts AS TIMESTAMP))
                   - LAG(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER
                     (PARTITION BY user_id, event_type
                      ORDER BY ts, event_id) AS gap_us
          FROM events)
        SELECT event_id, user_id, event_type, ts
        FROM e WHERE gap_us IS NULL
           OR gap_us > CAST(86400 AS BIGINT) * 1000000
        ORDER BY event_id""")),

    // ---- q41: CDC apply — [[cdcApply]] with the events table read as
    // a per-user changelog: latest (ts, event_id) version wins,
    // 'error' is the tombstone (a user whose LAST event errored holds
    // no current state). The oracle replays the descending version
    // window and the null-safe tombstone filter.
    QueryDef(
      "q41_cdc_apply",
      (s, d) =>
        cdcApply(T.events(s, d), keyCols = Seq("user_id"),
          seqCols = Seq("ts", "event_id"), opCol = "event_type",
          deleteOp = "error")
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("ts"), col("value"))
          .orderBy(col("user_id")),
      Some("""
        WITH ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rk
          FROM events)
        SELECT user_id, event_id, event_type, ts, value
        FROM ranked
        WHERE rk = 1 AND event_type IS DISTINCT FROM 'error'
        ORDER BY user_id"""))
    ,

    // ---- q42: SCD Type-2 merge — [[scd2Merge]] folding a mutated
    // customer snapshot (every 7th key's balance +100; every 3rd key
    // deleted; odd keys newly inserted) into a snapshot-1 history:
    // all five arms (stay-open / close-changed / reopen-changed /
    // close-deleted / insert) populate. The oracle replays the
    // full-outer key join and every arm's null-safe attr compare.
    QueryDef(
      "q42_scd2_merge",
      (s, d) => {
        val cust = T.customer(s, d)
        def snap(df: org.apache.spark.sql.DataFrame) = df.select(
          col("c_custkey").as("k"),
          col("c_acctbal").cast(DoubleType).as("bal"),
          col("c_mktsegment").as("seg"))
        val h1 = snap(cust.filter(col("c_custkey") % 2 === 0))
          .withColumn("valid_from", lit(1L))
          .withColumn("valid_to", lit(null).cast(LongType))
        val s2 = cust.filter(col("c_custkey") % 3 =!= 0).select(
          col("c_custkey").as("k"),
          (col("c_acctbal").cast(DoubleType) +
            when(col("c_custkey") % 7 === 0, 100.0).otherwise(0.0)).as("bal"),
          col("c_mktsegment").as("seg"))
        scd2Merge(h1, s2, Seq("k"), Seq("bal", "seg"), snapshotId = 2L)
          .orderBy(col("k"), col("valid_from"), col("valid_to"))
      },
      Some("""
        WITH s1 AS (
          SELECT c_custkey AS k, CAST(c_acctbal AS DOUBLE) AS bal,
                 c_mktsegment AS seg
          FROM customer WHERE c_custkey % 2 = 0),
        s2 AS (
          SELECT c_custkey AS k,
                 CAST(c_acctbal AS DOUBLE) +
                   CASE WHEN c_custkey % 7 = 0 THEN 100.0 ELSE 0.0 END AS bal,
                 c_mktsegment AS seg
          FROM customer WHERE c_custkey % 3 <> 0),
        j AS (
          SELECT h.k AS hk, h.bal AS hbal, h.seg AS hseg,
                 s.k AS sk, s.bal AS sbal, s.seg AS sseg
          FROM s1 h FULL OUTER JOIN s2 s ON h.k = s.k),
        merged AS (
          SELECT hk AS k, hbal AS bal, hseg AS seg,
                 CAST(1 AS BIGINT) AS valid_from,
                 CAST(NULL AS BIGINT) AS valid_to
          FROM j WHERE hk IS NOT NULL AND sk IS NOT NULL
            AND hbal IS NOT DISTINCT FROM sbal
            AND hseg IS NOT DISTINCT FROM sseg
          UNION ALL
          SELECT hk, hbal, hseg, CAST(1 AS BIGINT), CAST(2 AS BIGINT)
          FROM j WHERE hk IS NOT NULL AND (sk IS NULL
            OR hbal IS DISTINCT FROM sbal OR hseg IS DISTINCT FROM sseg)
          UNION ALL
          SELECT sk, sbal, sseg, CAST(2 AS BIGINT), CAST(NULL AS BIGINT)
          FROM j WHERE sk IS NOT NULL AND (hk IS NULL
            OR hbal IS DISTINCT FROM sbal OR hseg IS DISTINCT FROM sseg))
        SELECT k, bal, seg, valid_from, valid_to
        FROM merged ORDER BY k, valid_from, valid_to""")),

    // ---- q43: funnel analysis — [[funnelSteps]] over the canonical
    // view → click → purchase sequence. The oracle replays the greedy
    // earliest-completion chain as per-step min-join CTEs (strict >,
    // so simultaneous events never advance the funnel).
    QueryDef(
      "q43_funnel",
      (s, d) =>
        funnelSteps(T.events(s, d), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase")),
      Some("""
        WITH ev AS (
          -- µs truncation up front (CAST, the q40/q44 stance): on a
          -- nanos-precision events file the raw ts would compare at ns
          -- while Spark floors to µs, and a sub-µs gap would advance
          -- the funnel in one engine only
          SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE ts IS NOT NULL),
        t1 AS (
          SELECT user_id, MIN(ts) AS t FROM ev
          WHERE event_type = 'view' GROUP BY user_id),
        t2 AS (
          SELECT e.user_id, MIN(e.ts) AS t
          FROM ev e JOIN t1 ON e.user_id = t1.user_id
          WHERE e.event_type = 'click' AND e.ts > t1.t
          GROUP BY e.user_id),
        t3 AS (
          SELECT e.user_id, MIN(e.ts) AS t
          FROM ev e JOIN t2 ON e.user_id = t2.user_id
          WHERE e.event_type = 'purchase' AND e.ts > t2.t
          GROUP BY e.user_id)
        SELECT CAST(1 AS INTEGER) AS step_no, 'view' AS step,
               CAST(COUNT(*) AS BIGINT) AS n_keys FROM t1
        UNION ALL
        SELECT CAST(2 AS INTEGER), 'click', CAST(COUNT(*) AS BIGINT) FROM t2
        UNION ALL
        SELECT CAST(3 AS INTEGER), 'purchase', CAST(COUNT(*) AS BIGINT) FROM t3
        ORDER BY step_no""")),

    // ---- q44: retention cohorts — [[retentionCohorts]] at weekly
    // periods. The oracle replays the exact integer epoch-µs floor
    // division (the pmod-subtraction spelling, matching the Spark
    // column verbatim), the per-key min cohort and the offset counts.
    QueryDef(
      "q44_retention",
      (s, d) => retentionCohorts(T.events(s, d), "user_id", "ts",
        periodSec = 604800L),
      Some("""
        WITH u AS (
          SELECT user_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events WHERE ts IS NOT NULL),
        act AS (
          SELECT DISTINCT user_id,
                 (us - ((us % 604800000000) + 604800000000) % 604800000000)
                   // 604800000000 AS p
          FROM u),
        cohorts AS (
          SELECT user_id, MIN(p) AS c FROM act GROUP BY user_id)
        SELECT c AS cohort_period, CAST(p - c AS BIGINT) AS period_offset,
               CAST(COUNT(*) AS BIGINT) AS n_active
        FROM act JOIN cohorts USING (user_id)
        GROUP BY c, p - c
        ORDER BY cohort_period, period_offset""")),

    // ---- q45: within-window funnel — [[funnelStepsWithin]] with a
    // 7-day conversion window anchored at the key's first-touch entry.
    // The oracle replays the q43 greedy min-join chain plus the ONE
    // extra deadline predicate (epoch-µs inclusive ≤), so the gate
    // certifies the window actually prunes conversions (at sf0.01 the
    // events fixture spans months — step-2/3 counts drop below q43's).
    QueryDef(
      "q45_funnel_window",
      (s, d) =>
        funnelStepsWithin(T.events(s, d), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"), withinSec = 604800L),
      Some("""
        WITH ev AS (
          SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE ts IS NOT NULL),
        t1 AS (
          SELECT user_id, MIN(ts) AS t, epoch_us(MIN(ts)) AS entry
          FROM ev WHERE event_type = 'view' GROUP BY user_id),
        t2 AS (
          SELECT e.user_id, MIN(e.ts) AS t, ANY_VALUE(t1.entry) AS entry
          FROM ev e JOIN t1 ON e.user_id = t1.user_id
          WHERE e.event_type = 'click' AND e.ts > t1.t
            AND epoch_us(e.ts) <= t1.entry + 604800000000
          GROUP BY e.user_id),
        t3 AS (
          SELECT e.user_id, MIN(e.ts) AS t
          FROM ev e JOIN t2 ON e.user_id = t2.user_id
          WHERE e.event_type = 'purchase' AND e.ts > t2.t
            AND epoch_us(e.ts) <= t2.entry + 604800000000
          GROUP BY e.user_id)
        SELECT CAST(1 AS INTEGER) AS step_no, 'view' AS step,
               CAST(COUNT(*) AS BIGINT) AS n_keys FROM t1
        UNION ALL
        SELECT CAST(2 AS INTEGER), 'click', CAST(COUNT(*) AS BIGINT) FROM t2
        UNION ALL
        SELECT CAST(3 AS INTEGER), 'purchase', CAST(COUNT(*) AS BIGINT) FROM t3
        ORDER BY step_no""")),

    // ---- q46: dual-grain retention — weekly cohorts read at DAY
    // granularity (ratio 7), the standard product retention chart. The
    // oracle replays the day buckets, the nested-floor cohort
    // derivation (⌊pmin/7⌋ via the pmod spelling) and the
    // day-since-cohort-start offsets, all int64.
    QueryDef(
      "q46_retention_daily",
      (s, d) => retentionCohorts(T.events(s, d), "user_id", "ts",
        cohortPeriodSec = 604800L, activityPeriodSec = 86400L),
      Some("""
        WITH u AS (
          SELECT user_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events WHERE ts IS NOT NULL),
        act AS (
          SELECT DISTINCT user_id,
                 (us - ((us % 86400000000) + 86400000000) % 86400000000)
                   // 86400000000 AS p
          FROM u),
        cohorts AS (
          SELECT user_id,
                 (pm - ((pm % 7) + 7) % 7) // 7 AS c
          FROM (SELECT user_id, MIN(p) AS pm FROM act GROUP BY user_id))
        SELECT c AS cohort_period, CAST(p - c * 7 AS BIGINT) AS period_offset,
               CAST(COUNT(*) AS BIGINT) AS n_active
        FROM act JOIN cohorts USING (user_id)
        GROUP BY c, p - c * 7
        ORDER BY cohort_period, period_offset""")),

    // ---- q47: anchor-exact within-window funnel —
    // [[funnelStepsAnchored]] with the q45 window (7 days): ∃ over
    // step-1 anchors instead of the first-touch anchor, so keys whose
    // first view timed out but whose later view converts ARE counted
    // (at sf0.01: 150/150/150 vs q45's 150/144/126 — every fixture key
    // has SOME anchor that converts, so the gate certifies both the
    // semantic divergence from first-touch and the greedy per-anchor
    // chase against the oracle's replay; RelationalSpec covers the
    // partial-conversion shapes). The oracle keys every min-join CTE
    // by (user_id, t1) and counts distinct keys.
    QueryDef(
      "q47_funnel_anchored",
      (s, d) =>
        funnelStepsAnchored(T.events(s, d), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"), withinSec = 604800L),
      Some("""
        WITH ev AS (
          SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events WHERE ts IS NOT NULL),
        t1 AS (
          SELECT DISTINCT user_id, us AS t1 FROM ev
          WHERE event_type = 'view'),
        s2 AS (
          SELECT e.user_id, t1.t1, MIN(e.us) AS t
          FROM ev e JOIN t1 ON e.user_id = t1.user_id
          WHERE e.event_type = 'click' AND e.us > t1.t1
            AND e.us <= t1.t1 + 604800000000
          GROUP BY e.user_id, t1.t1),
        s3 AS (
          SELECT e.user_id, s2.t1, MIN(e.us) AS t
          FROM ev e JOIN s2 ON e.user_id = s2.user_id
          WHERE e.event_type = 'purchase' AND e.us > s2.t
            AND e.us <= s2.t1 + 604800000000
          GROUP BY e.user_id, s2.t1)
        SELECT CAST(1 AS INTEGER) AS step_no, 'view' AS step,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_keys FROM t1
        UNION ALL
        SELECT CAST(2 AS INTEGER), 'click',
               CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM s2
        UNION ALL
        SELECT CAST(3 AS INTEGER), 'purchase',
               CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM s3
        ORDER BY step_no""")),

    // ---- q48: data-quality constraint suite — [[checkConstraints]]
    // over lineitem: the five Deequ-style check families in one
    // report. The fixture's (l_orderkey, l_linenumber) is genuinely
    // NON-unique (11,785 duplicated keys at sf0.01), so the gate
    // certifies a real failing check next to passing ones — not just
    // the all-green shape. The oracle recomputes every scalar
    // independently (conditional counts, dup-group row sum, anti-join
    // orphan count).
    QueryDef(
      "q48_constraints",
      (s, d) => checkConstraints(T.lineitem(s, d), Seq(
        NotNull("l_orderkey"),
        InRange("l_quantity", lit(1.0), lit(50.0)),
        InSet("l_returnflag", Seq("A", "N", "R")),
        Unique(Seq("l_orderkey", "l_linenumber")),
        RefIntegrity(Seq("l_orderkey"), T.orders(s, d),
          Seq("o_orderkey")))),
      Some("""
        WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows
                   FROM lineitem),
        checks AS (
          SELECT 'not_null' AS check_type, 'l_orderkey' AS target,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
                  WHERE l_orderkey IS NULL) AS n_violations
          UNION ALL
          SELECT 'in_range', 'l_quantity',
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
                  WHERE l_quantity IS NOT NULL
                    AND (l_quantity < 1.0 OR l_quantity > 50.0))
          UNION ALL
          SELECT 'in_set', 'l_returnflag',
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
                  WHERE l_returnflag IS NOT NULL
                    AND l_returnflag NOT IN ('A', 'N', 'R'))
          UNION ALL
          SELECT 'unique', 'l_orderkey,l_linenumber',
                 (SELECT CAST(COALESCE(SUM(k), 0) AS BIGINT) FROM (
                    SELECT COUNT(*) AS k FROM lineitem
                    GROUP BY l_orderkey, l_linenumber
                    HAVING COUNT(*) > 1))
          UNION ALL
          SELECT 'ref_integrity', 'l_orderkey',
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
                  WHERE l.l_orderkey IS NOT NULL
                    AND NOT EXISTS (SELECT 1 FROM orders o
                                    WHERE o.o_orderkey = l.l_orderkey)))
        SELECT check_type, target, n.n_rows, n_violations,
               n_violations = 0 AS passed
        FROM checks CROSS JOIN n
        ORDER BY check_type, target""")),

    // ---- q49: resample + forward fill — [[resampleFfill]] on events
    // at 6-hour buckets (the 150-user/30-day fixture leaves real gaps
    // at that grain, so LOCF rows exist and `filled` is exercised both
    // ways). The oracle replays the µs floor-division buckets, the
    // rank-1 per-bucket pick, the per-key grid and the IGNORE NULLS
    // window fill.
    QueryDef(
      "q49_resample_ffill",
      (s, d) => resampleFfill(T.events(s, d), "user_id", "ts",
        "event_id", "value", periodSec = 21600L),
      Some("""
        WITH ev AS (
          SELECT user_id AS k, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                 event_id AS tie, value AS v
          FROM events WHERE ts IS NOT NULL),
        b AS (
          SELECT k, (us - ((us % 21600000000) + 21600000000)
                     % 21600000000) // 21600000000 AS b, us, tie, v
          FROM ev),
        obs AS (
          SELECT k, b, v FROM (
            SELECT k, b, v, row_number() OVER (
              PARTITION BY k, b ORDER BY us DESC, tie DESC) AS rn
            FROM b) WHERE rn = 1),
        span AS (SELECT k, MIN(b) AS b0, MAX(b) AS b1 FROM b GROUP BY k),
        grid AS (
          SELECT k, gb AS b
          FROM span, unnest(range(b0, b1 + 1)) t(gb))
        SELECT grid.k AS user_id,
               make_timestamp(grid.b * 21600000000) AS bucket_start,
               last_value(obs.v IGNORE NULLS) OVER (
                 PARTITION BY grid.k ORDER BY grid.b
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS value,
               obs.v IS NULL AS filled
        FROM grid LEFT JOIN obs ON grid.k = obs.k AND grid.b = obs.b
        ORDER BY user_id, bucket_start""")),

    // ---- q50: row-level violation flags — [[flagRowViolations]] over
    // lineitem with a range check that genuinely fires (quantity ≤ 25
    // splits the uniform 1..50 fixture roughly in half) next to
    // passing ones, so the gate certifies label order, the "" clean
    // spelling, and the NULL-skipping concat. The oracle replays each
    // CASE and the same NULL-skipping concat_ws.
    QueryDef(
      "q50_row_violations",
      (s, d) => flagRowViolations(T.lineitem(s, d), Seq(
        NotNull("l_shipdate"),
        InRange("l_quantity", lit(1.0), lit(25.0)),
        InSet("l_returnflag", Seq("A", "R"))))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("n_violated"), col("violated")),
      Some("""
        SELECT l_orderkey, l_linenumber,
               CAST((CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
                 + (CASE WHEN l_quantity IS NOT NULL
                         AND (l_quantity < 1.0 OR l_quantity > 25.0)
                    THEN 1 ELSE 0 END)
                 + (CASE WHEN l_returnflag IS NOT NULL
                         AND l_returnflag NOT IN ('A', 'R')
                    THEN 1 ELSE 0 END) AS INTEGER) AS n_violated,
               concat_ws(',',
                 CASE WHEN l_shipdate IS NULL
                      THEN 'not_null(l_shipdate)' END,
                 CASE WHEN l_quantity IS NOT NULL
                      AND (l_quantity < 1.0 OR l_quantity > 25.0)
                      THEN 'in_range(l_quantity)' END,
                 CASE WHEN l_returnflag IS NOT NULL
                      AND l_returnflag NOT IN ('A', 'R')
                      THEN 'in_set(l_returnflag)' END) AS violated
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber""")),

    // ---- q51: rolling z-score anomalies — [[rollingZscore]] over
    // each user's value series, 20-observation trailing window. The
    // oracle replays the decimal Σv/Σv² (the dsum ROUND/cast chain),
    // the non-null frame count, and the identical per-row IEEE z
    // arithmetic, so the double scores hash-match bit-for-bit.
    QueryDef(
      "q51_rolling_zscore",
      (s, d) => rollingZscore(T.events(s, d), "user_id", "ts",
        "event_id", "value", windowRows = 20)
        .select(col("user_id"), col("event_id"), col("value"),
          col("zscore"), col("is_anomaly")),
      Some(s"""
        WITH ev AS (
          SELECT user_id AS k, CAST(ts AS TIMESTAMP) AS ts,
                 event_id AS tie, value AS v
          FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        win AS (
          SELECT k, tie, v,
                 ${QueryDef.dwinSql("v",
                   "PARTITION BY k ORDER BY ts, tie " +
                   "ROWS BETWEEN 19 PRECEDING AND CURRENT ROW")} AS s,
                 ${QueryDef.dwinSql("v * v",
                   "PARTITION BY k ORDER BY ts, tie " +
                   "ROWS BETWEEN 19 PRECEDING AND CURRENT ROW")} AS q,
                 CAST(COUNT(v) OVER (PARTITION BY k ORDER BY ts, tie
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
                   AS DOUBLE) AS n
          FROM ev)
        SELECT k AS user_id, tie AS event_id, v AS value,
               CASE WHEN v IS NOT NULL AND n >= 2
                         AND (q / n - (s / n) * (s / n)) > 0
                    THEN (v - s / n) / sqrt(q / n - (s / n) * (s / n))
               END AS zscore,
               abs(CASE WHEN v IS NOT NULL AND n >= 2
                             AND (q / n - (s / n) * (s / n)) > 0
                        THEN (v - s / n) / sqrt(q / n - (s / n) * (s / n))
                   END) > 3.0 AS is_anomaly
        FROM win
        ORDER BY user_id, event_id"""))
  )

  /** CDC apply — materialize CURRENT state from a changelog (the
    * Debezium/Delta upsert-merge semantics every lakehouse pipeline
    * reimplements): keep, per key, the row with the highest
    * `seqCols` (latest version wins; ties break by the caller's own
    * tie columns — pass them IN seqCols), then drop keys whose latest
    * operation is the tombstone `deleteOp`. Stale versions never
    * survive and a resurrected key (insert after delete) comes back
    * because only the LATEST op is consulted — exactly once over the
    * log, idempotent under replay. A NULL op is NOT a tombstone (an
    * unclassified change keeps the row — dropping state on a parse
    * gap is the unsafe direction). One key-partitioned window — the
    * same shuffle class as any upsert-merge shuffle at 100 TB, and
    * keys process in parallel. Output: the surviving latest rows,
    * caller columns untouched. */
  def cdcApply(changelog: DataFrame, keyCols: Seq[String],
      seqCols: Seq[String], opCol: String, deleteOp: String): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must not be empty")
    require(seqCols.nonEmpty, "seqCols must not be empty (the version " +
      "order decides which row wins — include a tie-break column)")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(seqCols.map(c => col(c).desc): _*)
    changelog
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk")
      .filter(!(col(opCol) <=> lit(deleteOp)))
  }

  /** SCD Type-2 snapshot merge — the slowly-changing-dimension
    * history every warehouse maintains (Kimball SCD2): fold a new
    * dimension snapshot into a versioned history table whose rows
    * carry `[fromCol, toCol)` validity (open rows have NULL `toCol`).
    * Per key: attrs unchanged → the open row stays open; changed →
    * the open row CLOSES at `snapshotId` and a new open row begins
    * there; key absent from the snapshot → closed (a deletion);
    * new key → inserted open. Attribute comparison is NULL-safe
    * per column. Already-closed history passes through untouched —
    * the merge is idempotent over snapshots (re-merging the same
    * snapshot changes nothing). Plan shape: ONE full-outer key join
    * between the OPEN slice and the snapshot, then a single map pass
    * that emits 0–2 rows per joined key via an inline struct array +
    * explode — never one filtered arm per case over a recomputed
    * join. Keys shuffle once; AQE picks broadcast when the open
    * slice is small. */
  def scd2Merge(history: DataFrame, snapshot: DataFrame,
      keyCols: Seq[String], attrCols: Seq[String], snapshotId: Long,
      fromCol: String = "valid_from", toCol: String = "valid_to"): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must not be empty")
    require(attrCols.nonEmpty, "attrCols must not be empty")
    val outCols = keyCols ++ attrCols
    val closed = history.filter(col(toCol).isNotNull)
      .select((outCols :+ fromCol :+ toCol).map(col): _*)
    val open = history.filter(col(toCol).isNull)
    // per-side duplicate-key guards ride the plan (one window each —
    // the same key shuffle class as the join): TWO open rows for a key
    // (or a key twice in the snapshot) would fan the full-outer join
    // out and emit overlapping validity for that key with no error —
    // corrupted dimension history, the silent failure mode an SCD2
    // fold must not have (review r18.3)
    def dupGuard(side: String, prefix: String): Column = {
      val n = count(lit(1)).over(
        Window.partitionBy(keyCols.map(c => col(s"$prefix$c")): _*))
      when(n > 1, raise_error(concat(
        lit(s"scd2Merge: duplicate $side key "),
        concat_ws(",", keyCols.map(c => col(s"$prefix$c").cast(StringType)): _*),
        lit(s" — $side rows must be key-unique (dedup first)"))))
        .otherwise(lit(true))
    }
    val h0 = open.select(outCols.map(c => col(c).as(s"__h_$c"))
      :+ col(fromCol).cast(LongType).as("__h_from"): _*)
    // explicit presence flag: inferring presence from valid_from would
    // make an open row with a NULL valid_from vanish (review r18.3)
    val h = h0.withColumn("__h_present", dupGuard("open-history", "__h_"))
    val sn0 = snapshot.select(outCols.map(c => col(c).as(s"__s_$c")): _*)
    val sn = sn0.withColumn("__s_present", dupGuard("snapshot", "__s_"))
    val joined = h.join(sn,
      keyCols.map(k => col(s"__h_$k") <=> col(s"__s_$k")).reduce(_ && _),
      "full_outer")
    val inH = col("__h_present").isNotNull
    val inS = col("__s_present").isNotNull
    val same = attrCols.map(a => col(s"__h_$a") <=> col(s"__s_$a"))
      .reduce(_ && _)
    def row(side: String, from: Column, to: Column): Column =
      struct(outCols.map(c => col(s"__${side}_$c").as(c))
        :+ from.cast(LongType).as(fromCol)
        :+ to.cast(LongType).as(toCol): _*)
    // 0–2 output rows per joined key, one map pass: the open row
    // (kept open, or closed at snapshotId) and/or the new open row
    val rows = array(
      when(inH && inS && same, row("h", col("__h_from"), lit(null))),
      when(inH && (!inS || !same), row("h", col("__h_from"), lit(snapshotId))),
      when(inS && (!inH || !same), row("s", lit(snapshotId), lit(null))))
    val merged = joined
      .select(explode(filter(rows, r => r.isNotNull)).as("__r"))
      .select(outCols.map(c => col(s"__r.$c"))
        :+ col(s"__r.$fromCol") :+ col(s"__r.$toCol"): _*)
    closed.union(merged)
  }

  /** Funnel analysis — how many keys (users) complete each prefix of
    * an ordered step sequence (view → click → purchase …), the classic
    * product-analytics query: a key reaches step i when an event of
    * that type exists STRICTLY after its step-(i−1) completion time,
    * and taking the EARLIEST completion at every step is provably
    * optimal for existence (greedy earliest leaves maximal room for
    * later steps), so the per-step min is the whole algorithm.
    * Simultaneous events do not advance the funnel (strict >) — a
    * click logged in the same microsecond as the view it supposedly
    * followed is attribution noise, not progress. Plan shape: one
    * filtered per-key min-aggregate per step, each joined back on the
    * key (AQE broadcasts the shrinking reached-set at dimension
    * scale) — steps are config-sized, so this is O(steps) key-shuffles
    * of strictly shrinking frames, never a per-key sort or collect.
    * Output: (step_no, step, n_keys) with n_keys non-increasing. */
  def funnelSteps(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame =
    funnelStepsImpl(events, keyCol, tsCol, typeCol, steps, None)

  /** Within-window funnel — [[funnelSteps]] with a CONVERSION WINDOW
    * (the Amplitude/Mixpanel convention): a step counts only when it
    * completes within `withinSec` of the key's ENTRY — its earliest
    * step-1 event, the first-touch anchor (deadline inclusive). The
    * anchor is deterministic by construction: entry is min(step-1 ts),
    * and within the fixed deadline the greedy per-step earliest
    * completion is provably optimal (a fixed upper bound on every
    * step's time — exchange argument), so the chain stays the same
    * O(steps) shrinking min-joins with ONE extra map-side filter. Note
    * the semantics this buys: a key whose first touch times out does
    * NOT re-anchor at a later step-1 event (an ∃-over-anchors variant
    * would explode per-key step-1 candidates — quadratic on hot keys).
    * Output: (step_no, step, n_keys), n_keys non-increasing. */
  def funnelStepsWithin(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], withinSec: Long): DataFrame = {
    require(withinSec > 0, s"withinSec must be > 0, got $withinSec")
    funnelStepsImpl(events, keyCol, tsCol, typeCol, steps, Some(withinSec))
  }

  /** Anchor-EXACT within-window funnel — the ∃-over-anchors semantics
    * [[funnelStepsWithin]] deliberately trades away: a key reaches
    * step i when ANY of its step-1 events t₁ admits a chain
    * t₁ < t₂ < … < tᵢ ≤ t₁ + `withinSec` (the ClickHouse
    * `windowFunnel` strict-increase contract — a first touch that
    * times out does not doom a later attempt). Exact because for a
    * FIXED anchor the deadline is fixed, so the greedy per-step
    * earliest completion is optimal (exchange argument) and ∃ reduces
    * to running the greedy chain per (key, anchor). Plan shape: the
    * reached-set frames carry one row per SURVIVING (key, anchor) —
    * step-1-event scale, shrinking per step — through the same
    * O(steps) key-joins as [[funnelSteps]]; per-step counts are
    * countDistinct over keys. The hazard is a hot key carrying
    * thousands of anchors (each joins against that key's events):
    * `anchorCap` raises LOUDLY when any key's anchor count exceeds it
    * (the `LshBucketCap` stance — dedupe or pre-bucket retry storms
    * first; [[dedupEventsQuietGap]] is the tool). Anchors at the same
    * microsecond are one anchor (distinct). Output: (step_no, step,
    * n_keys), n_keys non-increasing. */
  def funnelStepsAnchored(events: DataFrame, keyCol: String,
      tsCol: String, typeCol: String, steps: Seq[String],
      withinSec: Long, anchorCap: Int = 10000): DataFrame = {
    require(steps.nonEmpty, "steps must not be empty")
    require(steps.distinct.size == steps.size,
      s"duplicate step types in ${steps.mkString(", ")} — a funnel " +
        "revisiting a type needs distinct event types per stage")
    require(withinSec > 0, s"withinSec must be > 0, got $withinSec")
    require(anchorCap >= 1, s"anchorCap must be >= 1, got $anchorCap")
    val timed = events.filter(col(tsCol).isNotNull)
    def us(c: Column): Column = unix_micros(c.cast(TimestampType))
    val anchors0 = timed.filter(col(typeCol) === steps.head)
      .select(col(keyCol), us(col(tsCol)).as("__t1"))
      .distinct()
    // the cap rides the anchor column so pruning cannot elide it: an
    // uncapped hot key fans every later step's join out by its anchor
    // count — quadratic per key with no error
    val nAnchors = count(lit(1)).over(Window.partitionBy(col(keyCol)))
    val anchors = anchors0.withColumn("__t1",
      when(nAnchors > anchorCap, raise_error(concat(
        lit("funnelStepsAnchored: key "), col(keyCol).cast(StringType),
        lit(s" has more than anchorCap = $anchorCap step-1 events — " +
          "dedupe retry storms first (dedupEventsQuietGap) or raise " +
          "anchorCap explicitly"))).cast(LongType))
        .otherwise(col("__t1")))
    var reached = anchors.withColumn("__prev", col("__t1"))
    val perStep = steps.zipWithIndex.map { case (st, i) =>
      if (i > 0) {
        val hits = timed.filter(col(typeCol) === st)
          .select(col(keyCol), us(col(tsCol)).as("__ts"))
        reached = hits.join(reached, Seq(keyCol))
          .filter(col("__ts") > col("__prev") &&
            col("__ts") <= col("__t1") + withinSec * 1000000L)
          .groupBy(col(keyCol), col("__t1"))
          .agg(min(col("__ts")).as("__prev"))
      }
      reached.agg(countDistinct(col(keyCol)).as("n_keys"))
        .select(lit(i + 1).as("step_no"), lit(st).as("step"),
          col("n_keys"))
    }
    perStep.reduce(_.union(_)).orderBy(col("step_no"))
  }

  private def funnelStepsImpl(events: DataFrame, keyCol: String,
      tsCol: String, typeCol: String, steps: Seq[String],
      withinSec: Option[Long]): DataFrame = {
    require(steps.nonEmpty, "steps must not be empty")
    require(steps.distinct.size == steps.size,
      s"duplicate step types in ${steps.mkString(", ")} — a funnel " +
        "revisiting a type needs distinct event types per stage")
    // a NULL-timestamp event carries no position in the funnel: it can
    // never advance later steps, and counting it as step-1 entry would
    // inflate conversion denominators (review r18.4; the
    // retentionCohorts stance)
    val timed = events.filter(col(tsCol).isNotNull)
    // TIMESTAMP_NTZ → TIMESTAMP before unix_micros (UTC sessions: the
    // cast is wall-clock identity; the q40/q44 stance)
    def us(c: Column): Column = unix_micros(c.cast(TimestampType))
    var reached: DataFrame = null
    val perStep = steps.zipWithIndex.map { case (st, i) =>
      val hits = timed.filter(col(typeCol) === st)
      val stage =
        if (i == 0)
          hits.groupBy(col(keyCol)).agg(min(col(tsCol)).as("__t"))
            .withColumn("__entry", us(col("__t")))
        else
          hits.join(reached, Seq(keyCol))
            .filter(col(tsCol) > col("__prev") && withinSec.map(w =>
              us(col(tsCol)) <= col("__entry") + w * 1000000L)
              .getOrElse(lit(true)))
            .groupBy(col(keyCol), col("__entry"))
            .agg(min(col(tsCol)).as("__t"))
      reached = stage.select(col(keyCol), col("__t").as("__prev"),
        col("__entry"))
      stage.agg(count(lit(1)).as("n_keys"))
        .select(lit(i + 1).as("step_no"), lit(st).as("step"),
          col("n_keys"))
    }
    perStep.reduce(_.union(_)).orderBy(col("step_no"))
  }

  /** Retention cohorts — the other half of product analytics: group
    * keys by their FIRST-activity period (the cohort) and count how
    * many are active again k periods later. Periods are exact integer
    * epoch-microsecond divisions (floorDiv semantics via the pmod
    * subtraction — correct for pre-1970 timestamps too, the
    * Tables.events nanos stance), so both engines bucket identically.
    * Plan shape: one per-key min-aggregate (the cohort), one distinct
    * (key, period) aggregate, one key join, one bounded
    * (cohort, offset) count — all standard key-shuffle classes.
    * Output: (cohort_period, period_offset, n_active); offset 0 rows
    * count each cohort's size. */
  def retentionCohorts(events: DataFrame, keyCol: String, tsCol: String,
      periodSec: Long): DataFrame =
    retentionCohorts(events, keyCol, tsCol, periodSec, periodSec)

  /** Dual-grain retention — cohorts at one period, activity at a FINER
    * one (weekly cohorts read at day granularity, the standard product
    * retention chart). `cohortPeriodSec` must be a multiple of
    * `activityPeriodSec` so every cohort start lands exactly on an
    * activity-bucket boundary and offsets stay exact integers: cohort
    * = floorDiv(first-activity bucket, ratio) (the nested-floor law:
    * ⌊us/C⌋ = ⌊⌊us/A⌋/ratio⌋ when C = ratio·A), offset = activity
    * bucket − cohort·ratio, in ACTIVITY periods since cohort start.
    * All int64 (`div` on pmod-adjusted dividends — exact to the
    * timestamp limits). Same plan shape as the single-grain form: one
    * distinct, one per-key min, one key join, one bounded count.
    * Output: (cohort_period, period_offset, n_active). */
  def retentionCohorts(events: DataFrame, keyCol: String, tsCol: String,
      cohortPeriodSec: Long, activityPeriodSec: Long): DataFrame = {
    require(activityPeriodSec > 0,
      s"periodSec must be > 0, got $activityPeriodSec")
    require(cohortPeriodSec >= activityPeriodSec &&
        cohortPeriodSec % activityPeriodSec == 0,
      s"cohortPeriodSec ($cohortPeriodSec) must be a positive multiple " +
        s"of activityPeriodSec ($activityPeriodSec) — otherwise cohort " +
        "starts fall inside activity buckets and offsets are not exact")
    val pUs = activityPeriodSec * 1000000L
    val ratio = cohortPeriodSec / activityPeriodSec
    val act = events.filter(col(tsCol).isNotNull)
      .select(col(keyCol).as("__k"),
        unix_micros(col(tsCol).cast(TimestampType)).as("__us"))
      // integral `div` on the pmod-adjusted dividend (the Tables.events
      // spelling): Long `/` is DOUBLE division in Spark, exact only
      // while |epoch µs| < 2^53 (~years -285..2255) — `div` keeps the
      // floorDiv bucket in int64 for the full timestamp range
      .select(col("__k"),
        expr(s"(__us - pmod(__us, ${pUs}L)) div ${pUs}L").as("__p"))
      .distinct()
    val cohorts = act.groupBy(col("__k")).agg(min(col("__p")).as("__pm"))
      .select(col("__k"),
        expr(s"(__pm - pmod(__pm, ${ratio}L)) div ${ratio}L").as("__c"))
    act.join(cohorts, Seq("__k"))
      .groupBy(col("__c").as("cohort_period"),
        (col("__p") - col("__c") * ratio).as("period_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy(col("cohort_period"), col("period_offset"))
  }

  /** Quiet-gap event dedup — the retry-storm collapse: a row is a
    * duplicate when ANY same-key row precedes it within `windowSec`
    * (lag semantics: a burst keeps its FIRST row; a later row survives
    * only after a full quiet gap with no same-key traffic). This is
    * the deterministic batch form of debounce/throttle dedup for event
    * pipelines (double-fired webhooks, client retries, at-least-once
    * ingestion) — the exact-content dedup family can't catch these
    * because retries carry fresh event ids and timestamps. One
    * key-partitioned window ordered by (`tsCol`, `tieCol`) — the q30
    * sessionize shuffle class, parallel across keys at any scale.
    * Rows with a NULL timestamp are kept (an ingest-failure row is not
    * evidence of a retry), mirroring [[graft.operators.DedupOps
    * .exactDedup]]'s NULL-text stance. Output: every surviving row,
    * caller columns untouched. */
  def dedupEventsQuietGap(events: DataFrame, keyCols: Seq[String],
      tsCol: String, tieCol: String, windowSec: Long): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must not be empty")
    require(windowSec > 0, s"windowSec must be > 0, got $windowSec")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    // TIMESTAMP_NTZ → TIMESTAMP before unix_micros (sessions run UTC,
    // so the cast is wall-clock identity; the oracle casts identically)
    val us = unix_micros(col(tsCol).cast(TimestampType))
    events
      .withColumn("__gap_us", us - lag(us, 1).over(w))
      .filter(col(tsCol).isNull || col("__gap_us").isNull ||
        col("__gap_us") > windowSec * 1000000L)
      .drop("__gap_us")
  }

  /** One declarative data-quality constraint for [[checkConstraints]]
    * (the Deequ/Great-Expectations check families every warehouse runs
    * on ingest, as plain Catalyst aggregates). */
  sealed trait TableCheck
  /** Violation: the column is NULL. */
  final case class NotNull(column: String) extends TableCheck
  /** Violation: a NON-NULL value outside [lo, hi] (inclusive). NULLs
    * are [[NotNull]]'s job — counting them here too would double-bill
    * one defect across two checks. */
  final case class InRange(column: String, lo: Column, hi: Column)
      extends TableCheck
  /** Violation: a NON-NULL value outside the allowed set. */
  final case class InSet(column: String, allowed: Seq[Any])
      extends TableCheck
  /** Violation: EVERY row whose key occurs more than once (both copies
    * are defects — a consumer keying on these columns loses one of
    * them silently). NULL key components group together, matching the
    * groupBy semantics a downstream dedup would apply. */
  final case class Unique(columns: Seq[String]) extends TableCheck
  /** Violation: a row whose fully NON-NULL foreign-key tuple has no
    * match in `dim` (SQL FK semantics: a NULL component opts the row
    * out of the check). */
  final case class RefIntegrity(columns: Seq[String], dim: DataFrame,
      dimColumns: Seq[String]) extends TableCheck

  /** Declarative data-quality constraint checking — the ingest-time
    * audit (Deequ's `VerificationSuite` surface) as ONE report table:
    * (check_type, target, n_rows, n_violations, passed), one row per
    * check.
    *
    * Scale stance: all row-local checks ([[NotNull]]/[[InRange]]/
    * [[InSet]]) fold into a SINGLE full-scan aggregate (conditional
    * sums — one pass over the fact table no matter how many checks);
    * each [[Unique]] is one key-grouped count (partial aggregation
    * map-side); each [[RefIntegrity]] is one anti-join that AQE
    * broadcast-plans when the dimension side is small. Report rows are
    * per-check scalars — parameter-scale, never data-sized.
    */
  def checkConstraints(df: DataFrame, checks: Seq[TableCheck]): DataFrame = {
    require(checks.nonEmpty, "checks must not be empty")
    // n_rows for the keyed checks re-derives from a zero-column count
    // scan (Catalyst prunes every column), so the extra passes read
    // parquet footers, not data
    val total = df.agg(count(lit(1)).cast(LongType).as("n_rows"))
    val rowLocal = checks.zipWithIndex.collect {
      case (c: NotNull, i)  => (i, "not_null", c.column, col(c.column).isNull)
      case (c: InRange, i)  => (i, "in_range", c.column,
        col(c.column).isNotNull &&
          (col(c.column) < c.lo || col(c.column) > c.hi))
      case (c: InSet, i)    => (i, "in_set", c.column,
        col(c.column).isNotNull && !col(c.column).isin(c.allowed: _*))
    }
    val localReport: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else {
        val aggs = count(lit(1)).cast(LongType).as("__n") +:
          rowLocal.map { case (i, _, _, bad) =>
            sum(when(bad, 1L).otherwise(0L)).as(s"__v_$i") }
        val one = df.agg(aggs.head, aggs.tail: _*)
        Some(one.select(explode(array(rowLocal.map { case (i, kind, tgt, _) =>
          struct(lit(kind).as("check_type"), lit(tgt).as("target"),
            col("__n").as("n_rows"),
            coalesce(col(s"__v_$i"), lit(0L)).as("n_violations"))
        }: _*)).as("__r")).select(col("__r.*")))
      }
    val keyed: Seq[DataFrame] = checks.collect {
      case Unique(cols) =>
        require(cols.nonEmpty, "Unique needs at least one column")
        val dups = df.groupBy(cols.map(col): _*)
          .agg(count(lit(1)).as("__k"))
          .filter(col("__k") > 1)
          .agg(coalesce(sum(col("__k")), lit(0L)).as("n_violations"))
        total.crossJoin(broadcast(dups)).select(
          lit("unique").as("check_type"),
          lit(cols.mkString(",")).as("target"),
          col("n_rows"), col("n_violations"))
      case RefIntegrity(cols, dim, dimCols) =>
        require(cols.nonEmpty && cols.size == dimCols.size,
          s"RefIntegrity column lists must be non-empty and equal " +
            s"length, got ${cols.size} vs ${dimCols.size}")
        val cond = cols.zip(dimCols)
          .map { case (a, b) => df(a) === dim(b) }.reduce(_ && _)
        val orphans = df
          .filter(cols.map(col(_).isNotNull).reduce(_ && _))
          .join(dim, cond, "left_anti")
          .agg(count(lit(1)).cast(LongType).as("n_violations"))
        total.crossJoin(broadcast(orphans)).select(
          lit("ref_integrity").as("check_type"),
          lit(cols.mkString(",")).as("target"),
          col("n_rows"), col("n_violations"))
    }
    // every check must land in exactly one arm — a future TableCheck
    // subtype falling through both collect{}s would be silently absent
    // from the report, and a check that silently didn't run is the
    // worst failure mode an audit tool has (the suite would read
    // all-green under --fail-on-violation)
    require(rowLocal.size + keyed.size == checks.size,
      "checkConstraints: unhandled check type(s) — every TableCheck " +
        "must be one of NotNull/InRange/InSet/Unique/RefIntegrity")
    val parts = localReport.toSeq ++ keyed
    parts.reduce(_ unionByName _)
      .withColumn("passed", col("n_violations") === 0L)
  }

  /** Row-level twin of [[checkConstraints]] for the ROW-LOCAL check
    * families ([[NotNull]]/[[InRange]]/[[InSet]]): every input row
    * comes back with `n_violated` (int) and `violated` (the
    * comma-joined "check_type(column)" labels in check order, "" when
    * clean) — the quarantine/routing form of the audit (bad rows to a
    * side channel, clean rows onward) where [[checkConstraints]] is
    * the report form. Keyed checks ([[Unique]]/[[RefIntegrity]])
    * raise: they need cross-row state and belong to the report (a
    * silent skip here would let an audit config "pass" rows the batch
    * report fails). Pure map-side (one codegen'd projection, no
    * shuffle), so it rides streaming micro-batches unchanged —
    * [[graft.streaming.Streams]] wraps it as the `auditGate`. */
  def flagRowViolations(df: DataFrame, checks: Seq[TableCheck],
      prefix: String = ""): DataFrame = {
    require(checks.nonEmpty, "checks must not be empty")
    // withColumn would silently REPLACE a caller's same-named column
    // (e.g. the labels of an upstream flagging pass) — and the gate's
    // drop mode would then delete it outright
    for (c <- Seq(s"${prefix}n_violated", s"${prefix}violated"))
      require(!df.columns.contains(c),
        s"flagRowViolations: input already has a '$c' column — pass a " +
          "prefix to keep both")
    val conds = checks.map {
      case NotNull(c) => (s"not_null($c)", col(c).isNull)
      case InRange(c, lo, hi) =>
        (s"in_range($c)", col(c).isNotNull && (col(c) < lo || col(c) > hi))
      case InSet(c, allowed) =>
        (s"in_set($c)", col(c).isNotNull && !col(c).isin(allowed: _*))
      case other => throw new IllegalArgumentException(
        s"flagRowViolations takes row-local checks only (NotNull/" +
          s"InRange/InSet); ${other.getClass.getSimpleName} needs " +
          "cross-row state — use checkConstraints")
    }
    df.withColumn(s"${prefix}n_violated",
      conds.map { case (_, bad) => when(bad, 1).otherwise(0) }
        .reduce(_ + _))
      // concat_ws skips NULL args, so passing checks vanish and the
      // label list preserves check order with no placeholder commas
      .withColumn(s"${prefix}violated",
        concat_ws(",", conds.map { case (lbl, bad) =>
          when(bad, lit(lbl)) }: _*))
  }

  /** Rolling z-score anomaly signal — the metrics-monitoring staple
    * (spike/drop detection per key) over a row-count trailing window:
    * for each observation, z = (v − mean)/std over the last
    * `windowRows` same-key observations (current row inclusive), plus
    * `is_anomaly` = |z| > `threshold`. NULL when the window holds
    * fewer than `minPeriods` usable values, the variance is 0 (a flat
    * window has no scale to deviate from), or the value itself is
    * NULL; rows with a NULL key or timestamp are dropped (the
    * resampleFfill stance — and DuckDB orders NULLs last where Spark
    * orders them first, so a NULL-ts ordering could never be
    * oracle-stable anyway).
    *
    * Determinism stance: the two windowed sums (Σv, Σv²) run in
    * DECIMAL(38,10) — exact and order-free — then re-scale through the
    * [[graft.QueryDef.dsum]] chain (ROUND to scale 4, cast double:
    * bit-identical across engines); mean/variance/sqrt/z are then
    * per-row IEEE754 ops on identical inputs, so the doubles
    * hash-match the oracle bit-for-bit. A double windowed SUM would be
    * partition-order-dependent and could not.
    *
    * Scale stance: two sums + a count in ONE window pass (Spark
    * evaluates same-window frames together), partitioned by the
    * HIGH-cardinality key — the q30 sessionize shuffle class; the
    * trailing frame is O(windowRows) state per task. */
  def rollingZscore(series: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String, windowRows: Int,
      threshold: Double = 3.0, minPeriods: Int = 2): DataFrame = {
    require(windowRows >= 2, s"windowRows must be >= 2, got $windowRows")
    require(minPeriods >= 2 && minPeriods <= windowRows,
      s"minPeriods must be in [2, windowRows], got $minPeriods")
    require(!threshold.isNaN && threshold > 0,
      s"threshold must be a positive number, got $threshold")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
      .rowsBetween(-(windowRows - 1), Window.currentRow)
    def dsumWin(c: Column): Column =
      sum(graft.QueryDef.dec(c)).over(w)
        .cast(DecimalType(27, 4)).cast(DoubleType)
    val v = col(valueCol)
    val s = dsumWin(v)
    val q = dsumWin(v * v)
    val n = count(v).over(w).cast(DoubleType)
    val mean = s / n
    val variance = q / n - mean * mean
    val z = when(v.isNotNull && n >= minPeriods && variance > 0,
      (v - mean) / sqrt(variance))
    series.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .withColumn("zscore", z)
      .withColumn("is_anomaly", abs(col("zscore")) > threshold)
  }

  /** Time-series resample + forward fill — the gap-fill every metrics
    * pipeline runs before charting or feature extraction: bucket each
    * key's observations to a fixed `periodSec` grid, keep the LAST
    * observation per (key, bucket) (latest (tsCol, tieCol) wins —
    * tieCol must be unique per key for a deterministic pick; event ids
    * are), then fill empty buckets with the last observed value
    * (LOCF). The grid spans each key's own [min, max] observed bucket,
    * so there are no leading NULLs and absent keys produce no rows.
    * Rows with a NULL timestamp or a NULL key are dropped (an
    * unstamped or unattributed observation cannot be placed on a
    * grid — the funnel/retention stance); a NULL
    * observed VALUE counts as "no usable observation" and is filled
    * over, flagged like any gap.
    *
    * Scale stance: the per-bucket pick is a rank-1 window on the
    * HIGH-cardinality (key, bucket) pair (Spark 4's WindowGroupLimit
    * pushes the rn=1 filter into the sort); the grid explode is
    * map-side `sequence()`, guarded by `maxBucketsPerKey` with a loud
    * error naming the offending span (a mis-set period on a years-long
    * key would otherwise explode quietly into billions of rows); the
    * LOCF window partitions by key — the q30 sessionize shuffle class.
    * Output: (key, bucket_start timestamp, value, filled).
    */
  def resampleFfill(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String, periodSec: Long,
      maxBucketsPerKey: Long = 1000000L): DataFrame = {
    require(periodSec > 0, s"periodSec must be > 0, got $periodSec")
    require(maxBucketsPerKey > 0,
      s"maxBucketsPerKey must be > 0, got $maxBucketsPerKey")
    val p = periodSec * 1000000L
    val us = unix_micros(col(tsCol).cast(TimestampType))
    // exact int64 floor division (the q44 pmod spelling — Long `/`
    // would detour through doubles and lose exactness past 2^53).
    // NULL keys drop with NULL timestamps: a keyless observation has
    // no grid to land on, and keeping the NULL group would FABRICATE a
    // NULL-keyed grid whose equi-join back to its observations never
    // matches — every bucket value=NULL/filled=true junk downstream
    val b = events.filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol).as("__k"),
        expr(s"(unix_micros(cast(`$tsCol` as timestamp))" +
          s" - pmod(unix_micros(cast(`$tsCol` as timestamp)), ${p}L))" +
          s" div ${p}L").as("__b"),
        us.as("__us"), col(tieCol).as("__tie"), col(valueCol).as("__v"))
    val wpick = Window.partitionBy(col("__k"), col("__b"))
      .orderBy(col("__us").desc, col("__tie").desc)
    val obs = b.withColumn("__rn", row_number().over(wpick))
      .filter(col("__rn") === 1)
      .select(col("__k"), col("__b"), col("__v"))
    val grid = b.groupBy(col("__k"))
      .agg(min(col("__b")).as("__b0"), max(col("__b")).as("__b1"))
      .select(col("__k"), explode(
        when(col("__b1") - col("__b0") < maxBucketsPerKey,
          sequence(col("__b0"), col("__b1")))
          .otherwise(raise_error(concat(
            lit("resampleFfill: key "), col("__k").cast(StringType),
            lit(s" spans more than $maxBucketsPerKey buckets of " +
              s"$periodSec s ("), (col("__b1") - col("__b0") + 1)
              .cast(StringType),
            lit(") — raise periodSec or maxBucketsPerKey")))))
        .as("__b"))
    val wfill = Window.partitionBy(col("__k")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("__k", "__b"), "left")
      .select(col("__k").as(keyCol),
        // NTZ (sessions run UTC, so the LTZ→NTZ cast is wall-clock
        // identity): grid instants are derived values, and the naive
        // spelling is what DuckDB's make_timestamp and pandas both
        // read back without a timezone annotation
        timestamp_micros(col("__b") * p).cast(TimestampNTZType)
          .as("bucket_start"),
        last(col("__v"), ignoreNulls = true).over(wfill).as(valueCol),
        col("__v").isNull.as("filled"))
  }
}
