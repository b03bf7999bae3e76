package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational-surface operator inventory (SURVEY.md §2) exercised over the
  * driver's TPC-H-ish tables, each with a DuckDB oracle.
  *
  * Mapping to the reference's physical operators (all paths relative to
  * /root/reference/):
  *   - scan/filter/project: Predicate/AccessPath/ProjectionOp
  *     (bigdata/src/java/com/bigdata/bop/ap/Predicate.java:62,
  *      bigdata/src/java/com/bigdata/bop/solutions/ProjectionOp.java:52)
  *   - joins: PipelineJoin/HashJoinOp/SolutionSetHashJoinOp/NestedLoopJoinOp
  *     (bigdata/src/java/com/bigdata/bop/join/PipelineJoin.java:113,
  *      HashJoinOp.java:70, NestedLoopJoinOp.java:81) with JoinTypeEnum
  *     {Normal,Optional,Exists,NotExists,Filter} (JoinTypeEnum.java:44-75)
  *   - aggregation: MemoryGroupByOp/PipelinedAggregationOp + COUNT/SUM/AVG/
  *     MIN/MAX/SAMPLE/GROUP_CONCAT
  *     (bigdata/src/java/com/bigdata/bop/solutions/MemoryGroupByOp.java:69,
  *      bigdata-rdf/src/java/com/bigdata/bop/rdf/aggregate/)
  *   - distinct: JVMDistinctBindingSetsOp (solutions/JVMDistinctBindingSetsOp.java:61)
  *   - sort/slice: MemorySortOp/SliceOp (solutions/MemorySortOp.java:68, SliceOp.java:68)
  *   - union/subquery: Union/SubqueryOp/NamedSubqueryOp
  *     (bigdata/src/java/com/bigdata/bop/controller/Union.java:50,
  *      SubqueryOp.java:110, JVMNamedSubqueryOp.java:76)
  *   - value expressions: constraints package
  *     (bigdata-rdf/src/java/com/bigdata/rdf/internal/constraints/)
  *
  * Determinism contract with the DuckDB oracle: money/quantity aggregates go
  * through DECIMAL(18,2) (exact, order-independent) and are cast to DOUBLE at
  * the end; every query ORDER BYs a unique key so row order matches.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Exact decimal view of a money/quantity column. */
  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  /** Order-independent exact sum, surfaced as double for oracle parity. */
  private def dsum(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- scans / filters / projections (§2.1, §2.2) ----
    "scan_filter_project" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_returnflag") === "R" && col("l_quantity") > 40)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "distinct_pairs" -> ((s, d) => {
      t(s, d, "lineitem")
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- aggregation (§2.5) ----
    "agg_tpch_q1" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
            .cast(DoubleType).as("sum_disc_price"),
          (sum(dec2(col("l_quantity"))).cast(DoubleType) / count(col("l_quantity")))
            .as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "agg_having" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spend"))
        .filter(col("n_orders") >= 12)
        .orderBy("o_custkey")
    }),

    "agg_count_distinct" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
             countDistinct(col("l_partkey")).as("n_part"))
        .orderBy("l_returnflag")
    }),

    "agg_group_concat" -> ((s, d) => {
      t(s, d, "nation")
        .groupBy("n_regionkey")
        .agg(concat_ws(",", sort_array(collect_list(col("n_name")))).as("names"))
        .orderBy("n_regionkey")
    }),

    "agg_minmax" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(min(col("o_orderdate")).as("first_dt"),
             max(col("o_orderdate")).as("last_dt"),
             min(col("o_totalprice")).as("min_price"),
             max(col("o_totalprice")).as("max_price"),
             min(col("o_orderpriority")).as("sample_prio"))
        .orderBy("o_orderstatus")
    }),

    "agg_rollup" -> ((s, d) => {
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
                coalesce(col("l_linestatus"), lit("ALL")).as("status"),
                col("n"))
        .orderBy("flag", "status")
    }),

    "agg_cube" -> ((s, d) => {
      // grouping sets beyond SPARQL's surface (free via Catalyst)
      t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
                coalesce(col("l_linestatus"), lit("ALL")).as("status"),
                col("n"), col("qty"))
        .orderBy("flag", "status")
    }),

    // ---- joins (§2.3) ----
    "join_inner_dims" -> ((s, d) => {
      // dimension joins: explicitly broadcast the small sides
      t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey", "c_name", "n_name", "r_name")
        .orderBy("c_custkey")
    }),

    "join_star_agg" -> ((s, d) => {
      // TPC-H Q3 shape: fact-fact join + selective dims
      val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey")
        .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(20)
    }),

    "join_left_outer" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    }),

    "join_semi" -> ((s, d) => {
      val big = t(s, d, "orders").filter(col("o_totalprice") > 400000)
      t(s, d, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "join_anti" -> ((s, d) => {
      val big = t(s, d, "orders").filter(col("o_totalprice") > 350000)
      t(s, d, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "join_cross_theta" -> ((s, d) => {
      val r1 = t(s, d, "region").select(col("r_regionkey").as("k1"), col("r_name").as("a"))
      val r2 = t(s, d, "region").select(col("r_regionkey").as("k2"), col("r_name").as("b"))
      r1.crossJoin(r2).filter(col("k1") < col("k2")).select("a", "b").orderBy("a", "b")
    }),

    // ---- union / values / set ops (§2.4, §2.11) ----
    "union_all" -> ((s, d) => {
      val c = t(s, d, "customer").select(col("c_name").as("name"), lit("customer").as("kind"))
      val su = t(s, d, "supplier").select(col("s_name").as("name"), lit("supplier").as("kind"))
      c.unionByName(su).orderBy("kind", "name")
    }),

    "union_distinct" -> ((s, d) => {
      val c = t(s, d, "customer").select(col("c_nationkey").as("nk"))
      val su = t(s, d, "supplier").select(col("s_nationkey").as("nk"))
      c.union(su).distinct().orderBy("nk")
    }),

    "values_in" -> ((s, d) => {
      t(s, d, "nation")
        .filter(col("n_name").isin("NATION_1", "NATION_7", "NATION_19"))
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
    }),

    // ---- sort / slice / top-k (§2.7) ----
    "orderby_slice" -> ((s, d) => {
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .offset(5).limit(15)
    }),

    "topk" -> ((s, d) => {
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    }),

    // ---- subqueries (§2.4) ----
    "subquery_scalar" -> ((s, d) => {
      val o = t(s, d, "orders")
      val avgPrice = o.agg(
        (sum(dec2(col("o_totalprice"))).cast(DoubleType) / count(lit(1))).as("avg_price"))
      o.crossJoin(broadcast(avgPrice))
        .filter(col("o_totalprice") > col("avg_price") * 1.8)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    "named_subquery_reuse" -> ((s, d) => {
      // WITH nat_spend AS (...) used twice (NamedSubqueryOp/INCLUDE analogue):
      // materialize once via cache, reference from two branches.
      val natSpend = t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(col("o_totalprice")).as("spend"))
        .cache()
      val maxSpend = natSpend.agg(max(col("spend")).as("max_spend"))
      natSpend.crossJoin(broadcast(maxSpend))
        .filter(col("spend") > col("max_spend") * 0.5)
        .select("n_name", "spend")
        .orderBy("n_name")
    }),

    // ---- scalar value expressions (§2.8) ----
    "expr_strings" -> ((s, d) => {
      t(s, d, "part").select(
        col("p_partkey"),
        lower(col("p_name")).as("lo"),
        length(col("p_name")).cast(LongType).as("len"),
        substring(col("p_type"), 1, 5).as("ty5"),
        concat(col("p_brand"), lit("|"), col("p_type")).as("bt"),
        col("p_name").contains("green").as("has_green"),
        col("p_type").startsWith("STANDARD").as("is_std"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("novowel"))
        .orderBy("p_partkey")
    }),

    "expr_datetime" -> ((s, d) => {
      t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast(LongType).as("yr"),
        month(col("o_orderdate")).cast(LongType).as("mo"),
        dayofmonth(col("o_orderdate")).cast(LongType).as("dy"),
        date_trunc("month", col("o_orderdate")).as("mon_start"))
        .orderBy("o_orderkey")
    }),

    "expr_hash" -> ((s, d) => {
      t(s, d, "customer").select(
        col("c_custkey"),
        md5(col("c_name")).as("h_md5"),
        sha2(col("c_name"), 256).as("h_sha256"))
        .orderBy("c_custkey")
    }),

    "expr_math" -> ((s, d) => {
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25.0).as("ab"),
        floor(col("l_extendedprice")).cast(LongType).as("fl"),
        ceil(col("l_extendedprice")).cast(LongType).as("ce"),
        sqrt(col("l_quantity")).as("sq"),
        (col("l_orderkey") % 7).as("m7"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "expr_conditional" -> ((s, d) => {
      t(s, d, "orders").select(
        col("o_orderkey"),
        when(col("o_totalprice") > 300000, "big")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("small").as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("st"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("urgent"))
        .orderBy("o_orderkey")
    }),

    "expr_json" -> ((s, d) => {
      t(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .orderBy("event_id")
    }),

    // ---- events / time-series (batch analogue of §2.16) ----
    "events_time_agg" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hr"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy("hr", "event_type")
    }),

    // ---- window functions (ranking; cf. full-text rank §2.12) ----
    "window_rank_running" -> ((s, d) => {
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_orderkey"), col("l_linenumber"))
      t(s, d, "lineitem")
        .withColumn("rn", row_number().over(w).cast(LongType))
        .withColumn("running",
          sum(dec2(col("l_quantity"))).over(w).cast(DoubleType))
        .filter(col("rn") <= 5)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "rn", "running")
        .orderBy("l_suppkey", "rn")
    })
  )

  val oracles: Map[String, String] = Map(
    "scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_returnflag = 'R' AND l_quantity > 40
         ORDER BY l_orderkey, l_linenumber""",
    "distinct_pairs" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",
    "agg_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "agg_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
         FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
         ORDER BY o_custkey""",
    "agg_count_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_group_concat" ->
      """SELECT n_regionkey, STRING_AGG(n_name, ',' ORDER BY n_name) AS names
         FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    "agg_minmax" ->
      """SELECT o_orderstatus, MIN(o_orderdate) AS first_dt, MAX(o_orderdate) AS last_dt,
           MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
           MIN(o_orderpriority) AS sample_prio
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "agg_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
           COALESCE(l_linestatus, 'ALL') AS status, COUNT(*) AS n
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY flag, status""",
    "agg_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
           COALESCE(l_linestatus, 'ALL') AS status, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY flag, status""",

    "join_inner_dims" ->
      """SELECT c_custkey, c_name, n_name, r_name
         FROM customer JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
         ORDER BY c_custkey""",
    "join_star_agg" ->
      """SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 20""",
    "join_left_outer" ->
      """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey, c_name ORDER BY c_custkey""",
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 400000)
         ORDER BY c_custkey""",
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 350000)
         ORDER BY c_custkey""",
    "join_cross_theta" ->
      """SELECT r1.r_name AS a, r2.r_name AS b
         FROM region r1 CROSS JOIN region r2
         WHERE r1.r_regionkey < r2.r_regionkey ORDER BY a, b""",
    "union_all" ->
      """SELECT name, kind FROM (
           SELECT c_name AS name, 'customer' AS kind FROM customer
           UNION ALL
           SELECT s_name AS name, 'supplier' AS kind FROM supplier)
         ORDER BY kind, name""",
    "union_distinct" ->
      """SELECT nk FROM (
           SELECT c_nationkey AS nk FROM customer
           UNION
           SELECT s_nationkey AS nk FROM supplier)
         ORDER BY nk""",
    "values_in" ->
      """SELECT n_nationkey, n_name FROM nation
         WHERE n_name IN ('NATION_1','NATION_7','NATION_19') ORDER BY n_nationkey""",
    "orderby_slice" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 15 OFFSET 5""",
    "topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "subquery_scalar" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                               FROM orders) * 1.8
         ORDER BY o_orderkey""",
    "named_subquery_reuse" ->
      """WITH nat_spend AS (
           SELECT n_name, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
           FROM orders JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey
           GROUP BY n_name)
         SELECT n_name, spend FROM nat_spend
         WHERE spend > (SELECT MAX(spend) FROM nat_spend) * 0.5
         ORDER BY n_name""",
    "expr_strings" ->
      """SELECT p_partkey, LOWER(p_name) AS lo,
           CAST(LENGTH(p_name) AS BIGINT) AS len,
           SUBSTR(p_type, 1, 5) AS ty5,
           CONCAT(p_brand, '|', p_type) AS bt,
           CONTAINS(p_name, 'green') AS has_green,
           STARTS_WITH(p_type, 'STANDARD') AS is_std,
           REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS novowel
         FROM part ORDER BY p_partkey""",
    "expr_datetime" ->
      """SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
           CAST(MONTH(o_orderdate) AS BIGINT) AS mo,
           CAST(DAY(o_orderdate) AS BIGINT) AS dy,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS mon_start
         FROM orders ORDER BY o_orderkey""",
    "expr_hash" ->
      """SELECT c_custkey, MD5(c_name) AS h_md5, SHA256(c_name) AS h_sha256
         FROM customer ORDER BY c_custkey""",
    "expr_math" ->
      """SELECT l_orderkey, l_linenumber,
           ABS(l_quantity - 25.0) AS ab,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS fl,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS ce,
           SQRT(l_quantity) AS sq,
           l_orderkey % 7 AS m7
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "expr_conditional" ->
      """SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS bucket,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS st,
           o_orderpriority IN ('1-URGENT','2-HIGH') AS urgent
         FROM orders ORDER BY o_orderkey""",
    "expr_json" ->
      """SELECT event_id, CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k
         FROM events ORDER BY event_id""",
    "events_time_agg" ->
      """SELECT DATE_TRUNC('hour', ts) AS hr, event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM events GROUP BY 1, 2 ORDER BY hr, event_type""",
    "window_rank_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, rn, running FROM (
           SELECT l_suppkey, l_orderkey, l_linenumber,
             CAST(ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber) AS BIGINT) AS rn,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER
               (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber) AS DOUBLE) AS running
           FROM lineitem)
         WHERE rn <= 5 ORDER BY l_suppkey, rn"""
  )
}
