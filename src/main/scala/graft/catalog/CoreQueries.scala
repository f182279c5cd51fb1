package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Dedup, Merge}
import graft.sources.Tables

/** Relational core of the catalog: reference R-ops (SURVEY.md §2.A) plus
  * standard join/agg/window/setop/scalar breadth (§2.B). */
object CoreQueries {

  import Catalog._


  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- aggregation core (R19; SURVEY §2.B aggregations) ---------------
    "q01_pricing_summary" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          discRevenue.as("sum_disc_price"),
          round(sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
            count(lit(1)), 6).as("avg_qty"),
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // --- projection / cast / rename (R6, R9) ----------------------------
    "q02_projection_cast" -> ((s, d) => {
      t(s, d, "customer").select(
        col("c_custkey").as("id"),
        upper(col("c_name")).as("name_uc"),
        col("c_nationkey").cast("long").as("nation"),
        round(col("c_acctbal"), 2).as("balance"),
        col("c_mktsegment").as("segment"))
        .orderBy(col("id"))
    }),

    // --- filter + conditional + date construction (R11, R18) ------------
    "q03_filter_conditional" -> ((s, d) => {
      t(s, d, "orders")
        .filter(col("o_totalprice") > 1000.0 && col("o_orderstatus").isin("O", "F"))
        .select(
          col("o_orderkey"),
          col("o_orderstatus"),
          when(col("o_totalprice") > 50000.0, lit("high"))
            .when(col("o_totalprice") > 10000.0, lit("mid"))
            .otherwise(lit("low")).as("price_band"),
          make_date(year(col("o_orderdate")), lit(10),
            when(col("o_orderstatus") === "F", lit(2)).otherwise(lit(30)))
            .as("synthetic_date"))
        .orderBy(col("o_orderkey"))
    }),

    // --- deterministic keep-first dedup (R7) ----------------------------
    "q04_dedup_keepfirst" -> ((s, d) => {
      Dedup.keepFirst(t(s, d, "customer"), Seq("c_nationkey"), Seq(col("c_custkey")))
        .select(col("c_nationkey").cast("long").as("nation"),
          col("c_custkey").as("first_custkey"), col("c_name").as("name"))
        .orderBy(col("nation"))
    }),

    // --- full-row distinct (R8) -----------------------------------------
    "q05_dedup_distinct" -> ((s, d) => {
      Dedup.distinctRows(
        t(s, d, "lineitem").select(col("l_returnflag"), col("l_linestatus")))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // --- union-all (R4) --------------------------------------------------
    "q06_union_all" -> ((s, d) => {
      val o = t(s, d, "orders")
      val hi = o.filter(col("o_totalprice") > 100000.0)
        .select(col("o_orderkey"), lit("high").as("src"))
      val lo = o.filter(col("o_totalprice") < 2000.0)
        .select(col("o_orderkey"), lit("low").as("src"))
      Tables.unionAll(Seq(hi, lo)).orderBy(col("src"), col("o_orderkey"))
    }),

    // --- broadcast 3-way star join (R17/R14) ----------------------------
    "q07_star_join" -> ((s, d) => {
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          discRevenue.as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    }),

    // --- left outer join with pre-aggregation ---------------------------
    "q08_outer_join" -> ((s, d) => {
      val perCust = t(s, d, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_spent"))
      t(s, d, "customer")
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("total_spent"), lit(0.0)).as("total_spent"))
        .orderBy(col("c_custkey"))
    }),

    // --- semi / anti joins (R13 semantics) ------------------------------
    "q09_semi_join" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers_with_orders"))
        .orderBy(col("c_mktsegment"))
    }),
    "q10_anti_join" -> ((s, d) => {
      // customers with no F-status order (plain "no orders at all" is empty
      // on the testdata -- every customer has orders)
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // --- deterministic first-per-group (R19 hazard fix) -----------------
    "q11_first_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      t(s, d, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("c_mktsegment"), col("c_custkey").as("top_custkey"),
          round(col("c_acctbal"), 2).as("top_balance"))
        .orderBy(col("c_mktsegment"))
    }),

    // --- window rank / per-group top-k ----------------------------------
    "q12_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("o_orderpriority"), col("rnk").cast("long").as("rnk"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"))
        .orderBy(col("o_orderpriority"), col("rnk"))
    }),

    // --- window lag + running frame -------------------------------------
    "q13_window_running" -> ((s, d) => {
      val byCust = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("prev_price",
          round(lag(col("o_totalprice"), 1).over(byCust), 2))
        .withColumn("running_spent",
          round(sum(col("o_totalprice").cast("decimal(18,2)"))
            .over(byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double"), 4))
        .select(col("o_orderkey"), col("o_custkey"), col("prev_price"),
          col("running_spent"))
        .orderBy(col("o_orderkey"))
    }),

    // --- global sort + limit (top-k) ------------------------------------
    "q14_top10_orders" -> ((s, d) => {
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
    }),

    // --- set ops ---------------------------------------------------------
    "q15_intersect" -> ((s, d) => {
      val o = t(s, d, "orders")
      o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
        .intersect(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
        .orderBy(col("o_custkey"))
    }),
    "q16_except" -> ((s, d) => {
      val o = t(s, d, "orders")
      o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
        .except(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
        .orderBy(col("o_custkey"))
    }),

    // --- rollup ----------------------------------------------------------
    "q17_rollup" -> ((s, d) => {
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // --- scalar string functions ----------------------------------------
    "q18_string_funcs" -> ((s, d) => {
      t(s, d, "part")
        .filter(col("p_name").contains("a"))
        .select(
          col("p_partkey"),
          substring(col("p_name"), 1, 8).as("prefix"),
          length(col("p_name")).cast("long").as("name_len"),
          upper(col("p_brand")).as("brand_uc"),
          lower(col("p_type")).as("type_lc"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), "a", "@").as("name_sub"))
        .orderBy(col("p_partkey"))
    }),

    // --- scalar date/time functions (R15, R11) --------------------------
    "q19_date_funcs" -> ((s, d) => {
      t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("qtr"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
          .as("days_since_95"),
        add_months(to_date(col("o_orderdate")), 3).as("plus3mo"))
        .orderBy(col("o_orderkey"))
    }),

    // --- JSON extraction (events.props) ---------------------------------
    "q20_json_extract" -> ((s, d) => {
      ev(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    // --- merge: upsert as recompute plan (R12) --------------------------
    "q21_upsert" -> ((s, d) => {
      val e = ev(s, d)
      val target = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(dsum(col("value")).as("val"))
      val updates = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(dsum(col("value")).as("val"))
      Merge.upsert(target, updates, Seq("user_id"), Seq(col("val")))
        .orderBy(col("user_id"))
    }),

    // --- merge: insert-if-absent (R13) ----------------------------------
    "q22_insert_if_absent" -> ((s, d) => {
      val e = ev(s, d)
      val target = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(dsum(col("value")).as("val"))
      val inserts = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(dsum(col("value")).as("val"))
      Merge.insertIfAbsent(target, inserts, Seq("user_id"), Seq(col("val")))
        .orderBy(col("user_id"))
    }),

    // --- merge: keyed update (R20) --------------------------------------
    "q23_keyed_update" -> ((s, d) => {
      val recomputed = t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(dsum(col("l_extendedprice")).as("o_totalprice"))
        .withColumnRenamed("l_orderkey", "o_orderkey")
      val target = t(s, d, "orders")
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
      Merge.updateColumns(target, recomputed, Seq("o_orderkey"), Seq("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // --- SCD Type 2: versioned dimension from a change log (R12/R20 at
    // history-keeping strength). valid_from/valid_to as integer µs —
    // cross-engine-exact, no timestamp round-tripping.
    "q83_scd2" -> ((s, d) => {
      val changes = ev(s, d).select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        floor(col("value") / 25).cast("long").as("tier"))
      Merge.scd2FromChanges(changes, Seq("user_id"), "ts_us", Seq("tier"),
          orderCols = Seq(col("ts_us").asc, col("event_id").asc))
        .orderBy(col("user_id"), col("valid_from"), col("tier"))
    }),

    // --- SCD2 point-in-time lookup (the consumption side of q83) --------
    // Every purchase picks the tier version valid at its timestamp: key
    // equi-join with the interval test as residual (never a cross
    // product). Purchases are change events themselves, so coverage is
    // total — but the left join and the open-interval NULL handling are
    // the real contract under test.
    "q108_scd2_lookup" -> ((s, d) => {
      val changes = ev(s, d).select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        floor(col("value") / 25).cast("long").as("tier"))
      val dim = Merge.scd2FromChanges(changes, Seq("user_id"), "ts_us",
        Seq("tier"), orderCols = Seq(col("ts_us").asc, col("event_id").asc))
      val purchases = ev(s, d).filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      Merge.scd2Lookup(purchases, dim, Seq("user_id"), "ts_us")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("tier").as("tier_at_purchase"))
        .orderBy(col("event_id"))
    }),

    // --- as-of join (nearest prior signup per purchase) -----------------
    "q24_asof_join" -> ((s, d) => {
      val e = ev(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("signup_ts"))
      AsOfJoin.backward(purchases, signups, Seq("user_id"),
        leftTime = "ts", rightTime = "signup_ts", payload = Seq("signup_ts"))
        .select(col("event_id"), col("user_id"), col("signup_ts").as("last_signup_ts"))
        .orderBy(col("event_id"))
    }),

    // --- nearest as-of (minimal |Δt|, backward wins ties) ----------------
    "q100_asof_nearest" -> ((s, d) => {
      val e = ev(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("signup_ts"))
      AsOfJoin.nearest(purchases, signups, Seq("user_id"),
        leftTime = "ts", rightTime = "signup_ts", payload = Seq("signup_ts"))
        .select(col("event_id"), col("user_id"),
          col("signup_ts").as("nearest_signup_ts"))
        .orderBy(col("event_id"))
    }),

    // --- cross join ------------------------------------------------------
    "q25_cross_join" -> ((s, d) => {
      t(s, d, "region").crossJoin(t(s, d, "nation"))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // --- range (banding) join -------------------------------------------
    "q26_range_join" -> ((s, d) => {
      import s.implicits._
      val bands = Seq(
        ("band0", 0.0, 500.0), ("band1", 500.0, 1000.0),
        ("band2", 1000.0, 1500.0), ("band3", 1500.0, 100000.0))
        .toDF("band", "lo", "hi")
      t(s, d, "part")
        .join(broadcast(bands),
          col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_parts"), dsum(col("p_retailprice")).as("sum_price"))
        .orderBy(col("band"))
    }),

    // --- count distinct (exact) -----------------------------------------
    "q27_count_distinct" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    // --- approx distinct (HLL; rows-only check — no oracle) -------------
    "q28_approx_distinct" -> ((s, d) => {
      t(s, d, "lineitem")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          approx_count_distinct(col("l_orderkey")).as("approx_orders"))
    }))

  // ---------------------------------------------------------------------
  // DuckDB oracle SQL — same semantics, same column names, same order.
  // ---------------------------------------------------------------------

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_base_price,
           round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE), 4) AS sum_disc_price,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
           count(*) AS n_rows,
           count(DISTINCT l_orderkey) AS n_orders
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "q02_projection_cast" ->
      """SELECT c_custkey AS id, upper(c_name) AS name_uc,
           CAST(c_nationkey AS BIGINT) AS nation,
           round(c_acctbal, 2) AS balance, c_mktsegment AS segment
         FROM customer ORDER BY id""",

    "q03_filter_conditional" ->
      """SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_totalprice > 50000.0 THEN 'high'
                WHEN o_totalprice > 10000.0 THEN 'mid' ELSE 'low' END AS price_band,
           make_date(CAST(year(o_orderdate) AS INT), 10,
             CASE WHEN o_orderstatus = 'F' THEN 2 ELSE 30 END) AS synthetic_date
         FROM orders
         WHERE o_totalprice > 1000.0 AND o_orderstatus IN ('O', 'F')
         ORDER BY o_orderkey""",

    "q04_dedup_keepfirst" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nation,
           c_custkey AS first_custkey, c_name AS name
         FROM (SELECT *, row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
               FROM customer) WHERE rn = 1
         ORDER BY nation""",

    "q05_dedup_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",

    "q06_union_all" ->
      """SELECT * FROM (
           SELECT o_orderkey, 'high' AS src FROM orders WHERE o_totalprice > 100000.0
           UNION ALL
           SELECT o_orderkey, 'low' AS src FROM orders WHERE o_totalprice < 2000.0)
         ORDER BY src, o_orderkey""",

    "q07_star_join" ->
      """SELECT n_name,
           round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE), 4) AS revenue,
           count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",

    "q08_outer_join" ->
      """SELECT c_custkey,
           coalesce(n_orders, 0) AS n_orders,
           coalesce(total_spent, 0.0) AS total_spent
         FROM customer
         LEFT JOIN (SELECT o_custkey, count(*) AS n_orders,
                      round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS total_spent
                    FROM orders GROUP BY o_custkey) ON c_custkey = o_custkey
         ORDER BY c_custkey""",

    "q09_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers_with_orders
         FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q10_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
         ORDER BY c_custkey""",

    "q11_first_per_group" ->
      """SELECT c_mktsegment, c_custkey AS top_custkey,
           round(c_acctbal, 2) AS top_balance
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
               FROM customer) WHERE rn = 1
         ORDER BY c_mktsegment""",

    "q12_topk_per_group" ->
      """SELECT o_orderpriority, rnk, o_orderkey, round(o_totalprice, 2) AS price
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
               FROM orders) WHERE rnk <= 3
         ORDER BY o_orderpriority, rnk""",

    "q13_window_running" ->
      """SELECT o_orderkey, o_custkey,
           round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS running_spent
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
         ORDER BY o_orderkey""",

    "q14_top10_orders" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",

    "q15_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         ORDER BY o_custkey""",

    "q16_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         ORDER BY o_custkey""",

    "q17_rollup" ->
      """SELECT l_returnflag, l_linestatus,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_qty,
           count(*) AS n
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",

    "q18_string_funcs" ->
      """SELECT p_partkey, substring(p_name, 1, 8) AS prefix,
           length(p_name) AS name_len, upper(p_brand) AS brand_uc,
           lower(p_type) AS type_lc,
           concat_ws('-', p_brand, p_type) AS brand_type,
           replace(p_name, 'a', '@') AS name_sub
         FROM part WHERE p_name LIKE '%a%'
         ORDER BY p_partkey""",

    "q19_date_funcs" ->
      """SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS dom,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_95,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3mo
         FROM orders ORDER BY o_orderkey""",

    "q20_json_extract" ->
      """SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           count(*) AS n,
           min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q21_upsert" ->
      """WITH target AS (
           SELECT user_id, round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4) AS val
           FROM events WHERE event_type = 'signup' GROUP BY user_id),
         updates AS (
           SELECT user_id, round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4) AS val
           FROM events WHERE event_type = 'purchase' GROUP BY user_id)
         SELECT user_id, val FROM updates
         UNION ALL
         SELECT user_id, val FROM target t
         WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.user_id = t.user_id)
         ORDER BY user_id""",

    "q22_insert_if_absent" ->
      """WITH target AS (
           SELECT user_id, round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4) AS val
           FROM events WHERE event_type = 'signup' GROUP BY user_id),
         inserts AS (
           SELECT user_id, round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4) AS val
           FROM events WHERE event_type = 'purchase' GROUP BY user_id)
         SELECT user_id, val FROM target
         UNION ALL
         SELECT user_id, val FROM inserts i
         WHERE NOT EXISTS (SELECT 1 FROM target t WHERE t.user_id = i.user_id)
         ORDER BY user_id""",

    "q23_keyed_update" ->
      """SELECT o_orderkey,
           coalesce(r.new_price, round(o.o_totalprice, 2)) AS o_totalprice
         FROM orders o
         LEFT JOIN (SELECT l_orderkey,
                      round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS new_price
                    FROM lineitem GROUP BY l_orderkey) r ON o.o_orderkey = r.l_orderkey
         ORDER BY o_orderkey""",

    "q83_scd2" ->
      """WITH changes AS (
           SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                  CAST(floor(value / 25) AS BIGINT) AS tier
           FROM events),
         marked AS (
           SELECT user_id, event_id, ts_us, tier,
                  CASE WHEN row_number() OVER w = 1 THEN TRUE
                       ELSE tier IS DISTINCT FROM lag(tier) OVER w END AS changed
           FROM changes
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)),
         vers AS (
           SELECT user_id, tier, ts_us AS valid_from,
                  lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC) AS valid_to
           FROM marked WHERE changed)
         SELECT user_id, tier, valid_from, valid_to FROM vers
         ORDER BY user_id, valid_from, tier NULLS FIRST""",

    // same version CTE as q83; the lookup is the interval join
    "q108_scd2_lookup" ->
      """WITH changes AS (
           SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                  CAST(floor(value / 25) AS BIGINT) AS tier
           FROM events),
         marked AS (
           SELECT user_id, event_id, ts_us, tier,
                  CASE WHEN row_number() OVER w = 1 THEN TRUE
                       ELSE tier IS DISTINCT FROM lag(tier) OVER w END AS changed
           FROM changes
           WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)),
         vers AS (
           SELECT user_id, tier, ts_us AS valid_from,
                  lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC) AS valid_to
           FROM marked WHERE changed),
         purchases AS (
           SELECT event_id, user_id, epoch_us(ts) AS ts_us
           FROM events WHERE event_type = 'purchase')
         SELECT p.event_id, p.user_id, p.ts_us, v.tier AS tier_at_purchase
         FROM purchases p
         LEFT JOIN vers v ON p.user_id = v.user_id
           AND p.ts_us >= v.valid_from
           AND (v.valid_to IS NULL OR p.ts_us < v.valid_to)
         ORDER BY p.event_id""",

    "q24_asof_join" ->
      """SELECT p.event_id, p.user_id,
           (SELECT max(s.ts) FROM events s
            WHERE s.user_id = p.user_id AND s.event_type = 'signup'
              AND s.ts <= p.ts) AS last_signup_ts
         FROM events p WHERE p.event_type = 'purchase'
         ORDER BY p.event_id""",

    // tie rule mirrored: equal distance -> earlier (backward) signup,
    // via the s.ts ASC secondary sort
    "q100_asof_nearest" ->
      """SELECT p.event_id, p.user_id,
           (SELECT s.ts FROM events s
            WHERE s.user_id = p.user_id AND s.event_type = 'signup'
            ORDER BY abs(epoch_us(s.ts) - epoch_us(p.ts)) ASC, s.ts ASC
            LIMIT 1) AS nearest_signup_ts
         FROM events p WHERE p.event_type = 'purchase'
         ORDER BY p.event_id""",

    "q25_cross_join" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
         ORDER BY r_name, n_name""",

    "q26_range_join" ->
      """SELECT band, count(*) AS n_parts,
           round(CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_price
         FROM part
         JOIN (VALUES ('band0', 0.0, 500.0), ('band1', 500.0, 1000.0),
                      ('band2', 1000.0, 1500.0), ('band3', 1500.0, 100000.0))
              AS bands(band, lo, hi)
           ON p_retailprice >= lo AND p_retailprice < hi
         GROUP BY band ORDER BY band""",

    "q27_count_distinct" ->
      """SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
}
