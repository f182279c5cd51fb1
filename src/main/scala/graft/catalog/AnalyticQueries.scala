package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-join analytical queries in classic TPC-H shapes (Q3/Q5/Q10
  * analogs on the testdata star schema) — the bench-relevant workloads:
  * selective filters pushed to scans, dimension broadcasts, fact-fact
  * shuffle joins, aggregate + top-k. */
object AnalyticQueries {

  import Catalog._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- Q3 analog: shipping priority — top 10 orders by revenue ---------
    "q70_shipping_priority" -> ((s, d) => {
      val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") < lit("1997-01-01"))
      val li = t(s, d, "lineitem")
        .filter(col("l_shipdate") > lit("1996-06-30"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(discRevenue.as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // --- Q5 analog: revenue by nation through the full star --------------
    "q71_nation_volume" -> ((s, d) => {
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .filter(col("c_nationkey") === col("s_nationkey")) // local supplier
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(discRevenue.as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("revenue").desc, col("n_name"))
    }),

    // --- Q10 analog: top customers by returned-item revenue --------------
    "q72_returned_revenue" -> ((s, d) => {
      t(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(discRevenue.as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // --- Q7 analog: cross-border trade volume by nation pair and year ----
    // Two broadcast copies of the nation dim under different role names;
    // the fact-fact lineitem ⋈ orders shuffle dominates and is exactly
    // what AQE/bloom-filter machinery targets at scale.
    "q84_nation_trade" -> ((s, d) => {
      val n1 = t(s, d, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = t(s, d, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(col("supp_nation") =!= col("cust_nation")) // cross-border only
        .withColumn("l_year", year(col("l_shipdate")).cast("long"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(discRevenue.as("volume"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // --- Q14 analog: promo revenue share by month ------------------------
    // Conditional share of a broadcast-dim attribute over the fact table:
    // exact decimal sums for both numerator and denominator, one double
    // division at the end (reproducible vs the oracle).
    "q92_promo_share" -> ((s, d) => {
      val rev = (col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        .cast("decimal(28,4)")
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .withColumn("month", date_trunc("month", col("l_shipdate")).cast("date"))
        .groupBy(col("month"))
        .agg(
          sum(when(col("p_type") === "PROMO", rev)
            .otherwise(lit(0).cast("decimal(28,4)"))).as("promo_rev"),
          sum(rev).as("total_rev"))
        .select(col("month"),
          round(lit(100.0) * col("promo_rev").cast("double") /
            col("total_rev").cast("double"), 4).as("promo_share"),
          round(col("total_rev").cast("double"), 4).as("total_revenue"))
        .orderBy(col("month"))
    }),

    // --- Q19 analog: disjunctive multi-attribute predicate join ----------
    // OR-of-AND predicate groups spanning both join sides — the shape
    // that exercises predicate normalization and join-condition pushdown
    // (Catalyst extracts the common l_partkey = p_partkey equi-condition;
    // the residual disjunction evaluates post-join).
    "q93_disjunctive_join" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val part = broadcast(t(s, d, "part"))
      li.join(part, col("l_partkey") === col("p_partkey") && (
          (col("p_type") === "SMALL" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_type") === "MEDIUM" && col("p_size").between(10, 30) &&
            col("l_quantity").between(10, 35)) ||
          (col("p_type") === "LARGE" && col("p_size").between(20, 50) &&
            col("l_quantity").between(20, 50))))
        .agg(discRevenue.as("revenue"), count(lit(1)).as("n_items"))
    }),

    // --- salted join (hot-key skew hardening) -----------------------------
    // The explicit-salt path for the key so hot that AQE's partition
    // splitting can't help (AQE splits shuffle partitions, not keys):
    // lineitem fans out over (suppkey, salt), supplier replicates across
    // the 8 salt values — no single reducer ever owns a whole key. The
    // result is EQUAL to the plain join by construction, so the oracle is
    // simply the unsalted SQL join; SkewAndAsOfSpec pins plan shape.
    "q105_salted_join" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(
        col("l_suppkey").as("suppkey"), col("l_quantity"),
        col("l_orderkey"), col("l_linenumber"))
      val supp = t(s, d, "supplier").select(
        col("s_suppkey").as("suppkey"), col("s_nationkey"))
      graft.operators.SkewJoin.saltedInner(li, supp, "suppkey",
          saltSource = col("l_orderkey") * lit(8L) + col("l_linenumber"),
          buckets = 8)
        .groupBy(col("s_nationkey"))
        .agg(dsum(col("l_quantity")).as("total_qty"),
          count(lit(1)).as("n_items"))
        .orderBy(col("s_nationkey"))
    }),

    // --- Q13 analog: order-count distribution over customers -------------
    // LEFT join with a non-trivial join-side predicate (urgent orders
    // excluded IN the join condition, not a post-filter — zero-order
    // customers must survive), double aggregation.
    "q179_custdist" -> ((s, d) => {
      val cust = t(s, d, "customer").select(col("c_custkey"))
      val ord = t(s, d, "orders")
      val counts = cust.join(ord,
          cust("c_custkey") === ord("o_custkey") &&
            ord("o_orderpriority") =!= "1-URGENT", "left")
        .groupBy(cust("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      counts.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }))

  def oracleSql: Map[String, String] = Map(
    // the unsalted join IS the oracle: salting must not change results
    "q105_salted_join" ->
      """SELECT s_nationkey,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4) AS total_qty,
           count(*) AS n_items
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY s_nationkey ORDER BY s_nationkey""",
    "q70_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
           round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE), 4) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate > TIMESTAMP '1996-06-30 00:00:00'
           AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
           AND EXISTS (SELECT 1 FROM customer
                       WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""",

    "q71_nation_volume" ->
      """SELECT r_name, n_name,
           round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE), 4) AS revenue,
           count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE c_nationkey = s_nationkey
         GROUP BY r_name, n_name
         ORDER BY r_name, revenue DESC, n_name""",

    "q72_returned_revenue" ->
      """SELECT c_custkey, c_name, n_name,
           round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE), 4) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE l_returnflag = 'R'
         GROUP BY c_custkey, c_name, n_name
         ORDER BY revenue DESC, c_custkey ASC LIMIT 20""",

    "q92_promo_share" ->
      """SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
           round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev
                                       ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE)
                 / CAST(sum(rev) AS DOUBLE), 4) AS promo_share,
           round(CAST(sum(rev) AS DOUBLE), 4) AS total_revenue
         FROM (SELECT l_shipdate, p_type,
                 CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4)) AS rev
               FROM lineitem JOIN part ON l_partkey = p_partkey) t
         GROUP BY 1 ORDER BY month""",

    "q93_disjunctive_join" ->
      """SELECT
           round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE), 4) AS revenue,
           count(*) AS n_items
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_type = 'SMALL' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
            OR (p_type = 'MEDIUM' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
            OR (p_type = 'LARGE' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)""",

    "q84_nation_trade" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE), 4) AS volume
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation n1 ON s_nationkey = n1.n_nationkey
         JOIN nation n2 ON c_nationkey = n2.n_nationkey
         WHERE n1.n_name <> n2.n_name
         GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""",

    "q179_custdist" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
           SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
           FROM customer c LEFT JOIN orders o
             ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
           GROUP BY c.c_custkey) t
         GROUP BY c_count ORDER BY custdist DESC, c_count DESC""")
}
