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
    }))

  def oracleSql: Map[String, String] = Map(
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
         GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""")
}
