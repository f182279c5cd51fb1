package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Extended relational breadth: pivot/unpivot, order statistics, moments
  * from exact sums, analytic-window breadth, SQL subquery surfaces,
  * deterministic hash sampling.
  */
object ExtQueries {

  import Catalog._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- pivot (explicit value list -> deterministic schema) -------------
    "q47_pivot" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("o_orderpriority"))
    }),

    // --- unpivot / melt ---------------------------------------------------
    "q48_unpivot" -> ((s, d) => {
      t(s, d, "customer")
        .select(col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"),
          col("c_nationkey").cast("double").as("nationkey"))
        .unpivot(Array(col("c_custkey")),
          Array(col("acctbal"), col("nationkey")), "metric", "val")
        .orderBy(col("c_custkey"), col("metric"))
    }),

    // --- order statistics (exact percentile / median) ---------------------
    "q49_percentiles" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
          round(min(col("o_totalprice")), 2).as("lo"),
          round(max(col("o_totalprice")), 2).as("hi"))
        .orderBy(col("o_orderstatus"))
    }),

    // --- variance/stddev from exact decimal sums (portable moments) ------
    "q50_moments" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).as("s1d"),
          sum((col("l_quantity").cast("decimal(18,2)") *
            col("l_quantity").cast("decimal(18,2)")).cast("decimal(28,4)")).as("s2d"))
        .select(
          col("l_returnflag"), col("n"),
          round((col("s2d").cast("double") -
            col("s1d").cast("double") * col("s1d").cast("double") / col("n")) /
            (col("n") - 1), 4).as("variance"),
          round(sqrt((col("s2d").cast("double") -
            col("s1d").cast("double") * col("s1d").cast("double") / col("n")) /
            (col("n") - 1)), 4).as("stddev"))
        .orderBy(col("l_returnflag"))
    }),

    // --- analytic window breadth ------------------------------------------
    "q51_window_analytics" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, d, "orders")
        .select(
          col("o_orderkey"), col("o_orderstatus"),
          dense_rank().over(w).cast("long").as("drank"),
          ntile(4).over(Window.partitionBy(col("o_orderstatus"))
            .orderBy(col("o_orderkey").asc)).cast("long").as("quartile"),
          round(lead(col("o_totalprice"), 1).over(w), 2).as("next_price"),
          round(first(col("o_totalprice")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .as("first_price"),
          round(last(col("o_totalprice")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .as("running_last"))
        .orderBy(col("o_orderkey"))
    }),

    // --- conditional aggregation ------------------------------------------
    "q52_conditional_agg" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_linestatus"))
        .agg(
          count_if(col("l_discount") > 0.05).as("n_discounted"),
          dsum(when(col("l_returnflag") === "R", col("l_extendedprice"))
            .otherwise(lit(0.0))).as("returned_value"),
          count(when(col("l_quantity") > 25, lit(1))).as("n_bulk"))
        .orderBy(col("l_linestatus"))
    }),

    // --- null handling functions ------------------------------------------
    "q53_null_funcs" -> ((s, d) => {
      t(s, d, "customer")
        .select(
          col("c_custkey"),
          round(coalesce(nullif(col("c_acctbal"), lit(0.0)), lit(-1.0)), 2)
            .as("bal_or_flag"),
          round(greatest(col("c_acctbal"), lit(0.0)), 2).as("bal_floor"),
          round(least(col("c_acctbal"), lit(5000.0)), 2).as("bal_cap"),
          isnull(col("c_name")).as("name_missing"))
        .orderBy(col("c_custkey"))
    }),

    // --- scalar subquery (SQL surface) ------------------------------------
    "q54_scalar_subquery" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("graft_ord_sq")
      s.sql(
        """SELECT o_orderkey, round(o_totalprice, 2) AS price
           FROM graft_ord_sq
           WHERE o_totalprice > 2 * (
             SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
             FROM graft_ord_sq)
           ORDER BY o_orderkey""")
    }),

    // --- IN / NOT IN subqueries (SQL surface) ------------------------------
    "q55_in_subquery" -> ((s, d) => {
      t(s, d, "customer").createOrReplaceTempView("graft_cust_in")
      t(s, d, "orders").createOrReplaceTempView("graft_ord_in")
      s.sql(
        """SELECT c_custkey, c_mktsegment FROM graft_cust_in
           WHERE c_custkey IN (SELECT o_custkey FROM graft_ord_in
                               WHERE o_totalprice > 150000.0)
           ORDER BY c_custkey""")
    }),

    // --- LIKE / regexp predicates ------------------------------------------
    "q56_like_regex" -> ((s, d) => {
      t(s, d, "part")
        .select(
          col("p_partkey"),
          col("p_name").like("%gold%").as("has_gold"),
          col("p_name").rlike("^[a-m]").as("starts_a_to_m"),
          col("p_type").startsWith("STANDARD").as("is_standard"),
          col("p_brand").endsWith("3").as("brand_ends_3"))
        .orderBy(col("p_partkey"))
    }),

    // --- deterministic portable hash sampling ------------------------------
    "q57_hash_sample" -> ((s, d) => {
      // md5 is identical across engines; keep ~1/8 of orders
      t(s, d, "orders")
        .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1).isin("0", "1"))
        .select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    }),

    // --- stratified deterministic sampling --------------------------------
    // Different keep-rate per stratum (status F ~1/8, O ~1/4, else ~1/2)
    // via the engines' shared md5: reproducible cross-engine sampling with
    // no RNG state — the pattern for corpus downsampling where strata
    // (language, source) need different rates. Pure narrow filter: no
    // shuffle, pushes the sample below any later join/agg.
    "q80_stratified_sample" -> ((s, d) => {
      t(s, d, "orders")
        .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1) <=
          when(col("o_orderstatus") === "F", "1")
            .when(col("o_orderstatus") === "O", "3")
            .otherwise("7"))
        .select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    }),

    // --- fixed-size per-stratum sample (deterministic reservoir analog) ---
    // Exactly k rows per stratum, chosen by hash order: the distributed
    // replacement for reservoir sampling — no RNG state, stable across
    // runs and partitionings, one shuffle on the stratum key (window
    // rank), early-exit at rank k. doc_id tiebreak makes md5 collisions
    // (and the order itself) fully deterministic.
    "q94_fixed_per_stratum" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source"))
        .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
      t(s, d, "documents")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("source"), col("doc_id"))
        .orderBy(col("source"), col("doc_id"))
    }),

    // --- weighted sampling WITHOUT replacement (fixed k per stratum) -------
    // Efraimidis–Spirakis exponential jitter over md5-derived uniforms:
    // selection probability proportional to weight, exactly k survivors
    // per source, zero RNG state — the quality-weighted curation
    // counterpart of q94's uniform fixed-size sample. Weights ride a
    // deterministic 1..5 grid derived from doc_id so the oracle rebuilds
    // them bit-for-bit.
    "q104_weighted_sample" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("source"),
        (pmod(col("doc_id"), lit(5L)) + lit(1L)).cast("double").as("weight"))
      graft.operators.Splits.weightedSamplePerStratum(
          docs, "doc_id", "source", col("weight"), k = 20)
        .select(col("doc_id"), col("source"), col("weight"))
        .orderBy(col("doc_id"))
    }),

    // --- weighted sampling, mergeable-aggregate form -----------------------
    // Same Efraimidis-Spirakis selection as q104 (so the same oracle
    // shape), executed as a k-capped heap aggregate with map-side
    // combine instead of a per-stratum window sort — the single-giant-
    // stratum escape hatch, proven row-identical by SplitsSpec.
    "q153_weighted_sample_agg" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("source"),
        (pmod(col("doc_id"), lit(5L)) + lit(1L)).cast("double").as("weight"))
      graft.operators.Splits.weightedSamplePerStratumAgg(
          docs, "doc_id", "source", col("weight"), k = 20)
        .select(col("doc_id"), col("source"), col("weight"))
        .orderBy(col("doc_id"))
    }),

    // --- posexplode with ordinality ---------------------------------------
    "q58_posexplode" -> ((s, d) => {
      t(s, d, "documents")
        .filter(col("doc_id") < 10)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .withColumnRenamed("pos", "token_pos")
        .withColumnRenamed("col", "token")
        .orderBy(col("doc_id"), col("token_pos"))
    }),

    // --- map construction + access over parsed JSON ------------------------
    "q59_map_funcs" -> ((s, d) => {
      ev(s, d)
        .select(
          col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>")).as("m"))
        .select(
          col("event_id"),
          map_keys(col("m")).getItem(0).as("first_key"),
          element_at(col("m"), "k").as("k_value"),
          size(col("m")).cast("long").as("n_keys"))
        .orderBy(col("event_id"))
    }))

  def oracleSql: Map[String, String] = Map(
    "q47_pivot" ->
      """SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
           count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
           count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q48_unpivot" ->
      """SELECT c_custkey, metric, val FROM (
           SELECT c_custkey, 'acctbal' AS metric, round(c_acctbal, 2) AS val FROM customer
           UNION ALL
           SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer)
         ORDER BY c_custkey, metric""",

    "q49_percentiles" ->
      """SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q50_moments" ->
      """SELECT l_returnflag, count(*) AS n,
           round((CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                  - CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                    * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*))
                 / (count(*) - 1), 4) AS variance,
           round(sqrt((CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                  - CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                    * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*))
                 / (count(*) - 1)), 4) AS stddev
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q51_window_analytics" ->
      """SELECT o_orderkey, o_orderstatus,
           dense_rank() OVER w AS drank,
           ntile(4) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey ASC) AS quartile,
           round(lead(o_totalprice, 1) OVER w, 2) AS next_price,
           round(first_value(o_totalprice) OVER
             (PARTITION BY o_orderstatus ORDER BY o_orderdate ASC, o_orderkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS first_price,
           round(last_value(o_totalprice) OVER
             (PARTITION BY o_orderstatus ORDER BY o_orderdate ASC, o_orderkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_last
         FROM orders
         WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderdate ASC, o_orderkey ASC)
         ORDER BY o_orderkey""",

    "q52_conditional_agg" ->
      """SELECT l_linestatus,
           count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           round(CAST(sum(CAST(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0.0 END
             AS DECIMAL(18,2))) AS DOUBLE), 4) AS returned_value,
           count(*) FILTER (WHERE l_quantity > 25) AS n_bulk
         FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",

    "q53_null_funcs" ->
      """SELECT c_custkey,
           round(coalesce(nullif(c_acctbal, 0.0), -1.0), 2) AS bal_or_flag,
           round(greatest(c_acctbal, 0.0), 2) AS bal_floor,
           round(least(c_acctbal, 5000.0), 2) AS bal_cap,
           (c_name IS NULL) AS name_missing
         FROM customer ORDER BY c_custkey""",

    "q54_scalar_subquery" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price
         FROM orders
         WHERE o_totalprice > 2 * (
           SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
           FROM orders)
         ORDER BY o_orderkey""",

    "q55_in_subquery" ->
      """SELECT c_custkey, c_mktsegment FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders
                             WHERE o_totalprice > 150000.0)
         ORDER BY c_custkey""",

    "q56_like_regex" ->
      """SELECT p_partkey,
           (p_name LIKE '%gold%') AS has_gold,
           regexp_matches(p_name, '^[a-m]') AS starts_a_to_m,
           (p_type LIKE 'STANDARD%') AS is_standard,
           (p_brand LIKE '%3') AS brand_ends_3
         FROM part ORDER BY p_partkey""",

    "q57_hash_sample" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
         WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
         ORDER BY o_orderkey""",

    "q80_stratified_sample" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
         WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) <=
           CASE o_orderstatus WHEN 'F' THEN '1' WHEN 'O' THEN '3' ELSE '7' END
         ORDER BY o_orderkey""",

    "q94_fixed_per_stratum" ->
      """SELECT source, doc_id FROM (
           SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
           FROM documents)
         WHERE rk <= 5 ORDER BY source, doc_id""",

    // the same 52-bit md5 uniform ((v+1) * 2^-52 — exact in double) and
    // the same Exp(weight) priority; ln() is the one non-exact op, and
    // rank flips would need two priorities within ~1 ulp of each other
    "q104_weighted_sample" ->
      """WITH w AS (
           SELECT doc_id, source, CAST((doc_id % 5) + 1 AS DOUBLE) AS weight
           FROM documents),
         pr AS (
           SELECT doc_id, source, weight,
             -ln((('0x' || substr(md5('wsr' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT + 1)
                 / 4503599627370496.0) / weight AS p
           FROM w),
         rk AS (
           SELECT doc_id, source, weight,
             row_number() OVER (PARTITION BY source ORDER BY p ASC, doc_id ASC) AS rn
           FROM pr)
         SELECT doc_id, source, weight FROM rk WHERE rn <= 20 ORDER BY doc_id""",

    // identical selection to q104 — the aggregate changes execution,
    // not the sample
    "q153_weighted_sample_agg" ->
      """WITH w AS (
           SELECT doc_id, source, CAST((doc_id % 5) + 1 AS DOUBLE) AS weight
           FROM documents),
         pr AS (
           SELECT doc_id, source, weight,
             -ln((('0x' || substr(md5('wsr' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT + 1)
                 / 4503599627370496.0) / weight AS p
           FROM w),
         rk AS (
           SELECT doc_id, source, weight,
             row_number() OVER (PARTITION BY source ORDER BY p ASC, doc_id ASC) AS rn
           FROM pr)
         SELECT doc_id, source, weight FROM rk WHERE rn <= 20 ORDER BY doc_id""",

    "q58_posexplode" ->
      """SELECT doc_id, CAST(generate_subscripts(toks, 1) - 1 AS INT) AS token_pos,
           unnest(toks) AS token
         FROM (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents WHERE doc_id < 10) t
         ORDER BY doc_id, token_pos""",

    "q59_map_funcs" ->
      """SELECT event_id,
           json_keys(props)[1] AS first_key,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           CAST(len(json_keys(props)) AS BIGINT) AS n_keys
         FROM events ORDER BY event_id""")
}
