package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 second batch: resampling inference (Poisson bootstrap,
  * randomization test), forecast backtesting, robust trend, and the
  * remaining categorical/tree/text operators of SURVEY §2.J. */
object ExtQueries3 {

  import Catalog._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- G-test of independence -------------------------------------------
    // The q183 contingency table under the log-likelihood-ratio lens.
    "q240_g_test" -> ((s, d) =>
      graft.operators.Features.gTest(
          t(s, d, "orders").join(t(s, d, "customer"),
            col("o_custkey") === col("c_custkey")),
          "c_mktsegment", "o_orderpriority")
        .orderBy(col("c_mktsegment"), col("o_orderpriority"))),

    // --- forecast-accuracy scorecard ---------------------------------------
    // Backtest of the lag-7 seasonal-naive forecast on q215's daily
    // event-count series: does last week predict this week better than
    // yesterday does?
    "q241_forecast_accuracy" -> ((s, d) => {
      val srs = ev(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).cast("double").as("y"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      graft.operators.TimeSeries.forecastAccuracy(
          srs.withColumn("fc", lag(col("y"), 7).over(w)),
          "event_type", "day", "y", "fc")
        .orderBy(col("event_type"))
    }),

    // --- Theil–Sen robust trend --------------------------------------------
    // Median-of-pairwise-slopes daily volume trend per event type
    // (30-point series per key — the many-short-series contract).
    "q242_theil_sen" -> ((s, d) =>
      graft.operators.TimeSeries.theilSen(
          ev(s, d).groupBy(col("event_type"),
              datediff(col("ts").cast("date"),
                lit("2024-01-01").cast("date")).as("t"))
            .agg(count(lit(1)).cast("double").as("v")),
          "event_type", "t", "v")
        .orderBy(col("event_type"))),

    // --- Poisson bootstrap CI ----------------------------------------------
    // 95% percentile-bootstrap error bars on mean event value per type,
    // B = 200 deterministic md5-seeded replicates.
    "q243_bootstrap_ci" -> ((s, d) =>
      graft.operators.Eval.bootstrapCi(
          ev(s, d), "event_type", "event_id", "value",
          b = 200, alpha = 0.05)
        .orderBy(col("event_type"))),

    // --- randomization test ------------------------------------------------
    // Is the purchase-vs-click mean value difference explainable by
    // label exchange? B = 200 pseudo-experiments.
    "q244_randomization_test" -> ((s, d) =>
      graft.operators.Eval.randomizationTest(
        ev(s, d), "event_id", "event_type", "value",
        "purchase", "click", b = 200)),
  )

  def oracleSql: Map[String, String] = Map(
    // q183's oracle with the cell contribution swapped to 2·o·ln(o/e);
    // empty cells never materialize on either side
    "q240_g_test" ->
      """WITH j AS (
           SELECT c.c_mktsegment, o.o_orderpriority
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
         cell AS (SELECT c_mktsegment, o_orderpriority,
                    CAST(count(*) AS DOUBLE) AS obs FROM j GROUP BY 1, 2),
         rt AS (SELECT c_mktsegment, sum(obs) AS rt FROM cell GROUP BY 1),
         ct AS (SELECT o_orderpriority, sum(obs) AS ct FROM cell GROUP BY 1),
         n AS (SELECT sum(obs) AS n FROM cell)
         SELECT cell.c_mktsegment, cell.o_orderpriority,
           CAST(obs AS BIGINT) AS obs,
           round(rt.rt * ct.ct / n.n, 4) AS expected,
           round(2.0 * obs * ln(obs / (rt.rt * ct.ct / n.n)), 6)
             AS g_contrib
         FROM cell JOIN rt USING (c_mktsegment)
           JOIN ct USING (o_orderpriority), n
         ORDER BY c_mktsegment, o_orderpriority""",

    // same keyed lag construction: fc = lag-7, naive denominator = lag-1
    // over the FULL series; every error term 9-grid rounded into a
    // DECIMAL(38,9) sum, one division per metric
    "q241_forecast_accuracy" ->
      """WITH srs AS (SELECT event_type AS g, CAST(ts AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS y
           FROM events GROUP BY 1, 2),
         f AS (SELECT g, y,
             lag(y, 7) OVER (PARTITION BY g ORDER BY day) AS fc,
             lag(y, 1) OVER (PARTITION BY g ORDER BY day) AS nv
           FROM srs),
         agg AS (SELECT g, count(*) AS n, count(fc) AS n_scored,
             sum(CASE WHEN fc IS NOT NULL THEN
               CAST(round(abs(y - fc), 9) AS DECIMAL(38,9)) END) AS sae,
             sum(CASE WHEN fc IS NOT NULL THEN
               CAST(round(abs(y - fc) * abs(y - fc), 9)
                 AS DECIMAL(38,9)) END) AS sse,
             count(CASE WHEN fc IS NOT NULL
               AND abs(y) + abs(fc) > 0 THEN 1 END) AS ns,
             sum(CASE WHEN fc IS NOT NULL AND abs(y) + abs(fc) > 0 THEN
               CAST(round(2.0 * abs(y - fc) / (abs(y) + abs(fc)), 9)
                 AS DECIMAL(38,9)) END) AS ss,
             count(nv) AS nn,
             sum(CAST(round(abs(y - nv), 9) AS DECIMAL(38,9))) AS sn
           FROM f GROUP BY 1)
         SELECT g AS event_type, n, n_scored,
           round(CAST(sae AS DOUBLE) / n_scored, 6) AS mae,
           round(sqrt(CAST(sse AS DOUBLE) / n_scored), 6) AS rmse,
           round(CAST(ss AS DOUBLE) / ns, 6) AS smape,
           round(CASE WHEN nn > 0 AND sn > 0 AND n_scored > 0 THEN
             (CAST(sae AS DOUBLE) / n_scored) /
               (CAST(sn AS DOUBLE) / nn) END, 6) AS mase
         FROM agg ORDER BY event_type""",

    // pairs by key-equi self-join with t1 < t2; both medians are the
    // exact lower (ceil(m/2)-th) order statistic off a slope-level
    // cumulative walk — ties collapse to grid rows, identical levels
    // on both engines because the 9-grid round happens BEFORE grouping
    "q242_theil_sen" ->
      """WITH srs AS (SELECT event_type AS g,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
               AS DOUBLE) AS t,
             CAST(count(*) AS DOUBLE) AS v
           FROM events GROUP BY event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE))),
         p AS (SELECT a.g, round((b.v - a.v) / (b.t - a.t), 9) AS s
           FROM srs a JOIN srs b ON a.g = b.g AND a.t < b.t),
         lvl AS (SELECT g, s, count(*) AS c FROM p GROUP BY 1, 2),
         m AS (SELECT g, CAST(sum(c) AS BIGINT) AS m FROM lvl GROUP BY 1),
         w AS (SELECT g, s, c,
             sum(c) OVER (PARTITION BY g ORDER BY s) AS cum FROM lvl),
         sl AS (SELECT w.g, s AS slope, m
           FROM w JOIN m USING (g)
           WHERE cum >= ceil(m / 2.0) AND cum - c < ceil(m / 2.0)),
         r AS (SELECT srs.g, round(v - slope * t, 9) AS s
           FROM srs JOIN sl ON srs.g = sl.g),
         rl AS (SELECT g, s, count(*) AS c FROM r GROUP BY 1, 2),
         rm AS (SELECT g, CAST(sum(c) AS BIGINT) AS m2 FROM rl GROUP BY 1),
         rw AS (SELECT g, s, c,
             sum(c) OVER (PARTITION BY g ORDER BY s) AS cum FROM rl),
         ic AS (SELECT rw.g, s AS icept
           FROM rw JOIN rm USING (g)
           WHERE cum >= ceil(m2 / 2.0) AND cum - c < ceil(m2 / 2.0)),
         n AS (SELECT g, count(*) AS n FROM srs GROUP BY 1)
         SELECT n.g AS event_type, n.n AS n,
           CAST(coalesce(sl.m, 0) AS BIGINT) AS n_pairs,
           round(sl.slope, 6) AS slope, round(ic.icept, 6) AS intercept
         FROM n LEFT JOIN sl USING (g) LEFT JOIN ic USING (g)
         ORDER BY event_type""",

    // the same 52-bit md5 uniform per (id, replicate), the same pinned
    // Poisson(1) inverse-CDF literals (CAST AS DOUBLE — a bare decimal
    // literal would compare in DECIMAL), the same exact ceil-rank order
    // statistics off the replicate-mean grid
    "q243_bootstrap_ci" ->
      """WITH rows AS (SELECT event_type AS g, CAST(event_id AS VARCHAR) AS id,
             CAST(value AS DOUBLE) AS v
           FROM events WHERE value IS NOT NULL),
         point AS (SELECT g, count(*) AS n,
             round(CAST(sum(CAST(round(v, 9) AS DECIMAL(38,9))) AS DOUBLE)
               / count(*), 6) AS mean
           FROM rows GROUP BY 1),
         rep AS (SELECT g, id, v, t.r AS r FROM rows, range(1, 201) t(r)),
         wt AS (SELECT g, r, v,
             (('0x' || substr(md5('boot' || id || '#' || CAST(r AS VARCHAR)),
               1, 13))::BIGINT + 1) / 4503599627370496.0 AS u
           FROM rep),
         w AS (SELECT g, r, v, CASE
             WHEN u <= CAST(0.36787944117144233 AS DOUBLE) THEN 0
             WHEN u <= CAST(0.7357588823428847 AS DOUBLE) THEN 1
             WHEN u <= CAST(0.9196986029286058 AS DOUBLE) THEN 2
             WHEN u <= CAST(0.9810118431238463 AS DOUBLE) THEN 3
             WHEN u <= CAST(0.9963401531726563 AS DOUBLE) THEN 4
             WHEN u <= CAST(0.9994058151824183 AS DOUBLE) THEN 5
             WHEN u <= CAST(0.999916758850712 AS DOUBLE) THEN 6
             WHEN u <= CAST(0.9999897508033253 AS DOUBLE) THEN 7
             WHEN u <= CAST(0.999998874797402 AS DOUBLE) THEN 8
             ELSE 9 END AS w
           FROM wt),
         rm AS (SELECT g, r,
             round(CAST(sum(CAST(round(w * v, 9) AS DECIMAL(38,9)))
               AS DOUBLE) / sum(w), 9) AS m
           FROM w GROUP BY 1, 2 HAVING sum(w) > 0),
         lvl AS (SELECT g, m, count(*) AS c FROM rm GROUP BY 1, 2),
         eff AS (SELECT g, CAST(sum(c) AS BIGINT) AS b_eff FROM lvl GROUP BY 1),
         wk AS (SELECT g, m, c,
             sum(c) OVER (PARTITION BY g ORDER BY m) AS cum FROM lvl),
         lo AS (SELECT wk.g, round(m, 6) AS lo FROM wk JOIN eff USING (g)
           WHERE cum >= ceil(CAST(b_eff AS DOUBLE) * CAST(0.025 AS DOUBLE))
             AND cum - c < ceil(CAST(b_eff AS DOUBLE) * CAST(0.025 AS DOUBLE))),
         hi AS (SELECT wk.g, round(m, 6) AS hi FROM wk JOIN eff USING (g)
           WHERE cum >= ceil(CAST(b_eff AS DOUBLE) * CAST(0.975 AS DOUBLE))
             AND cum - c < ceil(CAST(b_eff AS DOUBLE) * CAST(0.975 AS DOUBLE)))
         SELECT point.g AS event_type, n, mean, b_eff, lo, hi
         FROM point JOIN eff USING (g) JOIN lo USING (g) JOIN hi USING (g)
         ORDER BY event_type""",

    // independent-Bernoulli pseudo-assignment from the same uniform;
    // both d_obs and every pseudo-diff round to the 9-grid BEFORE the
    // exceed comparison
    "q244_randomization_test" ->
      """WITH rows AS (SELECT CAST(event_id AS VARCHAR) AS id,
             event_type = 'purchase' AS a, CAST(value AS DOUBLE) AS v
           FROM events WHERE value IS NOT NULL
             AND event_type IN ('purchase', 'click')),
         tot AS (SELECT
             sum(CASE WHEN a THEN 1 ELSE 0 END) AS n_a,
             sum(CASE WHEN a THEN 0 ELSE 1 END) AS n_b,
             sum(CASE WHEN a THEN CAST(round(v, 9) AS DECIMAL(38,9)) END) AS sa,
             sum(CASE WHEN NOT a THEN CAST(round(v, 9) AS DECIMAL(38,9)) END) AS sb
           FROM rows),
         obs AS (SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             round(CAST(sa AS DOUBLE) / n_a - CAST(sb AS DOUBLE) / n_b, 9)
               AS d_obs
           FROM tot),
         rep AS (SELECT id, v, t.r AS r FROM rows, range(1, 201) t(r)),
         asg AS (SELECT r, v,
             (('0x' || substr(md5('perm' || id || '#' || CAST(r AS VARCHAR)),
               1, 13))::BIGINT + 1) / 4503599627370496.0
               < CAST(n_a AS DOUBLE) / (n_a + n_b) AS pa
           FROM rep, obs),
         d AS (SELECT r,
             round(CAST(sum(CASE WHEN pa THEN
                   CAST(round(v, 9) AS DECIMAL(38,9)) END) AS DOUBLE)
                 / count(CASE WHEN pa THEN 1 END)
               - CAST(sum(CASE WHEN NOT pa THEN
                   CAST(round(v, 9) AS DECIMAL(38,9)) END) AS DOUBLE)
                 / count(CASE WHEN NOT pa THEN 1 END), 9) AS dr
           FROM asg GROUP BY 1
           HAVING count(CASE WHEN pa THEN 1 END) > 0
             AND count(CASE WHEN NOT pa THEN 1 END) > 0),
         pv AS (SELECT CAST(count(*) AS BIGINT) AS b_eff,
             count(CASE WHEN abs(dr) >=
               abs((SELECT d_obs FROM obs)) THEN 1 END) AS ex
           FROM d)
         SELECT n_a, n_b, round(d_obs, 6) AS diff_obs, b_eff,
           round(CAST(1 + ex AS DOUBLE) / (1 + b_eff), 6) AS p_value
         FROM obs, pv""",
  )
}
