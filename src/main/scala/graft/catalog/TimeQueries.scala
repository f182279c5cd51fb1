package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowing over `events` (batch form of the streaming surface
  * — identical `window()`/`session_window()` expressions run unchanged
  * under `readStream`, see graft.streaming) plus multi-dimensional
  * aggregates (cube / grouping sets).
  */
object TimeQueries {

  import Catalog._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- tumbling window -------------------------------------------------
    "q29_tumbling_window" -> ((s, d) => {
      ev(s, d)
        .groupBy(window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("w_start"), col("n"), col("sum_value"))
        .orderBy(col("w_start"))
    }),

    // --- sliding window (10 min window, 5 min slide) ---------------------
    "q30_sliding_window" -> ((s, d) => {
      ev(s, d)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("w_start"), col("n"), col("sum_value"))
        .orderBy(col("w_start"))
    }),

    // --- session window (4 h inactivity gap) -----------------------------
    "q31_session_window" -> ((s, d) => {
      ev(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "4 hours"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("n_events"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    // --- cube -------------------------------------------------------------
    "q32_cube" -> ((s, d) => {
      t(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    // --- grouping sets (SQL surface) -------------------------------------
    "q33_grouping_sets" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("graft_li_gs")
      s.sql(
        """SELECT l_returnflag, l_linestatus, count(*) AS n,
             round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_qty
           FROM graft_li_gs
           GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
           ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
    }),

    // --- per-group moving average over event time ------------------------
    "q34_moving_avg" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, 0)
      ev(s, d)
        .withColumn("mov_sum",
          round(sum(col("value").cast("decimal(18,2)")).over(w).cast("double"), 4))
        .withColumn("mov_n", count(lit(1)).over(w))
        .select(col("event_id"), col("user_id"), col("mov_sum"), col("mov_n"))
        .orderBy(col("event_id"))
    }),

    // --- gap-based sessionization with explicit session numbers ----------
    // Complements q31 (session_window aggregates): assigns each EVENT its
    // per-user session ordinal — lag + running sum over per-user
    // partitions, the batch twin of stateful streaming sessionization.
    // Gap compares integer microseconds on both engines (sub-second-exact).
    "q79_sessionize" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      ev(s, d)
        .withColumn("new_s",
          when(lag(col("ts"), 1).over(w).isNull ||
            unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
              > 1800000000L, 1L).otherwise(0L))
        .withColumn("session_no",
          sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("user_id"), col("event_id"), col("session_no"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // --- conversion funnel (24 h window) ---------------------------------
    // view -> click -> purchase, each step within 24 h of the previous:
    // the ordered-sequence conversion report.
    "q160_funnel" -> ((s, d) =>
      graft.operators.Funnel.funnel(ev(s, d), "user_id", "event_type",
          "ts", Seq("view", "click", "purchase"),
          maxGapUs = Some(24L * 3600L * 1000000L))
        .orderBy(col("step"))),

    // --- weekly cohort retention -----------------------------------------
    "q161_retention" -> ((s, d) =>
      graft.operators.Funnel.cohortRetention(ev(s, d), "user_id", "ts",
          "week")
        .orderBy(col("cohort"), col("period_offset"))),

    // --- sequential pair support -----------------------------------------
    // For every ordered type pair: how many users did a strictly
    // before b, however many events apart — the non-contiguous
    // complement to q163/q168.
    "q230_seq_support" -> ((s, d) =>
      graft.operators.Funnel.sequentialSupport(ev(s, d), "user_id",
        "event_type", "ts")),

    // --- event-type transition matrix ------------------------------------
    // P(next event type | current) over each user's time-ordered
    // sequence, event_id as the equal-ts tie-break.
    "q163_transitions" -> ((s, d) =>
      graft.operators.Funnel.transitionMatrix(ev(s, d), "user_id",
          "event_type", "ts", "event_id")
        .orderBy(col("from_type"), col("to_type"))),

    // --- top user-journey paths -------------------------------------------
    // The 10 most frequent 3-step event sequences.
    "q168_top_paths" -> ((s, d) =>
      graft.operators.Funnel.topPaths(ev(s, d), "user_id", "event_type",
        "ts", "event_id", len = 3, k = 10)),

    // --- event-time RANGE window (24 h trailing per user) ------------------
    // Value-based frame over epoch micros — unlike q34's ROWS frame,
    // the window spans whatever number of events falls in the interval
    // (and all ties of the current timestamp).
    "q169_range_window" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-86400000000L, 0L)
      ev(s, d)
        .withColumn("w_sum",
          round(sum(col("value").cast("decimal(18,2)")).over(w)
            .cast("double"), 4))
        .withColumn("w_n", count(lit(1)).over(w))
        .select(col("event_id"), col("user_id"), col("w_sum"), col("w_n"))
        .orderBy(col("event_id"))
    }),

    // --- time-decayed engagement score (7-day half-life) ------------------
    "q171_decayed_sum" -> ((s, d) =>
      graft.operators.Features.decayedSum(ev(s, d), "user_id", "ts",
          "value", halfLifeUs = 7L * 86400L * 1000000L)
        .orderBy(col("user_id"))),

    // --- dense daily resample with forward fill ---------------------------
    // Irregular events -> per-user daily series; gap days carry the
    // last observed daily sum (observed=0 marks synthesized rows).
    "q174_gap_fill" -> ((s, d) =>
      graft.operators.TimeSeries.gapFillDaily(
          ev(s, d).filter(col("user_id") < 30), "user_id", "ts", "value")
        // render the exact DECIMAL(28,9) fill on the 6-grid double like
        // every other decimal-measure query — raw decimal columns have
        // engine-specific scale rendering in the hash path
        .withColumn("filled", round(col("filled").cast("double"), 6))
        .orderBy(col("user_id"), col("day"))),

    // --- robust outlier profile (median/MAD gate) -------------------------
    "q175_mad_outliers" -> ((s, d) =>
      graft.operators.TimeSeries.madOutliers(ev(s, d), "event_type",
          "value", k = 3.0)
        .orderBy(col("event_type"))),

    // --- last-touch attribution -------------------------------------------
    // Each purchase credits the user's most recent PRIOR non-purchase
    // event type ('none' for cold-start purchases).
    "q182_attribution" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      ev(s, d)
        .withColumn("channel",
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("channel"), lit("none")).as("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          round(sum(col("value").cast("decimal(18,2)")).cast("double"), 4)
            .as("attributed_value"))
        .orderBy(col("channel"))
    }),

    // --- gaps-and-islands over integer keys --------------------------------
    // Maximal runs of consecutive orderkeys among urgent orders.
    "q184_islands" -> ((s, d) =>
      graft.operators.TimeSeries.islands(
          t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT"),
          "o_orderkey", minLen = 3L)
        .orderBy(col("island_start"))),

    // --- per-user EWMA of event values -------------------------------------
    // alpha=0.3 fold over each user's time-ordered values, event_id as
    // the equal-ts tie-break.
    "q185_ewma" -> ((s, d) =>
      graft.operators.TimeSeries.ewma(ev(s, d), "user_id", "ts",
          "event_id", "value", alpha = 0.3)
        .orderBy(col("user_id"))))

  def oracleSql: Map[String, String] = Map(
    "q29_tumbling_window" ->
      """SELECT time_bucket(INTERVAL '10 minutes', ts) AS w_start,
           count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_value
         FROM events GROUP BY 1 ORDER BY w_start""",

    "q30_sliding_window" ->
      """WITH b AS (
           SELECT time_bucket(INTERVAL '5 minutes', ts) AS w_start, value FROM events
           UNION ALL
           SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes', value FROM events)
         SELECT w_start, count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_value
         FROM b GROUP BY w_start ORDER BY w_start""",

    "q31_session_window" ->
      """WITH o AS (
           SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '4 hours'
                  THEN 1 ELSE 0 END AS new_s
           FROM events),
         s AS (
           SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM o)
         SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_value
         FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""",

    "q32_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS total
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",

    "q33_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",

    "q34_moving_avg" ->
      """SELECT event_id, user_id,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS mov_sum,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_n
         FROM events ORDER BY event_id""",

    "q79_sessionize" ->
      """WITH marked AS (
           SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
         SELECT user_id, event_id,
           CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
         FROM marked ORDER BY user_id, event_id""",

    // earliest-qualifying greedy per step; strict-after + 24 h gate
    "q160_funnel" ->
      """WITH e AS (SELECT user_id AS u, event_type AS t, ts FROM events),
         s1 AS (SELECT u, min(ts) AS p FROM e WHERE t = 'view' GROUP BY u),
         s2 AS (SELECT e.u, min(e.ts) AS p FROM e JOIN s1 ON e.u = s1.u AND e.ts > s1.p
                AND epoch_us(e.ts) - epoch_us(s1.p) <= CAST(86400000000 AS BIGINT)
                WHERE e.t = 'click' GROUP BY e.u),
         s3 AS (SELECT e.u, min(e.ts) AS p FROM e JOIN s2 ON e.u = s2.u AND e.ts > s2.p
                AND epoch_us(e.ts) - epoch_us(s2.p) <= CAST(86400000000 AS BIGINT)
                WHERE e.t = 'purchase' GROUP BY e.u)
         SELECT * FROM (
           SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name, CAST(count(*) AS BIGINT) AS users FROM s1
           UNION ALL SELECT 2, 'click', count(*) FROM s2
           UNION ALL SELECT 3, 'purchase', count(*) FROM s3)
         ORDER BY step""",

    // activity set = DISTINCT (user, week); cohort = min week
    "q161_retention" ->
      """WITH a AS (SELECT DISTINCT user_id AS u, date_trunc('week', ts) AS p FROM events),
         c AS (SELECT u, min(p) AS c FROM a GROUP BY u)
         SELECT CAST(c.c AS DATE) AS cohort,
           CAST(datediff('day', c.c, a.p) / 7 AS BIGINT) AS period_offset,
           CAST(count(*) AS BIGINT) AS users
         FROM a JOIN c ON a.u = c.u
         GROUP BY 1, 2 ORDER BY 1, 2""",

    // ∃ a before b ⟺ min_ts(a) < max_ts(b): one (user, type) agg,
    // user-keyed self-join bounded by the type vocabulary
    "q230_seq_support" ->
      """WITH per AS (SELECT user_id, event_type,
             min(ts) AS f, max(ts) AS l
           FROM events
           WHERE user_id IS NOT NULL AND event_type IS NOT NULL
             AND ts IS NOT NULL
           GROUP BY 1, 2),
         tot AS (SELECT count(DISTINCT user_id) AS n FROM per),
         pairs AS (SELECT a.event_type AS from_type,
             b.event_type AS to_type, count(*) AS n_users
           FROM per a JOIN per b
             ON a.user_id = b.user_id AND a.f < b.l
           GROUP BY 1, 2)
         SELECT from_type, to_type, CAST(n_users AS BIGINT) AS n_users,
           round(CAST(n_users AS DOUBLE) / n, 6) AS support
         FROM pairs, tot
         ORDER BY support DESC, from_type, to_type""",

    // lead() per user (ts, event_id ordered), pair counts, row-normalized
    "q163_transitions" ->
      """WITH seq AS (
           SELECT event_type AS t,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS nxt
           FROM events),
         pairs AS (SELECT t AS from_type, nxt AS to_type, CAST(count(*) AS BIGINT) AS n
                   FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
         tot AS (SELECT from_type, sum(n) AS tot FROM pairs GROUP BY 1)
         SELECT pairs.from_type, pairs.to_type, pairs.n,
           round(CAST(pairs.n AS DOUBLE) / tot.tot, 6) AS p
         FROM pairs JOIN tot USING (from_type)
         ORDER BY from_type, to_type""",

    // two stacked leads over one user window, path-keyed count, top-10
    "q168_top_paths" ->
      """WITH seq AS (
           SELECT event_type AS t,
             lead(event_type, 1) OVER w AS t1, lead(event_type, 2) OVER w AS t2
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
         SELECT t || '>' || t1 || '>' || t2 AS path, CAST(count(*) AS BIGINT) AS n
         FROM seq WHERE t1 IS NOT NULL AND t2 IS NOT NULL
         GROUP BY 1 ORDER BY n DESC, path ASC LIMIT 10""",

    // RANGE frame over epoch micros, inclusive 24 h trailing
    "q169_range_window" ->
      """SELECT event_id, user_id,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE), 4) AS w_sum,
           CAST(count(*) OVER w AS BIGINT) AS w_n
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    // weight rounds to the 9-grid before the product; DECIMAL sums
    "q171_decayed_sum" ->
      """WITH t AS (SELECT max(epoch_us(ts)) AS T FROM events),
         w AS (SELECT user_id,
                 round(value * round(power(2.0, -CAST(t.T - epoch_us(ts) AS DOUBLE) / 604800000000.0), 9), 9) AS wv
               FROM events, t)
         SELECT user_id, round(CAST(sum(CAST(wv AS DECIMAL(28,9))) AS DOUBLE), 6) AS decayed_sum
         FROM w GROUP BY user_id ORDER BY user_id""",

    // per-key spine + last_value IGNORE NULLS = the same fill
    "q174_gap_fill" ->
      """WITH daily AS (
           SELECT user_id, CAST(ts AS DATE) AS day,
             sum(CAST(round(CAST(value AS DECIMAL(28,9)), 9) AS DECIMAL(28,9))) AS v
           FROM events WHERE user_id < 30 GROUP BY 1, 2),
         spine AS (
           SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE AS day
           FROM (SELECT user_id, min(day) AS mn, max(day) AS mx FROM daily GROUP BY 1)),
         joined AS (
           SELECT s.user_id, s.day, d.v,
             CASE WHEN d.v IS NULL THEN 0 ELSE 1 END AS observed
           FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day)
         SELECT user_id, day,
           round(CAST(last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS filled,
           CAST(observed AS INT) AS observed
         FROM joined ORDER BY user_id, day""",

    // median + median-absolute-deviation, 9-grid boundary gate
    "q175_mad_outliers" ->
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                      FROM events GROUP BY 1),
         dev AS (SELECT e.event_type, m.med, abs(e.value - m.med) AS adev
                 FROM events e JOIN med m USING (event_type)),
         mad AS (SELECT event_type, med, quantile_cont(adev, 0.5) AS mad
                 FROM dev GROUP BY 1, 2)
         SELECT d.event_type, round(a.med, 4) AS med, round(a.mad, 4) AS mad,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN round(d.adev, 9) > round(3.0 * a.mad, 9)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         FROM dev d JOIN mad a USING (event_type)
         GROUP BY d.event_type, a.med, a.mad
         ORDER BY d.event_type""",

    // last non-purchase type over the 1-PRECEDING user window
    "q182_attribution" ->
      """WITH attr AS (
           SELECT event_type, value,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
               IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
           FROM events)
         SELECT coalesce(channel, 'none') AS channel,
           CAST(count(*) AS BIGINT) AS n_purchases,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4) AS attributed_value
         FROM attr WHERE event_type = 'purchase'
         GROUP BY 1 ORDER BY channel""",

    // textbook k - row_number() island grouping (the oracle may use the
    // global window; the engine's rank-join form must agree)
    "q184_islands" ->
      """WITH k AS (SELECT DISTINCT o_orderkey AS k FROM orders
                    WHERE o_orderpriority = '1-URGENT'),
         g AS (SELECT k, k - row_number() OVER (ORDER BY k) AS grp FROM k)
         SELECT min(k) AS island_start, max(k) AS island_end,
           CAST(count(*) AS BIGINT) AS len
         FROM g GROUP BY grp HAVING count(*) >= 3 ORDER BY island_start""",

    // list_reduce fold with the same per-step 9-grid rounding
    "q185_ewma" ->
      """WITH s AS (
           SELECT user_id,
             list(round(CAST(value AS DECIMAL(28,9)), 9)::DOUBLE
                  ORDER BY ts, event_id) AS vs
           FROM events GROUP BY 1)
         SELECT user_id,
           round(list_reduce(vs, (acc, x) -> round(0.3*x + 0.7*acc, 9)), 6) AS ewma
         FROM s ORDER BY user_id""")
}
