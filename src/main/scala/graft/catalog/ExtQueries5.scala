package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 batch (q304–q314): the eight operators swept uncompiled
  * into the round-11 snapshot, now served properly — registered,
  * oracled, inventoried (SURVEY §2.M) — plus the Friedman test and
  * its Nemenyi post-hoc completing the paired-comparison shelf
  * (McNemar → Cochran's Q → Friedman → Nemenyi), and the incremental
  * golden-record store served against the one-shot oracle. */
object ExtQueries5 {

  import Catalog._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- Kruskal-Wallis H (k-group rank test) ------------------------------
    // Do the five event types draw their values from one location?
    // Ranks derive from the global value grid's cumulative counts —
    // value-level work, never a corpus-wide rank window.
    "q304_kruskal_wallis" -> ((s, d) =>
      graft.operators.Eval.kruskalWallis(ev(s, d), "event_type", "value")),

    // --- Fleiss' kappa (multi-rater categorical agreement) -----------------
    // Three value-threshold raters each filing every event into
    // lo/mid/hi — do they agree beyond chance? Balanced by
    // construction (3 ratings per event), the operator's contract.
    "q305_fleiss_kappa" -> ((s, d) => {
      val lab = (hi: Double, mid: Double) =>
        when(col("value") > hi, "hi")
          .when(col("value") > mid, "mid").otherwise("lo")
      val long = ev(s, d).select(col("event_id"),
          explode(array(
            struct(lit("c80").as("rater"), lab(80.0, 40.0).as("label")),
            struct(lit("c100").as("rater"), lab(100.0, 50.0).as("label")),
            struct(lit("c120").as("rater"), lab(120.0, 60.0).as("label"))))
            .as("r"))
        .select(col("event_id"), col("r.rater"), col("r.label"))
      graft.operators.Eval.fleissKappa(long, "event_id", "rater", "label")
    }),

    // --- linear-interpolation gap fill -------------------------------------
    // Every third-ish day of readings dropped, the series re-densified
    // by interpolation between observed neighbors — the continuous-
    // measure sibling of forward fill.
    "q306_gap_fill_interpolate" -> ((s, d) =>
      graft.operators.TimeSeries.gapFillInterpolate(
          ev(s, d).filter(dayofmonth(col("ts")) % 5 < 2),
          "event_type", "ts", "value")
        // render the DECIMAL(28,9) fill as double-rounded-6 (the
        // q174/q266 no-raw-decimal-output rule)
        .select(col("event_type"), col("day"),
          round(col("filled").cast("double"), 6).as("filled"),
          col("observed"))
        .orderBy(col("event_type"), col("day"))),

    // --- AR(2) forecast (Yule-Walker closed form) ---------------------------
    // Three steps ahead on each event type's daily count series from
    // its own measured lag structure (phi from the ACF grid).
    "q307_ar_forecast" -> ((s, d) =>
      graft.operators.TimeSeries.arForecast(
          ev(s, d).groupBy(col("event_type"),
              col("ts").cast("date").as("day"))
            .agg(count(lit(1)).cast("double").as("cnt")),
          "event_type", "day", "cnt", horizon = 3, p = 2)
        .orderBy(col("event_type"), col("step"))),

    // --- directional association rules -------------------------------------
    // q170's supplier co-occurrence fanned to directed a → b rules
    // with support/confidence gates — the recommender form.
    "q308_association_rules" -> ((s, d) =>
      graft.operators.Baskets.associationRules(t(s, d, "lineitem"),
          "l_orderkey", "l_suppkey", minSupport = 0.002,
          minConfidence = 0.02, minCount = 25L)
        .orderBy(col("antecedent"), col("consequent"))),

    // --- point-in-time snapshot from a CDC log -----------------------------
    // The table state as of 1998-06-30 rebuilt from an op-tagged
    // changelog (latest visible row per customer; 'D' keys absent) —
    // time travel for audits and reproducible training snapshots.
    "q309_snapshot_as_of" -> ((s, d) => {
      val log = t(s, d, "orders").select(col("o_orderkey"),
        col("o_custkey"), col("o_orderdate"), col("o_totalprice"),
        col("o_orderstatus"),
        when(col("o_orderstatus") === "F", "U")
          .when(col("o_orderstatus") === "P", "D").otherwise("I").as("op"))
      graft.operators.Merge.snapshotAsOf(log, Seq("o_custkey"),
          "o_orderdate", lit("1998-06-30").cast("timestamp"), "op",
          seqCols = Seq(col("o_orderdate"), col("o_orderkey")))
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("date").as("order_day"),
          col("o_totalprice"), col("o_orderstatus"), col("op"))
        .orderBy(col("o_custkey"))
    }),

    // --- per-document lexical statistics -----------------------------------
    // Type-token ratio, stopword ratio, hapax ratio, mean token length
    // — the vocabulary-shape quality gates beside entropy/repetition.
    "q310_lexical_stats" -> ((s, d) =>
      graft.operators.Quality.lexicalStats(t(s, d, "documents"),
          "doc_id", "text",
          stopwords = Seq("the", "and", "of", "to", "in",
            "a", "is", "that", "it", "for"))
        .orderBy(col("doc_id"))),

    // --- radius similarity join (all neighbors within tau) ------------------
    // Every sampled query's corpus neighbors at cosine >= 0.3 through
    // the IVF store at FULL probe (= exact, so the brute-force SQL
    // oracle pins it — the q228 adjudication; production prunes
    // nprobe). The range-search complement to top-k.
    "q311_radius_join" -> ((s, d) => {
      import graft.functions.IvfIndex
      val emb = t(s, d, "embeddings")
      val idx = LlmQueries.cachedIvfIndex(s, d + "#all")(
        IvfIndex.build(emb, "embedding", "vec_id", k = 8))
      val qs = emb.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      IvfIndex.radiusJoin(idx, qs, "query_id", "qvec",
          "embedding", "vec_id", threshold = 0.3, nprobe = 8, grid = 4,
          includeSelf = false)
        .orderBy(col("query_id"), col("vec_id"))
    }),

    // --- incremental golden-record store (streaming survivorship) -----------
    // q301's survivorship served INCREMENTALLY: orders ingested as
    // three batches into a GoldenStore (algebraic struct partials +
    // modal count deltas), golden rows folded at read. Streamed ≡
    // batch is the operator's contract, so q301's one-shot oracle
    // pins this too (session-cached store, swept on app end).
    "q313_golden_store" -> ((s, d) => {
      val store = LlmQueries.cachedStore(s, d, "golden-q313") { p =>
        val orders = t(s, d, "orders")
        (0 to 2).foreach { b =>
          graft.operators.GoldenStore.append(
            orders.filter(pmod(col("o_orderkey"), lit(3)) === b),
            "o_custkey", p, batchId = b.toLong,
            mostFrequent = Seq("o_orderstatus"),
            longest = Seq("o_orderpriority"),
            minOf = Seq("o_orderdate"),
            maxOf = Seq("o_totalprice"),
            latestBy = Some(("o_orderdate", Seq("o_orderkey"))))
        }
      }
      graft.operators.GoldenStore.serve(s, store)
        .orderBy(col("o_custkey"))
    }),

    // --- Friedman test (complete-block rank test) ---------------------------
    // Three scoring systems ranked within every event (blocks cancel
    // between-event level shifts) — do the systems rank the same?
    "q312_friedman" -> ((s, d) => {
      val long = ev(s, d).select(col("event_id"),
          explode(array(
            struct(lit("c80").as("system"),
              abs(col("value") - 80.0).as("score")),
            struct(lit("c100").as("system"),
              abs(col("value") - 100.0).as("score")),
            struct(lit("c120").as("system"),
              abs(col("value") - 120.0).as("score")))).as("r"))
        .select(col("event_id"), col("r.system"), col("r.score"))
      graft.operators.Eval.friedman(long, "event_id", "system", "score")
    }),

    // --- Nemenyi post-hoc (critical-difference pairwise) --------------------
    // q312's omnibus rejected "the three systems rank the same";
    // Nemenyi says WHICH pairs differ: mean-rank gaps vs the Demšar
    // critical difference at alpha = 0.05.
    "q314_nemenyi" -> ((s, d) => {
      val long = ev(s, d).select(col("event_id"),
          explode(array(
            struct(lit("c80").as("system"),
              abs(col("value") - 80.0).as("score")),
            struct(lit("c100").as("system"),
              abs(col("value") - 100.0).as("score")),
            struct(lit("c120").as("system"),
              abs(col("value") - 120.0).as("score")))).as("r"))
        .select(col("event_id"), col("r.system"), col("r.score"))
      graft.operators.Eval.nemenyi(long, "event_id", "system", "score")
        .orderBy(col("treatment_a"), col("treatment_b"))
    }),

    // --- Dunn's post-hoc (pairwise z after Kruskal-Wallis) ------------------
    // q304's omnibus asks "one location?" across the five event
    // types; Dunn says WHICH pairs differ — each pair judged against
    // the FULL shared ranking with the tie-corrected variance.
    "q315_dunn" -> ((s, d) =>
      graft.operators.Eval.dunn(ev(s, d), "event_type", "value")
        .orderBy(col("group_a"), col("group_b"))),

    // --- two-group log-rank test -------------------------------------------
    // ARE the q224 even/odd cohorts' time-to-first-purchase curves
    // different? Same censoring-honest frame; the hypergeometric
    // O/E/V fold over the shared duration grid answers with one χ².
    "q316_log_rank" -> ((s, d) => {
      val per = ev(s, d).groupBy(col("user_id")).agg(
        min(col("ts")).as("first_ts"),
        min(when(col("event_type") === "purchase", col("ts")))
          .as("conv_ts"),
        max(col("ts")).as("last_ts"))
      val durs = per.select(
        (col("user_id") % 2).cast("int").as("cohort"),
        datediff(coalesce(col("conv_ts"), col("last_ts")).cast("date"),
          col("first_ts").cast("date")).as("dur"),
        col("conv_ts").isNotNull.cast("int").as("ev"))
      graft.operators.Survival.logRank(durs, "cohort", "dur", "ev")
    }),

    // --- Brown-Forsythe variance homogeneity -------------------------------
    // q207's F test asks "did the MEAN move across event types";
    // Brown-Forsythe asks "did the SPREAD" — the anovaF fold on
    // absolute deviations from grid-walk group medians.
    "q317_brown_forsythe" -> ((s, d) =>
      graft.operators.Eval.leveneTest(ev(s, d), "event_type", "value")),

    // --- Jonckheere-Terpstra ordered trend ---------------------------------
    // Is value stochastically increasing across event types in their
    // natural (alphabetic) order? The sharper one-directional
    // complement to q304's any-difference Kruskal-Wallis.
    "q318_jonckheere" -> ((s, d) =>
      graft.operators.Eval.jonckheereTerpstra(
        ev(s, d), "event_type", "value")),

    // --- Jarque-Bera normality screen --------------------------------------
    // Does value still look Gaussian within each event type? The
    // absolute moment-based drift check beside q195's two-sample KS.
    "q319_jarque_bera" -> ((s, d) =>
      graft.operators.Eval.jarqueBera(ev(s, d), "event_type", "value")
        .orderBy(col("event_type"))),

    // --- one-hot encoding --------------------------------------------------
    // Orders' status and priority fanned into 0/1 model-matrix
    // indicators; vocabulary discovered (bounded), sorted, sanitized.
    "q320_one_hot" -> ((s, d) =>
      graft.operators.Features.oneHot(
          t(s, d, "orders").select(col("o_orderkey"),
            col("o_orderstatus"), col("o_orderpriority")),
          Seq("o_orderstatus", "o_orderpriority"))
        .drop("o_orderstatus", "o_orderpriority")
        .orderBy(col("o_orderkey"))),

    // --- strongly connected components -------------------------------------
    // Directed graph derived from event-user residues: 8-cycles per
    // block, even blocks bridging forward (a 2-deep SCC DAG — the
    // multi-round peel), and four pure-source tails (the trim path).
    // SCC = the cycles; the bridges that would merge everything under
    // undirected CC stay asymmetric here.
    "q321_scc" -> ((s, d) => {
      val n = ev(s, d)
        .select((col("user_id") % 96).cast("long").as("n")).distinct()
      val blockBase = col("n") - (col("n") % 8)
      val cycle = n.select(col("n").as("src"),
        (blockBase + ((col("n") % 8) + 1) % 8).as("dst"))
      val cross = n.filter(col("n") % 16 < 8)
        .select(col("n").as("src"), (col("n") + 8).as("dst"))
      val tails = n.filter(col("n") < 4)
        .select((col("n") + 960).as("src"), col("n").as("dst"))
      graft.operators.Graph.stronglyConnectedComponents(
          cycle.unionAll(cross).unionAll(tails))
        .orderBy(col("id"))
    }),

    // --- Mann-Kendall trend test -------------------------------------------
    // Is each event type's daily volume trending? The significance
    // half of the q242 Theil-Sen duo, on the identical aggregate-first
    // daily frame.
    "q322_mann_kendall" -> ((s, d) =>
      graft.operators.TimeSeries.mannKendall(
          ev(s, d).groupBy(col("event_type"),
              datediff(col("ts").cast("date"),
                lit("2024-01-01").cast("date")).as("t"))
            .agg(count(lit(1)).cast("double").as("v")),
          "event_type", "t", "v")
        .orderBy(col("event_type"))),

    // --- Mantel-Haenszel stratified 2x2 ------------------------------------
    // Does the even/odd user cohort associate with high event values
    // AFTER controlling for event type (the Simpson's-paradox-safe
    // reading q181's single pooled table cannot give)?
    "q323_mantel_haenszel" -> ((s, d) =>
      graft.operators.Eval.mantelHaenszel(
        ev(s, d).select(col("event_type"),
          (col("user_id") % 2).cast("int").as("cohort"),
          (col("value") > 50.0).cast("int").as("high")),
        "event_type", "cohort", "high")),

    // --- Cochran-Armitage trend in proportions -----------------------------
    // Does the finished-order rate trend across the five priority
    // levels in their natural (1-URGENT < ... < 5-LOW) order?
    "q324_cochran_armitage" -> ((s, d) =>
      graft.operators.Eval.cochranArmitage(
        t(s, d, "orders").select(col("o_orderpriority"),
          (col("o_orderstatus") === "F").cast("int").as("fin")),
        "o_orderpriority", "fin")),

    // --- Durbin-Watson residual autocorrelation ----------------------------
    // Can q242's daily-volume trend lines be believed? DW of each
    // event type's OLS residuals on the identical frame.
    "q325_durbin_watson" -> ((s, d) =>
      graft.operators.TimeSeries.durbinWatson(
          ev(s, d).groupBy(col("event_type"),
              datediff(col("ts").cast("date"),
                lit("2024-01-01").cast("date")).as("t"))
            .agg(count(lit(1)).cast("double").as("v")),
          "event_type", "t", "v")
        .orderBy(col("event_type"))))

  def oracleSql: Map[String, String] = Map(
    // global value-grid average ranks ((2 cum - cnt + 1)/2 on the
    // .5-exact DECIMAL(19,1) grid), exact decimal rank sums, the
    // round-9 R_g^2/n_g accumulation, tie-corrected twin
    "q304_kruskal_wallis" ->
      """WITH rows AS (SELECT event_type AS g, value AS v FROM events
             WHERE event_type IS NOT NULL AND value IS NOT NULL),
         levels AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt
             FROM rows GROUP BY 1),
         ranks AS (SELECT v, cnt,
             CAST(CAST(2 * sum(cnt) OVER (ORDER BY v) - cnt + 1 AS DOUBLE)
               / 2.0 AS DECIMAL(19,1)) AS r FROM levels),
         gv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
             FROM rows GROUP BY 1, 2),
         rg AS (SELECT g, sum(CAST(c AS DECIMAL(19,0)) * r) AS rg,
             CAST(sum(c) AS BIGINT) AS ng
           FROM gv JOIN ranks USING (v) GROUP BY 1),
         stats AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS k_groups,
             sum(CAST(round(CAST(rg AS DOUBLE) * CAST(rg AS DOUBLE) / ng, 9)
               AS DECIMAL(38,9))) AS s FROM rg),
         ties AS (SELECT sum(CAST(cnt AS DECIMAL(12,0)) *
             (CAST(cnt AS DECIMAL(12,0)) - 1) *
             (CAST(cnt AS DECIMAL(12,0)) + 1)) AS tsum FROM levels)
         SELECT n, k_groups,
           round(12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
             * CAST(s AS DOUBLE) - 3.0 * (CAST(n AS DOUBLE) + 1.0), 6) AS h,
           round(CASE WHEN 1.0 - CAST(tsum AS DOUBLE) /
               CAST(CAST(n AS DECIMAL(12,0)) * (CAST(n AS DECIMAL(12,0)) - 1)
                 * (CAST(n AS DECIMAL(12,0)) + 1) AS DOUBLE) <> 0.0 THEN
             (12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
               * CAST(s AS DOUBLE) - 3.0 * (CAST(n AS DOUBLE) + 1.0))
             / (1.0 - CAST(tsum AS DOUBLE) /
               CAST(CAST(n AS DECIMAL(12,0)) * (CAST(n AS DECIMAL(12,0)) - 1)
                 * (CAST(n AS DECIMAL(12,0)) + 1) AS DOUBLE)) END, 6)
             AS h_tie
         FROM stats, ties""",

    // exact integer Sum n_ij^2 / Sum C_j^2 accounting, one pinned
    // double tree for p_bar, p_e, kappa
    "q305_fleiss_kappa" ->
      """WITH r AS (SELECT event_id, u.rater AS rater, u.label AS label
           FROM events, unnest([
             {'rater': 'c80', 'label': CASE WHEN value > 80.0 THEN 'hi'
                WHEN value > 40.0 THEN 'mid' ELSE 'lo' END},
             {'rater': 'c100', 'label': CASE WHEN value > 100.0 THEN 'hi'
                WHEN value > 50.0 THEN 'mid' ELSE 'lo' END},
             {'rater': 'c120', 'label': CASE WHEN value > 120.0 THEN 'hi'
                WHEN value > 60.0 THEN 'mid' ELSE 'lo' END}
           ]) t(u)),
         it AS (SELECT CAST(count(DISTINCT event_id) AS BIGINT) AS n_items,
             sum(CAST(nij AS DECIMAL(19,0)) * CAST(nij AS DECIMAL(19,0)))
               AS s2
           FROM (SELECT event_id, label, count(*) AS nij
                 FROM r GROUP BY 1, 2)),
         ct AS (SELECT CAST(count(*) AS BIGINT) AS n_categories,
             sum(CAST(cj AS DECIMAL(19,0)) * CAST(cj AS DECIMAL(19,0)))
               AS sc2
           FROM (SELECT label, count(*) AS cj FROM r GROUP BY 1))
         SELECT n_items, CAST(3 AS BIGINT) AS n_raters, n_categories,
           round((CAST(s2 AS DOUBLE) - CAST(n_items AS DOUBLE) * 3.0)
             / ((CAST(n_items AS DOUBLE) * 3.0) * 2.0), 6) AS p_bar,
           round(CAST(sc2 AS DOUBLE) / ((CAST(n_items AS DOUBLE) * 3.0)
             * (CAST(n_items AS DOUBLE) * 3.0)), 6) AS p_e,
           round(CASE WHEN 1.0 - CAST(sc2 AS DOUBLE) /
               ((CAST(n_items AS DOUBLE) * 3.0) * (CAST(n_items AS DOUBLE)
                 * 3.0)) <> 0.0 THEN
             ((CAST(s2 AS DOUBLE) - CAST(n_items AS DOUBLE) * 3.0)
               / ((CAST(n_items AS DOUBLE) * 3.0) * 2.0)
              - CAST(sc2 AS DOUBLE) / ((CAST(n_items AS DOUBLE) * 3.0)
               * (CAST(n_items AS DOUBLE) * 3.0)))
             / (1.0 - CAST(sc2 AS DOUBLE) / ((CAST(n_items AS DOUBLE) * 3.0)
               * (CAST(n_items AS DOUBLE) * 3.0))) END, 6) AS kappa
         FROM it, ct""",

    // per-key daily DECIMAL sums, per-key spine, ignore-nulls neighbor
    // structs both directions, exact integer day-fraction interpolation
    "q306_gap_fill_interpolate" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             sum(CAST(round(CAST(value AS DECIMAL(28,9)), 9)
               AS DECIMAL(28,9))) AS v
           FROM events WHERE day(ts) % 5 < 2 GROUP BY 1, 2),
         spine AS (SELECT event_type,
             CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE)
               AS day
           FROM (SELECT event_type, min(day) AS mn, max(day) AS mx
                 FROM daily GROUP BY 1)),
         j AS (SELECT s.event_type, s.day, d.v
           FROM spine s LEFT JOIN daily d USING (event_type, day)),
         f AS (SELECT *,
             last_value(CASE WHEN v IS NOT NULL
                 THEN {'day': day, 'v': v} END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
             first_value(CASE WHEN v IS NOT NULL
                 THEN {'day': day, 'v': v} END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nx
           FROM j)
         SELECT event_type, day,
           round(CAST(CASE WHEN v IS NOT NULL THEN v
             ELSE CAST(round(CAST(p.v AS DOUBLE)
               + (CAST(nx.v AS DOUBLE) - CAST(p.v AS DOUBLE))
               * (CAST(date_diff('day', p.day, day) AS DOUBLE)
                  / CAST(date_diff('day', p.day, nx.day) AS DOUBLE)), 9)
               AS DECIMAL(28,9)) END AS DOUBLE), 6) AS filled,
           CAST(CASE WHEN v IS NULL THEN 0 ELSE 1 END AS INT) AS observed
         FROM f ORDER BY event_type, day""",

    // ACF r1/r2 on the round-9 DECIMAL(38,9) product sums (rounded 6),
    // Yule-Walker phi closed forms, the 9-grid forecast recursion
    // unrolled three steps
    "q307_ar_forecast" ->
      """WITH daily AS (SELECT event_type AS k, CAST(ts AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS v FROM events GROUP BY 1, 2),
         mu AS (SELECT k, round(CAST(sum(CAST(round(v, 9)
               AS DECIMAL(38,9))) AS DOUBLE) / count(*), 9) AS mu
           FROM daily GROUP BY 1),
         c AS (SELECT d.k, day, v, v - mu AS e
           FROM daily d JOIN mu USING (k)),
         lagd AS (SELECT k, e,
             lag(e, 1) OVER (PARTITION BY k ORDER BY day) AS e1,
             lag(e, 2) OVER (PARTITION BY k ORDER BY day) AS e2 FROM c),
         acf AS (SELECT k,
             sum(CAST(round(e * e, 9) AS DECIMAL(38,9))) AS den,
             sum(CASE WHEN e1 IS NOT NULL
               THEN CAST(round(e * e1, 9) AS DECIMAL(38,9)) END) AS n1,
             sum(CASE WHEN e2 IS NOT NULL
               THEN CAST(round(e * e2, 9) AS DECIMAL(38,9)) END) AS n2
           FROM lagd GROUP BY 1),
         r AS (SELECT k,
             round(CASE WHEN den <> 0 THEN CAST(n1 AS DOUBLE)
               / CAST(den AS DOUBLE) END, 6) AS r1,
             round(CASE WHEN den <> 0 THEN CAST(n2 AS DOUBLE)
               / CAST(den AS DOUBLE) END, 6) AS r2 FROM acf),
         last2 AS (SELECT k, max(CASE WHEN rn = 1 THEN v END) AS xn,
             max(CASE WHEN rn = 2 THEN v END) AS xn1
           FROM (SELECT k, v, row_number() OVER (PARTITION BY k
                   ORDER BY day DESC) AS rn FROM daily)
           WHERE rn <= 2 GROUP BY 1),
         b1 AS (SELECT r.k, r1, r2, mu, xn, xn1,
             round(CASE WHEN 1.0 - r1 * r1 <> 0.0
               THEN (r2 - r1 * r1) / (1.0 - r1 * r1) END, 9) AS phi2
           FROM r JOIN mu ON mu.k = r.k JOIN last2 ON last2.k = r.k),
         b2 AS (SELECT *, round(r1 * (1.0 - phi2), 9) AS phi1,
             round(xn - mu, 9) AS p1, round(xn1 - mu, 9) AS p2 FROM b1),
         s1 AS (SELECT *, round(phi1 * p1 + phi2 * p2, 9) AS f1 FROM b2),
         s2 AS (SELECT *, round(phi1 * f1 + phi2 * p1, 9) AS f2 FROM s1),
         s3 AS (SELECT *, round(phi1 * f2 + phi2 * f1, 9) AS f3 FROM s2)
         SELECT k AS event_type, step, forecast FROM (
           SELECT k, CAST(1 AS INT) AS step, round(mu + f1, 6) AS forecast
             FROM s3
           UNION ALL SELECT k, CAST(2 AS INT), round(mu + f2, 6) FROM s3
           UNION ALL SELECT k, CAST(3 AS INT), round(mu + f3, 6) FROM s3)
         ORDER BY event_type, step""",

    // q170's pair table fanned to both directions, support/confidence
    // gates applied on the rounded-6 ratios (the engine's filter grid)
    "q308_association_rules" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS b, l_suppkey AS i
             FROM lineitem),
         nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS nb FROM items),
         ic AS (SELECT i, CAST(count(*) AS BIGINT) AS n
             FROM items GROUP BY i),
         pairs AS (SELECT a.i AS ia, b.i AS ib,
             CAST(count(*) AS BIGINT) AS n_ab
           FROM items a JOIN items b ON a.b = b.b AND a.i < b.i
           GROUP BY 1, 2 HAVING count(*) >= 25),
         lifted AS (SELECT p.ia, p.ib, p.n_ab, ia.n AS n_a, ib.n AS n_b,
             round(CAST(p.n_ab AS DOUBLE) * nb.nb
               / (CAST(ia.n AS DOUBLE) * ib.n), 6) AS lift
           FROM pairs p JOIN ic ia ON ia.i = p.ia
             JOIN ic ib ON ib.i = p.ib, nb),
         directed AS (
           SELECT ia AS antecedent, ib AS consequent, n_ab,
             n_a AS n_ant, lift FROM lifted
           UNION ALL
           SELECT ib, ia, n_ab, n_b, lift FROM lifted)
         SELECT antecedent, consequent, n_ab AS n_both,
           n_ant AS n_antecedent,
           round(CAST(n_ab AS DOUBLE) / nb.nb, 6) AS support,
           round(CAST(n_ab AS DOUBLE) / n_ant, 6) AS confidence, lift
         FROM directed, nb
         WHERE round(CAST(n_ab AS DOUBLE) / nb.nb, 6) >= 0.002
           AND round(CAST(n_ab AS DOUBLE) / n_ant, 6) >= 0.02
         ORDER BY antecedent, consequent""",

    // visibility filter + latest-per-key under the pinned (seq, key)
    // tie-break, 'D' keys absent
    "q309_snapshot_as_of" ->
      """WITH log AS (SELECT o_orderkey, o_custkey, o_orderdate,
             o_totalprice, o_orderstatus,
             CASE WHEN o_orderstatus = 'F' THEN 'U'
                  WHEN o_orderstatus = 'P' THEN 'D' ELSE 'I' END AS op
           FROM orders),
         vis AS (SELECT * FROM log
           WHERE o_orderdate <= TIMESTAMP '1998-06-30 00:00:00'),
         r AS (SELECT *, row_number() OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM vis)
         SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE)
             AS order_day, o_totalprice, o_orderstatus, op
         FROM r WHERE rn = 1 AND op <> 'D' ORDER BY o_custkey""",

    // the one whitespace token contract, (doc, token)-grain counts,
    // integer-over-integer ratios rounded 6; token-less docs survive
    // with zero counts and null ratios
    "q310_lexical_stats" ->
      """WITH toks AS (SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
               x -> x <> '')) AS t
           FROM documents),
         cells AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c
           FROM toks GROUP BY 1, 2),
         per AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS hapax,
             CAST(sum(CASE WHEN t IN ('the','and','of','to','in','a',
               'is','that','it','for') THEN c ELSE 0 END) AS BIGINT)
               AS stop,
             CAST(sum(CAST(length(t) AS BIGINT) * c) AS BIGINT) AS len
           FROM cells GROUP BY 1)
         SELECT d.doc_id, coalesce(n_tokens, 0) AS n_tokens,
           coalesce(n_types, 0) AS n_types,
           round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr,
           round(CAST(stop AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
           round(CAST(hapax AS DOUBLE) / n_types, 6) AS hapax_ratio,
           round(CAST(len AS DOUBLE) / n_tokens, 6) AS mean_token_len
         FROM documents d LEFT JOIN per USING (doc_id)
         ORDER BY d.doc_id""",

    // brute-force cosine over every (query, corpus) pair, threshold on
    // the grid-4 rounded sim, self-pairs dropped — exact because the
    // engine runs FULL probe
    "q311_radius_join" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
           FROM embeddings WHERE vec_id % 20 = 0),
         sims AS (
           SELECT q.query_id, e.vec_id,
             round(sum(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)
                 * CAST(q.qe[CAST(i AS INT)] AS DOUBLE))
               / (sqrt(sum(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)
                     * CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)))
                  * sqrt(sum(CAST(q.qe[CAST(i AS INT)] AS DOUBLE)
                     * CAST(q.qe[CAST(i AS INT)] AS DOUBLE)))), 4)
               AS cosine_sim
           FROM embeddings e, q, generate_series(1, 64) AS g(i)
           GROUP BY q.query_id, e.vec_id)
         SELECT query_id, vec_id, cosine_sim FROM sims
         WHERE cosine_sim >= 0.3 AND query_id <> vec_id
         ORDER BY query_id, vec_id""",

    // the q301 one-shot survivorship construction — valid here because
    // streamed ≡ batch is GoldenStore's spec-pinned contract
    "q313_golden_store" ->
      """WITH dk AS (SELECT DISTINCT o_custkey FROM orders),
         cnt AS (SELECT o_custkey, o_orderstatus, count(*) AS c
           FROM orders WHERE o_orderstatus IS NOT NULL GROUP BY 1, 2),
         mf AS (SELECT o_custkey, o_orderstatus FROM (
             SELECT *, row_number() OVER (PARTITION BY o_custkey
               ORDER BY c DESC, o_orderstatus ASC) AS rn FROM cnt)
           WHERE rn = 1),
         lg AS (SELECT o_custkey, o_orderpriority FROM (
             SELECT o_custkey, o_orderpriority, row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY len(o_orderpriority) DESC, o_orderpriority ASC)
               AS rn
             FROM orders WHERE o_orderpriority IS NOT NULL) WHERE rn = 1),
         mm AS (SELECT o_custkey, min(o_orderdate) AS o_orderdate,
             max(o_totalprice) AS o_totalprice
           FROM orders GROUP BY 1),
         lt AS (SELECT o_custkey, o_orderkey FROM (
             SELECT o_custkey, o_orderkey, row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             FROM orders WHERE o_orderkey IS NOT NULL) WHERE rn = 1)
         SELECT dk.o_custkey, lg.o_orderpriority, mm.o_orderdate,
           mm.o_totalprice, lt.o_orderkey, mf.o_orderstatus
         FROM dk LEFT JOIN lg USING (o_custkey)
           LEFT JOIN mm USING (o_custkey)
           LEFT JOIN lt USING (o_custkey)
           LEFT JOIN mf USING (o_custkey)
         ORDER BY dk.o_custkey""",

    // the q312 rank grid folded to per-system mean ranks; pairwise
    // gaps vs CD = q_0.05 * sqrt(k(k+1)/(6N)) with k = 3 -> sqrt(2/N),
    // significance on the rounded-6 grid
    "q314_nemenyi" ->
      """WITH rows AS (SELECT event_id AS i, u.s AS t, u.score AS v
           FROM events, unnest([
             {'s': 'c80', 'score': abs(value - 80.0)},
             {'s': 'c100', 'score': abs(value - 100.0)},
             {'s': 'c120', 'score': abs(value - 120.0)}]) AS tt(u)),
         cells AS (SELECT i, v, CAST(count(*) AS BIGINT) AS cnt
           FROM rows GROUP BY 1, 2),
         ranked AS (SELECT i, v, cnt,
             CAST(CAST(2 * sum(cnt) OVER (PARTITION BY i ORDER BY v)
               - cnt + 1 AS DOUBLE) / 2.0 AS DECIMAL(19,1)) AS r
           FROM cells),
         rj AS (SELECT t, sum(r) AS rj
           FROM rows JOIN ranked USING (i, v) GROUP BY 1),
         n AS (SELECT CAST(count(DISTINCT i) AS BIGINT) AS n_items
           FROM rows),
         means AS (SELECT t,
             round(CAST(rj AS DOUBLE) / n_items, 9) AS mr, n_items
           FROM rj, n)
         SELECT a.t AS treatment_a, b.t AS treatment_b,
           round(a.mr, 6) AS mean_rank_a, round(b.mr, 6) AS mean_rank_b,
           round(abs(a.mr - b.mr), 6) AS abs_diff,
           round(2.343 * sqrt(2.0 / CAST(a.n_items AS DOUBLE)), 6)
             AS critical_difference,
           CAST(round(abs(a.mr - b.mr), 6) >
             round(2.343 * sqrt(2.0 / CAST(a.n_items AS DOUBLE)), 6)
             AS INT) AS significant
         FROM means a, means b WHERE a.t < b.t
         ORDER BY treatment_a, treatment_b""",

    // within-item average ranks off each item's own value grid, exact
    // DECIMAL rank sums, the round-9 Sum R_j^2 accumulation,
    // tie-corrected twin
    "q312_friedman" ->
      """WITH rows AS (SELECT event_id AS i, u.s AS t, u.score AS v
           FROM events, unnest([
             {'s': 'c80', 'score': abs(value - 80.0)},
             {'s': 'c100', 'score': abs(value - 100.0)},
             {'s': 'c120', 'score': abs(value - 120.0)}]) AS tt(u)),
         cells AS (SELECT i, v, CAST(count(*) AS BIGINT) AS cnt
           FROM rows GROUP BY 1, 2),
         ranked AS (SELECT i, v, cnt,
             CAST(CAST(2 * sum(cnt) OVER (PARTITION BY i ORDER BY v)
               - cnt + 1 AS DOUBLE) / 2.0 AS DECIMAL(19,1)) AS r
           FROM cells),
         rj AS (SELECT t, sum(r) AS rj
           FROM rows JOIN ranked USING (i, v) GROUP BY 1),
         n AS (SELECT CAST(count(DISTINCT i) AS BIGINT) AS n_items
           FROM rows),
         s2 AS (SELECT sum(CAST(round(CAST(rj AS DOUBLE)
             * CAST(rj AS DOUBLE), 9) AS DECIMAL(38,9))) AS s FROM rj),
         ties AS (SELECT sum(CAST(cnt AS DECIMAL(12,0)) *
             (CAST(cnt AS DECIMAL(12,0)) - 1) *
             (CAST(cnt AS DECIMAL(12,0)) + 1)) AS tsum FROM cells)
         SELECT n_items, CAST(3 AS BIGINT) AS k_treatments,
           round(12.0 / (CAST(n_items AS DOUBLE) * 3.0 * 4.0)
             * CAST(s AS DOUBLE)
             - 3.0 * CAST(n_items AS DOUBLE) * 4.0, 6) AS chi2,
           round(CASE WHEN 1.0 - CAST(tsum AS DOUBLE)
               / (CAST(n_items AS DOUBLE) * 3.0 * 8.0) <> 0.0 THEN
             (12.0 / (CAST(n_items AS DOUBLE) * 3.0 * 4.0)
               * CAST(s AS DOUBLE)
               - 3.0 * CAST(n_items AS DOUBLE) * 4.0)
             / (1.0 - CAST(tsum AS DOUBLE)
               / (CAST(n_items AS DOUBLE) * 3.0 * 8.0)) END, 6)
             AS chi2_tie
         FROM n, s2, ties""",

    // the q304 global rank grid folded to per-group mean ranks;
    // pairwise z with the tie-corrected variance
    // N(N+1)/12 - Sum t(t-1)(t+1) / (12(N-1))
    "q315_dunn" ->
      """WITH rows AS (SELECT event_type AS g, value AS v FROM events
             WHERE event_type IS NOT NULL AND value IS NOT NULL),
         levels AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt
             FROM rows GROUP BY 1),
         ranks AS (SELECT v, cnt,
             CAST(CAST(2 * sum(cnt) OVER (ORDER BY v) - cnt + 1 AS DOUBLE)
               / 2.0 AS DECIMAL(19,1)) AS r FROM levels),
         gv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
             FROM rows GROUP BY 1, 2),
         rg AS (SELECT g, sum(CAST(c AS DECIMAL(19,0)) * r) AS rg,
             CAST(sum(c) AS BIGINT) AS ng
           FROM gv JOIN ranks USING (v) GROUP BY 1),
         tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n FROM rg),
         ties AS (SELECT sum(CAST(cnt AS DECIMAL(12,0)) *
             (CAST(cnt AS DECIMAL(12,0)) - 1) *
             (CAST(cnt AS DECIMAL(12,0)) + 1)) AS tsum FROM levels),
         st AS (SELECT CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 12.0
             - CAST(tsum AS DOUBLE) / (12.0 * (CAST(n AS DOUBLE) - 1.0))
             AS sig2 FROM tot, ties),
         means AS (SELECT g, round(CAST(rg AS DOUBLE) / ng, 9) AS mr, ng
           FROM rg)
         SELECT a.g AS group_a, b.g AS group_b,
           a.ng AS n_a, b.ng AS n_b,
           round(a.mr, 6) AS mean_rank_a, round(b.mr, 6) AS mean_rank_b,
           round(CASE WHEN round(sig2, 9) > 0.0 THEN (a.mr - b.mr)
             / sqrt(sig2 * (1.0 / a.ng + 1.0 / b.ng)) END, 6) AS z
         FROM means a, means b, st WHERE a.g < b.g
         ORDER BY group_a, group_b""",

    // the q224 cohort frame, then the hypergeometric O/E/V fold over
    // the shared duration grid: 9-grid E = d*na/n and
    // V = d*(na/n)*(1-na/n)*(n-d)/(n-1) terms summed in DECIMAL(38,9)
    "q316_log_rank" ->
      """WITH per AS (SELECT user_id, min(ts) AS first_ts,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS conv_ts,
             max(ts) AS last_ts
           FROM events GROUP BY 1),
         r AS (SELECT CAST(user_id % 2 AS INT) AS g,
             CAST(date_diff('day', CAST(first_ts AS DATE),
               CAST(coalesce(conv_ts, last_ts) AS DATE)) AS INT) AS dur,
             CASE WHEN conv_ts IS NOT NULL THEN 1 ELSE 0 END AS ev
           FROM per),
         ids AS (SELECT min(g) AS ga, max(g) AS gb FROM r),
         lvl AS (SELECT dur, sum(ev) AS d, count(*) AS t,
             sum(CASE WHEN g = (SELECT ga FROM ids) AND ev = 1
               THEN 1 ELSE 0 END) AS da,
             sum(CASE WHEN g = (SELECT ga FROM ids)
               THEN 1 ELSE 0 END) AS ta
           FROM r GROUP BY 1),
         tot AS (SELECT sum(t) AS n, sum(ta) AS na FROM lvl),
         w AS (SELECT l.*, n, na,
             n - sum(t) OVER (ORDER BY dur) + t AS nr,
             na - sum(ta) OVER (ORDER BY dur) + ta AS nra
           FROM lvl l, tot),
         terms AS (SELECT *,
             CASE WHEN d > 0 THEN CAST(round(CAST(d AS DOUBLE)
               * nra / nr, 9) AS DECIMAL(38,9))
               ELSE CAST(0 AS DECIMAL(38,9)) END AS e,
             CASE WHEN d > 0 AND nr > 1 THEN CAST(round(
               CAST(d AS DOUBLE) * (CAST(nra AS DOUBLE) / nr)
               * (1.0 - CAST(nra AS DOUBLE) / nr)
               * (CAST(nr AS DOUBLE) - d) / (CAST(nr AS DOUBLE) - 1.0),
               9) AS DECIMAL(38,9))
               ELSE CAST(0 AS DECIMAL(38,9)) END AS v
           FROM w),
         f AS (SELECT sum(da) AS oa, sum(d) AS dd, sum(e) AS ea,
             sum(v) AS vv, max(n) AS n, max(na) AS na FROM terms)
         SELECT ga AS group_a, gb AS group_b,
           CAST(na AS BIGINT) AS n_a, CAST(n - na AS BIGINT) AS n_b,
           CAST(oa AS BIGINT) AS observed_a,
           round(CAST(ea AS DOUBLE), 6) AS expected_a,
           CAST(dd - oa AS BIGINT) AS observed_b,
           round(CAST(dd AS DOUBLE) - CAST(ea AS DOUBLE), 6)
             AS expected_b,
           round(CASE WHEN round(CAST(vv AS DOUBLE), 9) > 0.0 THEN
             power((CAST(oa AS DOUBLE) - CAST(ea AS DOUBLE))
               / sqrt(CAST(vv AS DOUBLE)), 2) END, 6) AS chi2,
           round(CASE WHEN round(CAST(vv AS DOUBLE), 9) > 0.0 THEN
             (CAST(oa AS DOUBLE) - CAST(ea AS DOUBLE))
               / sqrt(CAST(vv AS DOUBLE)) END, 6) AS z
         FROM f, ids""",

    // group medians off the (g, value) grid's cumulative walk (the
    // two levels straddling ranks ceil(n/2) and floor(n/2)+1
    // average), 9-grid |deviations|, then the q207 anovaF fold
    "q317_brown_forsythe" ->
      """WITH r AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
             FROM events
             WHERE event_type IS NOT NULL AND value IS NOT NULL),
         lvl AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
           FROM r GROUP BY 1, 2),
         tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS ng
           FROM lvl GROUP BY 1),
         w1 AS (SELECT l.g, l.v, l.c, t.ng,
             sum(c) OVER (PARTITION BY l.g ORDER BY v) AS cum
           FROM lvl l JOIN tot t USING (g)),
         med AS (SELECT g,
             (max(CASE WHEN cum >= (ng + 1) // 2
                AND cum - c < (ng + 1) // 2 THEN v END)
              + max(CASE WHEN cum >= ng // 2 + 1
                AND cum - c < ng // 2 + 1 THEN v END)) / 2.0 AS m
           FROM w1 GROUP BY g),
         dev AS (SELECT r.g, round(abs(r.v - med.m), 9) AS z
           FROM r JOIN med USING (g)),
         per AS (SELECT g, count(*) AS n,
             sum(CAST(round(z, 9) AS DECIMAL(38,9))) AS s,
             sum(CAST(round(z * z, 9) AS DECIMAL(38,9))) AS q
           FROM dev GROUP BY 1),
         f AS (SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT) AS n, sum(s) AS ts, sum(q) AS tq,
             sum(CAST(round(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n, 9)
               AS DECIMAL(38,9))) AS tb
           FROM per)
         SELECT k, n,
           round(CASE WHEN k >= 2 AND n > k
               AND CAST(tq AS DOUBLE) - CAST(tb AS DOUBLE) > 0
             THEN ((CAST(tb AS DOUBLE) - CAST(ts AS DOUBLE)
                 * CAST(ts AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(k AS DOUBLE) - 1.0))
               / ((CAST(tq AS DOUBLE) - CAST(tb AS DOUBLE))
               / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))) END, 6) AS w
         FROM f""",

    // dense (level x group) grid, per-group cumulative below-counts,
    // k-bounded ordered-group prefix within each level, 2J folded in
    // DECIMAL(38,0); Hollander-Wolfe tie-corrected moments
    "q318_jonckheere" ->
      """WITH r AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
             FROM events
             WHERE event_type IS NOT NULL AND value IS NOT NULL),
         cells AS (SELECT v, g, CAST(count(*) AS BIGINT) AS c
           FROM r GROUP BY 1, 2),
         lv AS (SELECT v, CAST(sum(c) AS BIGINT) AS t
           FROM cells GROUP BY 1),
         gr AS (SELECT g, CAST(sum(c) AS BIGINT) AS ng
           FROM cells GROUP BY 1),
         dense AS (SELECT lv.v, gr.g, coalesce(c.c, 0) AS c
           FROM lv CROSS JOIN gr
           LEFT JOIN cells c ON c.v = lv.v AND c.g = gr.g),
         cum AS (SELECT *, sum(c) OVER (PARTITION BY g ORDER BY v) - c
             AS below FROM dense),
         pref AS (SELECT *,
             coalesce(sum(below) OVER (PARTITION BY v ORDER BY g
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pb,
             coalesce(sum(c) OVER (PARTITION BY v ORDER BY g
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pc
           FROM cum),
         j AS (SELECT sum(CAST(c AS DECIMAL(38,0))
             * CAST(2 * pb + pc AS DECIMAL(38,0))) AS j2 FROM pref),
         gm AS (SELECT CAST(sum(ng) AS DECIMAL(38,0)) AS n,
             CAST(count(*) AS BIGINT) AS k,
             sum(CAST(ng AS DECIMAL(38,0)) * ng) AS sn2,
             sum(CAST(ng AS DECIMAL(38,0)) * (ng - 1)) AS sn21,
             sum(CAST(ng AS DECIMAL(38,0)) * (ng - 1) * (2 * ng + 5))
               AS sn25,
             sum(CAST(ng AS DECIMAL(38,0)) * (ng - 1) * (ng - 2)) AS sn3
           FROM gr),
         tm AS (SELECT sum(CAST(t AS DECIMAL(38,0)) * (t - 1)) AS st21,
             sum(CAST(t AS DECIMAL(38,0)) * (t - 1) * (2 * t + 5))
               AS st25,
             sum(CAST(t AS DECIMAL(38,0)) * (t - 1) * (t - 2)) AS st3
           FROM lv),
         vr AS (SELECT j2, n, k, sn2,
             (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
               * (2.0 * CAST(n AS DOUBLE) + 5.0)
               - CAST(sn25 AS DOUBLE) - CAST(st25 AS DOUBLE)) / 72.0
             + CAST(sn3 AS DOUBLE) * CAST(st3 AS DOUBLE)
               / (36.0 * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                 * (CAST(n AS DOUBLE) - 2.0))
             + CAST(sn21 AS DOUBLE) * CAST(st21 AS DOUBLE)
               / (8.0 * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
             AS var FROM j, gm, tm)
         SELECT CAST(n AS BIGINT) AS n, k AS k_groups,
           round(CAST(j2 AS DOUBLE) / 2.0, 6) AS j_stat,
           round(CASE WHEN n >= 3 AND round(var, 9) > 0.0 THEN
             (CAST(2 * j2 - (n * n - sn2) AS DOUBLE) / 4.0) / sqrt(var)
           END, 6) AS z
         FROM vr""",

    // 9-grid group means broadcast back, centered 9-grid deviation
    // powers summed in DECIMAL(38,9), moment ratios in double
    "q319_jarque_bera" ->
      """WITH r AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
             FROM events
             WHERE event_type IS NOT NULL AND value IS NOT NULL),
         mu AS (SELECT g, round(CAST(sum(CAST(round(v, 9)
               AS DECIMAL(38,9))) AS DOUBLE) / count(*), 9) AS m
           FROM r GROUP BY 1),
         d AS (SELECT r.g, round(r.v - mu.m, 9) AS dv
           FROM r JOIN mu USING (g)),
         agg AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(round(dv * dv, 9) AS DECIMAL(38,9))) AS s2,
             sum(CAST(round(dv * dv * dv, 9) AS DECIMAL(38,9))) AS s3,
             sum(CAST(round(dv * dv * dv * dv, 9) AS DECIMAL(38,9)))
               AS s4
           FROM d GROUP BY 1),
         m AS (SELECT g, n, CAST(s2 AS DOUBLE) / n AS m2,
             CAST(s3 AS DOUBLE) / n AS m3, CAST(s4 AS DOUBLE) / n AS m4
           FROM agg)
         SELECT g AS event_type, n,
           round(CASE WHEN m2 > 0.0
             THEN m3 / (m2 * sqrt(m2)) END, 6) AS skewness,
           round(CASE WHEN m2 > 0.0 THEN m4 / (m2 * m2) END, 6)
             AS kurtosis,
           round(CASE WHEN m2 > 0.0 THEN CAST(n AS DOUBLE) / 6.0
             * ((m3 / (m2 * sqrt(m2))) * (m3 / (m2 * sqrt(m2)))
               + (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0)
                 / 4.0) END, 6) AS jb
         FROM m ORDER BY event_type""",

    // the discovered vocabularies written out as literal CASE
    // indicators (F/O/P; 1-URGENT..5-LOW), sanitized names
    "q320_one_hot" ->
      """SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
             AS o_orderstatus_F,
           CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END
             AS o_orderstatus_O,
           CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END
             AS o_orderstatus_P,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
             AS o_orderpriority_1_URGENT,
           CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END
             AS o_orderpriority_2_HIGH,
           CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END
             AS o_orderpriority_3_MEDIUM,
           CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0
             END AS o_orderpriority_4_NOT_SPECIFIED,
           CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END
             AS o_orderpriority_5_LOW
         FROM orders ORDER BY o_orderkey""",

    // ground truth by definition: transitive closure (recursive CTE),
    // component = least mutually-reachable id
    "q321_scc" ->
      """WITH RECURSIVE nn AS (SELECT DISTINCT
             CAST(user_id % 96 AS BIGINT) AS n FROM events),
         edges AS (
           SELECT n AS src, (n - n % 8) + ((n % 8) + 1) % 8 AS dst
             FROM nn
           UNION ALL SELECT n, n + 8 FROM nn WHERE n % 16 < 8
           UNION ALL SELECT n + 960, n FROM nn WHERE n < 4),
         e AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
         reach AS (
           SELECT src AS a, dst AS b FROM e
           UNION
           SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b),
         verts AS (SELECT src AS id FROM edges
           UNION SELECT dst FROM edges)
         SELECT v.id AS id,
           least(v.id, coalesce(min(CASE WHEN r2.a IS NOT NULL
             THEN r1.b END), v.id)) AS component
         FROM verts v
         LEFT JOIN reach r1 ON r1.a = v.id
         LEFT JOIN reach r2 ON r2.a = r1.b AND r2.b = v.id
         GROUP BY v.id ORDER BY id""",

    // the q242 daily frame; S from the t1 < t2 pair join, z from the
    // tie-corrected variance with the ±1 continuity correction
    "q322_mann_kendall" ->
      """WITH srs AS (SELECT event_type AS k,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
               AS DOUBLE) AS t,
             CAST(count(*) AS DOUBLE) AS v
           FROM events GROUP BY event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE))),
         s AS (SELECT a.k, CAST(sum(CASE WHEN b.v > a.v THEN 1
               WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS s
           FROM srs a JOIN srs b ON a.k = b.k AND a.t < b.t
           GROUP BY 1),
         n AS (SELECT k, CAST(count(*) AS BIGINT) AS n FROM srs
           GROUP BY 1),
         tie AS (SELECT k, sum(CAST(c AS DECIMAL(38,0)) * (c - 1)
               * (2 * c + 5)) AS ts
           FROM (SELECT k, v, CAST(count(*) AS BIGINT) AS c
             FROM srs GROUP BY 1, 2) GROUP BY 1),
         f AS (SELECT n.k, n.n, coalesce(s.s, 0) AS s,
             (CAST(n.n AS DOUBLE) * (n.n - 1) * (2 * n.n + 5)
               - CAST(tie.ts AS DOUBLE)) / 18.0 AS var
           FROM n LEFT JOIN s ON s.k = n.k
           LEFT JOIN tie ON tie.k = n.k)
         SELECT k AS event_type, n, n AS n_used, s,
           round(CASE WHEN round(var, 9) > 0.0 THEN
             CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0) / sqrt(var)
               WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0) / sqrt(var)
               ELSE 0.0 END END, 6) AS z
         FROM f ORDER BY event_type""",

    // per-stratum 2x2 conditional counts, 9-grid MH terms folded in
    // DECIMAL(38,9), the R correct=TRUE CMH form; double chains
    // written in the operator's exact association order
    "q323_mantel_haenszel" ->
      """WITH r AS (SELECT event_type AS s,
             CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END AS e,
             CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS o
           FROM events WHERE event_type IS NOT NULL
             AND user_id IS NOT NULL AND value IS NOT NULL),
         cells AS (SELECT s,
             CAST(sum(CASE WHEN e = 1 AND o = 1 THEN 1 ELSE 0 END)
               AS DOUBLE) AS a,
             CAST(sum(CASE WHEN e = 1 AND o = 0 THEN 1 ELSE 0 END)
               AS DOUBLE) AS b,
             CAST(sum(CASE WHEN e = 0 AND o = 1 THEN 1 ELSE 0 END)
               AS DOUBLE) AS c,
             CAST(sum(CASE WHEN e = 0 AND o = 0 THEN 1 ELSE 0 END)
               AS DOUBLE) AS d
           FROM r GROUP BY 1),
         t AS (SELECT s, a, b, c, d, a + b + c + d AS n FROM cells),
         f AS (SELECT CAST(count(*) AS BIGINT) AS k_strata,
             CAST(sum(n) AS BIGINT) AS n, sum(a) AS sa,
             sum(CAST(round(a * d / n, 9) AS DECIMAL(38,9))) AS num,
             sum(CAST(round(b * c / n, 9) AS DECIMAL(38,9))) AS den,
             sum(CAST(round((a + b) * (a + c) / n, 9)
               AS DECIMAL(38,9))) AS se,
             sum(CASE WHEN n >= 2 THEN CAST(round(
                 (a + b) * (c + d) * ((a + c) * (b + d))
                   / (n * n * (n - 1.0)), 9) AS DECIMAL(38,9))
               ELSE CAST(0 AS DECIMAL(38,9)) END) AS sv
           FROM t)
         SELECT k_strata, n,
           round(CASE WHEN CAST(den AS DOUBLE) > 0.0
             THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END, 6)
             AS or_mh,
           round(CASE WHEN round(CAST(sv AS DOUBLE), 9) > 0.0 THEN
             (abs(sa - CAST(se AS DOUBLE)) - 0.5)
               * (abs(sa - CAST(se AS DOUBLE)) - 0.5)
               / CAST(sv AS DOUBLE) END, 6) AS chi2
         FROM f""",

    // group ranks as scores off the k-row ordered window, exact
    // integer folds, one double division
    "q324_cochran_armitage" ->
      """WITH r AS (SELECT o_orderpriority AS g,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS o
           FROM orders WHERE o_orderpriority IS NOT NULL
             AND o_orderstatus IS NOT NULL),
         per AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(o) AS BIGINT) AS rr FROM r GROUP BY 1),
         sc AS (SELECT *, row_number() OVER (ORDER BY g) - 1 AS s
           FROM per),
         f AS (SELECT CAST(count(*) AS BIGINT) AS k_groups,
             CAST(sum(n) AS BIGINT) AS n,
             CAST(sum(rr) AS BIGINT) AS successes,
             sum(CAST(s AS DECIMAL(38,0)) * rr) AS sr,
             sum(CAST(s AS DECIMAL(38,0)) * n) AS sn,
             sum(CAST(s AS DECIMAL(38,0)) * s * n) AS s2n
           FROM sc)
         SELECT k_groups, n, successes,
           round(CASE WHEN round(CAST(successes AS DOUBLE)
               * (CAST(n AS DOUBLE) - successes)
               * (CAST(n AS DOUBLE) * CAST(s2n AS DOUBLE)
                 - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE))
               / CAST(n AS DOUBLE), 9) > 0.0 THEN
             (CAST(n AS DOUBLE) * CAST(sr AS DOUBLE)
               - CAST(successes AS DOUBLE) * CAST(sn AS DOUBLE))
             / sqrt(CAST(successes AS DOUBLE)
               * (CAST(n AS DOUBLE) - successes)
               * (CAST(n AS DOUBLE) * CAST(s2n AS DOUBLE)
                 - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE))
               / CAST(n AS DOUBLE)) END, 6) AS z
         FROM f""",

    // the q242 daily frame through the q177 olsFit closed form
    // (intercept from the UNROUNDED slope, both published on the
    // 4-grid), 9-grid residuals, lag walk, DECIMAL(38,9) folds
    "q325_durbin_watson" ->
      """WITH srs AS (SELECT event_type AS k,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
               AS DOUBLE) AS t,
             CAST(count(*) AS DOUBLE) AS v
           FROM events GROUP BY event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE))),
         g AS (SELECT k,
             CAST(round(CAST(t AS DECIMAL(18,4)), 4) AS DECIMAL(19,4))
               AS x,
             CAST(round(CAST(v AS DECIMAL(18,4)), 4) AS DECIMAL(19,4))
               AS y
           FROM srs),
         s AS (SELECT k, CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(CAST(x * y AS DECIMAL(38,8))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(x * x AS DECIMAL(38,8))) AS DOUBLE) AS sxx
           FROM g GROUP BY 1),
         fit AS (SELECT k, CAST(n AS BIGINT) AS n,
             round((n*sxy - sx*sy)/(n*sxx - sx*sx), 4) AS slope,
             round((sy - ((n*sxy - sx*sy)/(n*sxx - sx*sx)) * sx)/n, 4)
               AS icept
           FROM s WHERE n*sxx - sx*sx <> 0.0),
         res AS (SELECT g.k, CAST(g.x AS DOUBLE) AS t,
             round(CAST(g.y AS DOUBLE) - (icept + slope
               * CAST(g.x AS DOUBLE)), 9) AS e, n
           FROM g JOIN fit ON g.k = fit.k),
         lagd AS (SELECT *, lag(e) OVER (PARTITION BY k ORDER BY t)
             AS ep FROM res),
         f AS (SELECT k, max(n) AS n,
             sum(CASE WHEN ep IS NOT NULL THEN CAST(round(
               (e - ep) * (e - ep), 9) AS DECIMAL(38,9))
               ELSE CAST(0 AS DECIMAL(38,9)) END) AS num,
             sum(CAST(round(e * e, 9) AS DECIMAL(38,9))) AS den
           FROM lagd GROUP BY 1)
         SELECT k AS event_type, n,
           round(CASE WHEN n >= 2
               AND round(CAST(den AS DOUBLE), 9) > 0.0
             THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END, 6)
             AS dw
         FROM f ORDER BY event_type""")
}
