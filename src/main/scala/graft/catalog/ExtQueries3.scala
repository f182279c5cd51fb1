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

    // --- seasonal-residual anomaly gate ------------------------------------
    // The q213 decomposition's residual through the q175 MAD fence:
    // days anomalous AFTER the weekly pattern is accounted for.
    "q245_seasonal_outliers" -> ((s, d) =>
      graft.operators.TimeSeries.seasonalOutliers(
          t(s, d, "orders").groupBy(col("o_orderdate").as("day"))
            .agg(count(lit(1)).cast("double").as("cnt")),
          "day", "cnt", period = 7, k = 3.0)
        .orderBy(col("day"))),

    // --- depth-2 decision tree ---------------------------------------------
    // q200's split finder recursed once: root + per-side thresholds on
    // the quantity/returnflag pair.
    "q246_decision_tree" -> ((s, d) =>
      graft.operators.Classify.decisionTreeDepth2(
          t(s, d, "lineitem"), "l_quantity", "l_returnflag")
        .orderBy(col("node"))),

    // --- BPE encoding under a PINNED merge table ---------------------------
    // q101 learns merges (engine-iterative, rows-only); this applies a
    // fixed 5-merge table so the greedy left-to-right application
    // itself — the serving path of the tokenizer — is DuckDB-oracled.
    "q247_bpe_encode" -> ((s, d) => {
      import s.implicits._
      val merges = Seq(
        (0, "t", "h", "th", 0L), (1, "th", "e", "the", 0L),
        (2, "i", "n", "in", 0L), (3, "a", "n", "an", 0L),
        (4, "e", "r", "er", 0L))
        .toDF("rank", "left", "right", "merged", "pair_count")
      // repartition: documents scans as one split and the per-token
      // merge fold is CPU-bound — spread it (the q227 one-split lesson)
      graft.operators.Bpe.encode(
          t(s, d, "documents")
            .repartition(s.sparkContext.defaultParallelism),
          "text", merges)
        .select(col("doc_id"),
          coalesce(size(col("bpe_tokens")), lit(0)).as("n_tokens"),
          coalesce(size(filter(col("bpe_tokens"), x => x === "the")),
            lit(0)).as("n_the"))
        .orderBy(col("doc_id"))
    }),

    // --- quantile (median) regression by subgradient descent ---------------
    // τ = 0.5 LAD fit of scaled price on scaled quantity/discount —
    // the q227 unrolled-GD oracle pattern with the pinball indicator.
    "q248_quantile_gd" -> ((s, d) =>
      graft.operators.Classify.quantileGD(
        t(s, d, "lineitem")
          .withColumn("y", col("l_extendedprice").cast("double") / 60000.0)
          .withColumn("x1", col("l_quantity").cast("double") / 50.0)
          .withColumn("x2", col("l_discount").cast("double") * 10.0),
        "y", Seq("x1", "x2"), tau = 0.5, lr = 0.5, iters = 3)),

    // --- count-min sketch point estimates ----------------------------------
    // Per-type user-frequency sketch at (d=4, w=64) — deliberately
    // collision-heavy so min-over-rows earns its keep; probes every 10th
    // user against the exact counts.
    "q249_cms_estimate" -> ((s, d) => {
      val rows = ev(s, d).filter(col("user_id").isNotNull)
      val sketch = graft.operators.Sketches.cmsCounts(
        rows, Seq("event_type"), "user_id", depth = 4, width = 64)
      val items = rows.filter(col("user_id") % 10 === 0)
        .select(col("event_type"), col("user_id"))
      val exact = rows.groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("exact_n"))
      graft.operators.Sketches.cmsEstimate(
          sketch, items, Seq("event_type"), "user_id", depth = 4, width = 64)
        .join(exact, Seq("event_type", "user_id"))
        .orderBy(col("event_type"), col("user_id"))
    }),

    // --- per-cluster embedding centroid drift ------------------------------
    // The q103 frozen-centroid assignment, corpus split into two
    // pseudo-epochs by vec_id parity; drift = per-cluster mean-vector
    // displacement.
    "q250_centroid_drift" -> ((s, d) => {
      val emb = t(s, d, "embeddings").filter(col("embedding").isNotNull)
      val centroids = emb.filter(col("vec_id") < 8)
        .select((col("vec_id") + 1L).as("cluster_id"),
          col("embedding").cast("array<double>").as("centroid"))
      val assigned = graft.operators.KMeans.assign(
          emb, "embedding", "vec_id", centroids)
        .withColumn("epoch", pmod(col("vec_id"), lit(2L)))
      graft.functions.VectorFunctions.centroidDrift(
          assigned, "cluster_id", "epoch", "embedding")
        .orderBy(col("cluster_id"))
    }),

    // --- empirical-CDF quantile transform ----------------------------------
    // Rank-uniform code table for l_quantity per return flag (a
    // naturally discrete column — the grid contract).
    "q251_quantile_transform" -> ((s, d) =>
      graft.operators.Features.quantileTransform(
          t(s, d, "lineitem"), "l_returnflag", "l_quantity")
        .orderBy(col("l_returnflag"), col("value"))),

    // --- autocorrelation function ------------------------------------------
    // ACF to lag 7 of the daily event-count series per type: the
    // weekly-period detector for q213/q236.
    "q252_acf" -> ((s, d) =>
      graft.operators.TimeSeries.autocorrelation(
          ev(s, d).groupBy(col("event_type"),
              col("ts").cast("date").as("day"))
            .agg(count(lit(1)).cast("double").as("cnt")),
          "event_type", "day", "cnt", maxLag = 7)
        .orderBy(col("event_type"), col("lag"))),

    // --- conversion-lag distribution ---------------------------------------
    // Minutes from first signup to first at-or-after purchase, exact
    // grid-walk order statistics.
    "q253_conversion_lag" -> ((s, d) =>
      graft.operators.Funnel.conversionLag(
        ev(s, d), "user_id", "ts", "event_type",
        "signup", "purchase", unitSeconds = 60L)),

    // --- interval coalescing -----------------------------------------------
    // Each event opens a 30-minute activity window per user; merged
    // maximal windows = activity sessions by interval algebra.
    "q254_interval_merge" -> ((s, d) =>
      graft.operators.TimeSeries.mergeIntervals(
          ev(s, d).select(col("user_id"), col("ts").as("s"),
            (col("ts") + expr("INTERVAL 30 MINUTES")).as("e")),
          "user_id", "s", "e")
        .orderBy(col("user_id"), col("start"))),

    // --- kth-NN distance outlier score -------------------------------------
    // Isolation readout for embedding curation: distance to the 5th
    // nearest neighbor, full-probe (= exact brute force — the q228
    // adjudication) over a 20% query sample; production prunes nprobe.
    "q255_knn_outlier" -> ((s, d) => {
      import graft.functions.IvfIndex
      val emb = t(s, d, "embeddings")
      val idx = LlmQueries.cachedIvfIndex(s, d + "#all")(
        IvfIndex.build(emb, "embedding", "vec_id", k = 8))
      val qs = emb.filter(col("vec_id") % 5 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine_sim").desc, col("vec_id"))
      IvfIndex.knnJoin(idx, qs, "query_id", "qvec",
          "embedding", "vec_id", k = 6, nprobe = 8, grid = 4)
        .filter(col("query_id") =!= col("vec_id"))
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 5)
        .select(col("query_id").as("vec_id"),
          round(lit(1.0) - col("cosine_sim"), 4).as("outlier_score"))
        .orderBy(col("outlier_score").desc, col("vec_id"))
        .limit(20)
    }),

    // --- top JSD-contributing terms ----------------------------------------
    // The WHICH behind q206's corpus-drift number: 20 most drifted
    // tokens between the doc_id-parity halves.
    "q256_drift_terms" -> ((s, d) => {
      val docs = t(s, d, "documents")
      def toks(f: DataFrame) = f.select(explode(
        expr(graft.plans.Tokens.whitespaceSql("text"))).as("token"))
      graft.operators.Eval.jsDivergenceTerms(
        toks(docs.filter(col("doc_id") % 2 === 0)),
        toks(docs.filter(col("doc_id") % 2 =!= 0)), "token", k = 20)
    }),

    // --- time-weighted average ---------------------------------------------
    // ∫value dt / span per event type — what the arithmetic mean of an
    // irregularly sampled stream gets wrong.
    "q257_twap" -> ((s, d) =>
      graft.operators.TimeSeries.timeWeightedAverage(
          ev(s, d), "event_type", "ts", "value")
        .orderBy(col("event_type"))),

    // --- Lorenz curve ------------------------------------------------------
    // The inequality curve behind q197's Gini, same spend-per-priority
    // input.
    "q258_lorenz" -> ((s, d) =>
      graft.operators.Eval.lorenzCurve(
          t(s, d, "orders"), "o_orderpriority", "o_totalprice")
        .orderBy(col("o_orderpriority"), col("decile"))),

    // --- per-column PSI drift sweep ----------------------------------------
    // q196's pre/post-1996 split, three columns of one orders scan:
    // price drifts; custkey and orderkey shouldn't.
    "q259_psi_sweep" -> ((s, d) => {
      val o = t(s, d, "orders")
      graft.operators.Eval.psiSweep(
          o.filter(col("o_orderdate") < lit("1996-01-01")),
          o.filter(col("o_orderdate") >= lit("1996-01-01")),
          Seq("o_custkey", "o_orderkey", "o_totalprice"))
        .orderBy(col("column"))
    }),

    // --- persisted IVF×PQ store lifecycle (rows-only — engine-clustered
    // layout; correctness = IvfPqStoreSpec's served ≡ in-session proof
    // + AnnRecallSpec's measured floor, the q219 adjudication) ------------
    // Full lifecycle per invocation: train both layers on 90%, frozen
    // append of 10%, partition-pruned ADC+refine serve.
    "q260_ivfpq_store" -> ((s, d) => {
      import scala.jdk.CollectionConverters._
      val emb = t(s, d, "embeddings")
      val qvec = emb.filter(col("vec_id") === 0).select("embedding")
        .collect()(0).getList[Float](0).asScala.toSeq
      val rest = emb.filter(col("vec_id") =!= 0)
      // session-cached store (built once per dataset, swept on app end
      // — ADVICE r9: per-invocation temp stores leaked vectors+codes
      // trees across bench/verify reps)
      val store = LlmQueries.cachedStore(s, d, "ivfpq-q260") { p =>
        graft.functions.IvfPqStore.build(
          rest.filter(col("vec_id") % 10 =!= 9), "embedding", "vec_id",
          p, k = 8, iterations = 2, m = 8, ksub = 16)
        graft.functions.IvfPqStore.append(
          rest.filter(col("vec_id") % 10 === 9), p, batchId = 1L)
      }
      graft.functions.IvfPqStore.topK(s, store, qvec, k = 10,
          nprobe = 4, shortlist = 50)
        .select(col("vec_id"), round(col("l2_dist"), 4).as("l2_dist"))
    }),

    // --- duplication audit histogram ---------------------------------------
    // Planted exact dups (the first 50 docs appended again) → sizes 1
    // and 2 with exact cluster/doc counts.
    "q261_dedup_report" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val corpus = docs.unionByName(
        docs.filter(col("doc_id") < 50)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      graft.operators.Profile.duplicationHistogram(corpus, "text")
        .orderBy(col("cluster_size"))
    }),

    // --- PSI drift timeline ------------------------------------------------
    // Order-price drift per year against the fixed first-year (1995)
    // reference: WHEN did the distribution move?
    "q262_psi_timeline" -> ((s, d) => {
      val o = t(s, d, "orders")
      graft.operators.Eval.psiOverTime(
          o.filter(col("o_orderdate") < lit("1996-01-01")),
          o.filter(col("o_orderdate") >= lit("1996-01-01"))
            .withColumn("yr", year(col("o_orderdate"))),
          "o_totalprice", "yr")
        .orderBy(col("yr"))
    }),

    // --- binary-segmentation changepoints ----------------------------------
    // The q212 CUSUM peak recursed into both sides of the daily order
    // series.
    "q263_changepoints2" -> ((s, d) =>
      graft.operators.TimeSeries.changePoints2(
          t(s, d, "orders").groupBy(col("o_orderdate").as("day"))
            .agg(count(lit(1)).cast("double").as("cnt")),
          "day", "cnt")
        .orderBy(col("segment"))),

    // --- local-maximum peak detection --------------------------------------
    // Daily event-count crests per type with prominence >= 3 events.
    "q264_peaks" -> ((s, d) =>
      graft.operators.TimeSeries.peaks(
          ev(s, d).groupBy(col("event_type"),
              col("ts").cast("date").as("day"))
            .agg(count(lit(1)).cast("double").as("cnt")),
          "event_type", "day", "cnt", minProminence = 3.0)
        .orderBy(col("event_type"), col("day"))),

    // --- cohort LTV curves -------------------------------------------------
    // Cumulative per-user event value by cohort week and age.
    "q265_cohort_ltv" -> ((s, d) =>
      graft.operators.Funnel.cohortLtv(
          ev(s, d), "user_id", "ts", "value", "2024-01-01")
        .orderBy(col("cohort_week"), col("age_weeks"))),

    // --- record-linkage blocking report ------------------------------------
    // Is (nation, segment) a good enough blocking key for customer
    // matching? Exact candidate-pair accounting in DECIMAL(38,0).
    "q266_blocking_report" -> ((s, d) =>
      graft.operators.Profile.blockingReport(
        t(s, d, "customer"), Seq("c_nationkey", "c_mktsegment"))),

    // --- embedding-column health profile -----------------------------------
    // Norm spread / null / raggedness gate over the q125 groups.
    "q267_vector_health" -> ((s, d) =>
      graft.operators.Profile.vectorHealth(
          t(s, d, "embeddings")
            .select(pmod(col("vec_id"), lit(4L)).as("grp"),
              col("embedding")),
          "grp", "embedding")
        .orderBy(col("grp"))),

    // --- deterministic MLM-style token masking -----------------------------
    // 15% position-keyed md5 coins over the documents corpus — the
    // reproducible augmentation pass.
    "q268_mask_tokens" -> ((s, d) =>
      graft.operators.Quality.maskTokens(
          t(s, d, "documents"), "doc_id", "text", rate = 0.15)
        .orderBy(col("doc_id"))),

    // --- Laplace-noised counts (DP release, testing mode) ------------------
    // ε = 0.5 noisy per-type event counts with the salt-deterministic
    // draw (the auditable mode; production swaps in fresh entropy).
    "q269_noisy_counts" -> ((s, d) =>
      graft.operators.Eval.laplaceNoisyCounts(
          ev(s, d), "event_type", epsilon = 0.5)
        .orderBy(col("event_type"))),

    // --- two-sample Poisson rate test --------------------------------------
    // Do purchases arrive faster than signups over the same 30-day
    // window?
    "q270_rate_test" -> ((s, d) =>
      graft.operators.Eval.poissonRateTest(
        ev(s, d), "event_type", "purchase", "signup",
        exposureA = 30.0, exposureB = 30.0)),

    // --- bucketed global ordinal (Ranks as a first-class operator) ---------
    // The de-funnel primitive every grid walk rides, oracled directly:
    // exact global row_number over orders WITHOUT a single-partition
    // exchange.
    "q271_global_ordinal" -> ((s, d) =>
      graft.operators.Ranks.globalRowNumber(
          t(s, d, "orders").select(col("o_orderkey")),
          "o_orderkey", "ord")
        .orderBy(col("o_orderkey"))),

    // --- exact weighted median ---------------------------------------------
    // Revenue-weighted median quantity per return flag: where does the
    // money-weighted middle of the order book sit?
    "q272_weighted_median" -> ((s, d) =>
      graft.operators.Features.weightedMedian(
          t(s, d, "lineitem"), "l_returnflag", "l_quantity",
          "l_extendedprice")
        .orderBy(col("l_returnflag"))),

    // --- entity-resolution clusters (end-to-end composition) ---------------
    // The full ER pipeline in one query: bounded Jaro-Winkler join
    // (char-prefix filter + length band, nation as a block key — no
    // within-block cartesian; threshold 0.9699 < 0.96995 keeps the
    // rounded-4 gate's candidates with zero false negatives) →
    // undirected match edges → connected components (q77's engine) →
    // every customer labeled with its entity id. Result identical to
    // the r9 all-pairs-within-nation shape; candidate count ~50×
    // lower at sf0.1 (BENCH_NOTES).
    "q273_er_clusters" -> ((s, d) => {
      val c = t(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_name"))
      val edges = graft.operators.JwJoin.jaroWinklerSelfJoin(
          c, "c_custkey", "c_name", threshold = 0.9699,
          blockCols = Seq("c_nationkey"))
        .filter(round(col("jw"), 4) >= 0.97)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      graft.operators.Graph.connectedComponents(edges, "src", "dst",
          nodes = Some((c, "c_custkey")))
        .select(col("id").as("c_custkey"),
          col("component").as("entity_id"))
        .orderBy(col("c_custkey"))
    }),
  )

  /** The q200 info-gain split-finder CTE chain, prefix-renamed so the
    * q246 oracle can instantiate it three times (root, le, gt) over
    * different row sources — text kept token-identical to the proven
    * q200 oracle so the double arithmetic matches the engine's. */
  private def igBlock(p: String, src: String): String =
    s"""${p}cell AS (SELECT v, y, count(*) AS c FROM $src GROUP BY 1, 2),
         ${p}dense AS (SELECT vv.v, yy.y, coalesce(c.c, 0) AS c
           FROM (SELECT DISTINCT v FROM ${p}cell) vv
           CROSS JOIN (SELECT DISTINCT y FROM ${p}cell) yy
           LEFT JOIN ${p}cell c ON c.v = vv.v AND c.y = yy.y),
         ${p}cum AS (SELECT v, y, c,
             sum(c) OVER (PARTITION BY y ORDER BY v) AS cum FROM ${p}dense),
         ${p}ctot AS (SELECT y, sum(c) AS cy FROM ${p}cell GROUP BY 1),
         ${p}n AS (SELECT sum(c) AS n FROM ${p}cell),
         ${p}lvl AS (SELECT v, sum(cum) AS nle,
             sum(CAST(CASE WHEN cum > 0
               THEN round(cum * ln(CAST(cum AS DOUBLE)), 9) ELSE 0 END
               AS DECIMAL(38,9))) AS sle,
             sum(CAST(CASE WHEN cy - cum > 0
               THEN round((cy - cum) * ln(CAST(cy - cum AS DOUBLE)), 9)
               ELSE 0 END AS DECIMAL(38,9))) AS sgt
           FROM ${p}cum JOIN ${p}ctot USING (y) GROUP BY v),
         ${p}sy AS (SELECT sum(CAST(round(cy * ln(CAST(cy AS DOUBLE)), 9)
             AS DECIMAL(38,9))) AS sy FROM ${p}ctot),
         ${p}ig AS (SELECT v AS threshold, nle,
             round(-((CAST(${p}sy.sy AS DOUBLE) - CAST(sle AS DOUBLE)
                 - CAST(sgt AS DOUBLE)) / ${p}n.n
               - (ln(CAST(${p}n.n AS DOUBLE))
                 - (nle / CAST(${p}n.n AS DOUBLE)) * ln(CAST(nle AS DOUBLE))
                 - ((${p}n.n - nle) / CAST(${p}n.n AS DOUBLE))
                   * ln(CAST(${p}n.n - nle AS DOUBLE)))), 6) AS info_gain,
             ${p}n.n AS n
           FROM ${p}lvl, ${p}n, ${p}sy WHERE nle < ${p}n.n),
         ${p}best AS (SELECT *, row_number() OVER (
             ORDER BY info_gain DESC, threshold ASC) AS rk FROM ${p}ig)"""

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

    // the q213 decomposition chain verbatim, then the q175 median/MAD
    // fence on its residual; undecomposed edge days carry a null flag
    "q245_seasonal_outliers" ->
      """WITH srs AS (SELECT o_orderdate AS k, CAST(count(*) AS DOUBLE) AS v
           FROM orders GROUP BY 1),
         t AS (SELECT k, v, row_number() OVER (ORDER BY k) AS pos,
             CASE WHEN count(*) OVER (ORDER BY k
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) = 7
               THEN CAST(sum(CAST(round(v, 9) AS DECIMAL(38,9)))
                 OVER (ORDER BY k ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                 AS DOUBLE) / 7 END AS trend
           FROM srs),
         ph AS (SELECT *, (pos - 1) % 7 AS phase FROM t),
         pm AS (SELECT phase,
             CAST(sum(CAST(round(v - trend, 9) AS DECIMAL(38,9)))
               AS DOUBLE) / count(*) AS raw
           FROM ph WHERE trend IS NOT NULL GROUP BY 1),
         off AS (SELECT CAST(sum(CAST(round(raw, 9) AS DECIMAL(38,9)))
             AS DOUBLE) / count(*) AS soff FROM pm),
         ce AS (SELECT phase, round(raw - soff, 9) AS seas FROM pm, off),
         decomp AS (SELECT ph.k AS day, round(ph.v, 6) AS value,
             round(CASE WHEN trend IS NOT NULL
               THEN ph.v - trend - seas END, 6) AS residual
           FROM ph LEFT JOIN ce USING (phase)),
         scored AS (SELECT * FROM decomp WHERE residual IS NOT NULL),
         med AS (SELECT quantile_cont(residual, 0.5) AS med FROM scored),
         mad AS (SELECT med, quantile_cont(abs(residual - med), 0.5) AS mad
           FROM scored, med GROUP BY med)
         SELECT day, value, residual,
           round(med, 4) AS med, round(mad, 4) AS mad,
           CASE WHEN residual IS NOT NULL THEN
             CAST(round(abs(residual - med), 9) > round(3.0 * mad, 9)
               AS INT) END AS is_outlier
         FROM decomp, mad ORDER BY day""",

    // three instantiations of the proven q200 split-finder block; the
    // children's row sources gate on the root winner's threshold via a
    // scalar subquery (the broadcast-threshold twin)
    "q246_decision_tree" -> {
      val base =
        """WITH r AS (SELECT CAST(l_quantity AS DOUBLE) AS v,
             l_returnflag AS y
           FROM lineitem
           WHERE l_quantity IS NOT NULL AND l_returnflag IS NOT NULL),
         """
      val children =
        """,
         rle AS (SELECT * FROM r
           WHERE v <= (SELECT threshold FROM rootbest WHERE rk = 1)),
         """ + igBlock("le", "rle") + """,
         rgt AS (SELECT * FROM r
           WHERE v > (SELECT threshold FROM rootbest WHERE rk = 1)),
         """ + igBlock("gt", "rgt")
      val finalSel =
        """
         SELECT 'root' AS node, threshold, CAST(nle AS BIGINT) AS n_le,
           CAST(n - nle AS BIGINT) AS n_gt, info_gain
         FROM rootbest WHERE rk = 1
         UNION ALL
         SELECT 'le' AS node, threshold, CAST(nle AS BIGINT) AS n_le,
           CAST(n - nle AS BIGINT) AS n_gt, info_gain
         FROM lebest WHERE rk = 1
         UNION ALL
         SELECT 'gt' AS node, threshold, CAST(nle AS BIGINT) AS n_le,
           CAST(n - nle AS BIGINT) AS n_gt, info_gain
         FROM gtbest WHERE rk = 1
         ORDER BY node"""
      base + igBlock("root", "r") + children + finalSel
    },

    // greedy left-to-right merge application as five sequential
    // list_reduce folds (list-state — the q215 lambda finding), same
    // whitespace/lower tokenization as q36; docs with no tokens keep a
    // 0 row through the left join
    "q247_bpe_encode" -> {
      val merges = Seq(("t", "h", "th"), ("th", "e", "the"),
        ("i", "n", "in"), ("a", "n", "an"), ("e", "r", "er"))
      val folds = merges.zipWithIndex.map { case ((l, r, m), i) =>
        s"""sym${i + 1} AS (SELECT doc_id, list_reduce(
             list_transform(sym, x -> [x]),
             (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = '$l'
                 AND x[1] = '$r'
               THEN list_append(list_slice(acc, 1, len(acc) - 1), '$m')
               ELSE list_append(acc, x[1]) END) AS sym
           FROM sym$i)"""
      }.mkString(",\n         ")
      s"""WITH toks AS (SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(lower(text)),
               '\\s+'), x -> x <> '')) AS w
           FROM documents),
         sym0 AS (SELECT doc_id,
             list_filter(string_split(w, ''), x -> x <> '') AS sym
           FROM toks),
         $folds,
         agg AS (SELECT doc_id, CAST(sum(len(sym)) AS INT) AS n_tokens,
             CAST(sum(len(list_filter(sym, s -> s = 'the'))) AS INT)
               AS n_the
           FROM sym${merges.size} GROUP BY 1)
         SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
           coalesce(a.n_the, 0) AS n_the
         FROM documents d LEFT JOIN agg a USING (doc_id)
         ORDER BY doc_id"""
    },

    // q227's unrolled-GD recursion with the sigmoid swapped for the
    // pinball indicator; the margin rounds to the 9-grid BEFORE the
    // y <= margin comparison on both engines
    "q248_quantile_gd" ->
      """WITH data AS (SELECT
             CAST(l_extendedprice AS DOUBLE) / 60000.0 AS y,
             CAST(l_quantity AS DOUBLE) / 50.0 AS x1,
             CAST(l_discount AS DOUBLE) * 10.0 AS x2
           FROM lineitem
           WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
             AND l_discount IS NOT NULL),
         g1 AS (SELECT
             sum(CAST(round(0.5 - CASE WHEN y <= round(0.0 + x1*0.0 + x2*0.0, 9) THEN 1.0 ELSE 0.0 END, 9) AS DECIMAL(38,9))) AS g0,
             sum(CAST(round((0.5 - CASE WHEN y <= round(0.0 + x1*0.0 + x2*0.0, 9) THEN 1.0 ELSE 0.0 END)*x1, 9) AS DECIMAL(38,9))) AS gx1,
             sum(CAST(round((0.5 - CASE WHEN y <= round(0.0 + x1*0.0 + x2*0.0, 9) THEN 1.0 ELSE 0.0 END)*x2, 9) AS DECIMAL(38,9))) AS gx2,
             count(*) AS n
           FROM data),
         w1 AS (SELECT round(0.0 + 0.5*(CAST(g0 AS DOUBLE)/n),9) AS a,
             round(0.0 + 0.5*(CAST(gx1 AS DOUBLE)/n),9) AS b,
             round(0.0 + 0.5*(CAST(gx2 AS DOUBLE)/n),9) AS c FROM g1),
         g2 AS (SELECT
             sum(CAST(round(0.5 - CASE WHEN y <= round(a + x1*b + x2*c, 9) THEN 1.0 ELSE 0.0 END, 9) AS DECIMAL(38,9))) AS g0,
             sum(CAST(round((0.5 - CASE WHEN y <= round(a + x1*b + x2*c, 9) THEN 1.0 ELSE 0.0 END)*x1, 9) AS DECIMAL(38,9))) AS gx1,
             sum(CAST(round((0.5 - CASE WHEN y <= round(a + x1*b + x2*c, 9) THEN 1.0 ELSE 0.0 END)*x2, 9) AS DECIMAL(38,9))) AS gx2,
             count(*) AS n
           FROM data, w1),
         w2 AS (SELECT round(a + 0.5*(CAST(g0 AS DOUBLE)/n),9) AS a,
             round(b + 0.5*(CAST(gx1 AS DOUBLE)/n),9) AS b,
             round(c + 0.5*(CAST(gx2 AS DOUBLE)/n),9) AS c
           FROM g2, w1),
         g3 AS (SELECT
             sum(CAST(round(0.5 - CASE WHEN y <= round(a + x1*b + x2*c, 9) THEN 1.0 ELSE 0.0 END, 9) AS DECIMAL(38,9))) AS g0,
             sum(CAST(round((0.5 - CASE WHEN y <= round(a + x1*b + x2*c, 9) THEN 1.0 ELSE 0.0 END)*x1, 9) AS DECIMAL(38,9))) AS gx1,
             sum(CAST(round((0.5 - CASE WHEN y <= round(a + x1*b + x2*c, 9) THEN 1.0 ELSE 0.0 END)*x2, 9) AS DECIMAL(38,9))) AS gx2,
             count(*) AS n
           FROM data, w2),
         w3 AS (SELECT round(a + 0.5*(CAST(g0 AS DOUBLE)/n),9) AS a,
             round(b + 0.5*(CAST(gx1 AS DOUBLE)/n),9) AS b,
             round(c + 0.5*(CAST(gx2 AS DOUBLE)/n),9) AS c
           FROM g3, w2)
         SELECT term, weight FROM (
           SELECT 'intercept' AS term, a AS weight FROM w3
           UNION ALL SELECT 'x1', b FROM w3
           UNION ALL SELECT 'x2', c FROM w3)
         ORDER BY term""",

    // the identical md5-mod-width bucket arithmetic rebuilds the same
    // sketch cell-for-cell; absent cells are true zeros via the left
    // join
    "q249_cms_estimate" ->
      """WITH rows AS (SELECT event_type AS g, user_id,
             CAST(user_id AS VARCHAR) AS it
           FROM events WHERE user_id IS NOT NULL),
         h AS (SELECT g, it, t.j AS j,
             (('0x' || substr(md5('cms' || CAST(t.j AS VARCHAR) || '|' || it),
               1, 13))::BIGINT % 64) AS b
           FROM rows, range(0, 4) t(j)),
         sk AS (SELECT g, j, b, count(*) AS n FROM h GROUP BY 1, 2, 3),
         items AS (SELECT DISTINCT g, user_id, it FROM rows
           WHERE user_id % 10 = 0),
         ph AS (SELECT g, user_id, it, t.j AS j,
             (('0x' || substr(md5('cms' || CAST(t.j AS VARCHAR) || '|' || it),
               1, 13))::BIGINT % 64) AS b
           FROM items, range(0, 4) t(j)),
         est AS (SELECT ph.g, ph.user_id,
             CAST(min(coalesce(sk.n, 0)) AS BIGINT) AS estimate
           FROM ph LEFT JOIN sk ON sk.g = ph.g AND sk.j = ph.j
             AND sk.b = ph.b
           GROUP BY 1, 2),
         ex AS (SELECT g, user_id, count(*) AS exact_n
           FROM rows GROUP BY 1, 2)
         SELECT est.g AS event_type, est.user_id AS user_id, estimate, exact_n
         FROM est JOIN ex ON est.g = ex.g AND est.user_id = ex.user_id
         ORDER BY est.g, est.user_id""",

    // the q103 argmin assignment, then per-(cluster, parity, dim)
    // 9-grid DECIMAL means and one sqrt over the summed squared gaps
    "q250_centroid_drift" ->
      """WITH c AS (
           SELECT CAST(vec_id + 1 AS BIGINT) AS cluster_id,
             embedding AS centroid
           FROM embeddings WHERE vec_id < 8),
         d AS (
           SELECT e.vec_id, c.cluster_id,
             sum((CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) - CAST(c.centroid[CAST(i AS INT)] AS DOUBLE))
               * (CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) - CAST(c.centroid[CAST(i AS INT)] AS DOUBLE))) AS d2
           FROM embeddings e, c, generate_series(1, 64) AS g(i)
           GROUP BY e.vec_id, c.cluster_id),
         best AS (
           SELECT vec_id, cluster_id,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY d2 ASC, cluster_id ASC) AS rn
           FROM d),
         rows AS (
           SELECT b.cluster_id, e.vec_id % 2 AS ep, e.embedding
           FROM embeddings e JOIN best b ON e.vec_id = b.vec_id
           WHERE b.rn = 1 AND e.embedding IS NOT NULL),
         counts AS (SELECT cluster_id,
             sum(CASE WHEN ep = 0 THEN 1 ELSE 0 END) AS n_a,
             sum(CASE WHEN ep <> 0 THEN 1 ELSE 0 END) AS n_b
           FROM rows GROUP BY 1),
         dm AS (SELECT cluster_id, ep, i,
             round(CAST(sum(CAST(round(CAST(embedding[CAST(i AS INT)] AS DOUBLE), 9)
               AS DECIMAL(28,9))) AS DOUBLE) / count(*), 9) AS m
           FROM rows, generate_series(1, 64) AS g(i)
           GROUP BY 1, 2, 3),
         dr AS (SELECT a.cluster_id,
             round(sqrt(CAST(sum(CAST(round((a.m - b.m) * (a.m - b.m), 9)
               AS DECIMAL(38,9))) AS DOUBLE)), 6) AS drift
           FROM dm a JOIN dm b ON a.cluster_id = b.cluster_id
             AND a.i = b.i AND a.ep = 0 AND b.ep = 1
           GROUP BY 1)
         SELECT co.cluster_id, CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b, drift
         FROM counts co LEFT JOIN dr USING (cluster_id)
         ORDER BY cluster_id""",

    // u = (2·cum − c)/(2n) — exact integers until the single round
    "q251_quantile_transform" ->
      """WITH lvl AS (SELECT l_returnflag AS g,
             CAST(l_quantity AS DOUBLE) AS v, count(*) AS c
           FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2),
         tot AS (SELECT g, sum(c) AS n FROM lvl GROUP BY 1),
         w AS (SELECT g, v, c,
             sum(c) OVER (PARTITION BY g ORDER BY v) AS cum FROM lvl)
         SELECT w.g AS l_returnflag, v AS value,
           CAST(c AS BIGINT) AS n_at_value,
           round(CAST(2 * cum - c AS DOUBLE) / (2 * n), 6) AS u
         FROM w JOIN tot USING (g) ORDER BY l_returnflag, value""",

    // same keyed-position self-join construction; products 9-grid
    // rounded into DECIMAL(38,9), one division per (key, lag)
    "q252_acf" ->
      """WITH srs AS (SELECT event_type AS g, CAST(ts AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS v
           FROM events GROUP BY 1, 2),
         pos AS (SELECT g, v,
             row_number() OVER (PARTITION BY g ORDER BY day) AS p
           FROM srs),
         mu AS (SELECT g, round(CAST(sum(CAST(round(v, 9)
             AS DECIMAL(38,9))) AS DOUBLE) / count(*), 9) AS mu
           FROM pos GROUP BY 1),
         cen AS (SELECT pos.g, p, v - mu AS e FROM pos JOIN mu USING (g)),
         den AS (SELECT g, sum(CAST(round(e * e, 9) AS DECIMAL(38,9))) AS d
           FROM cen GROUP BY 1),
         pairs AS (SELECT a.g, t.lg, a.e AS e, b.e AS ep
           FROM cen a CROSS JOIN range(1, 8) t(lg)
           JOIN cen b ON b.g = a.g AND b.p = a.p - t.lg),
         num AS (SELECT g, lg, count(*) AS n_terms,
             sum(CAST(round(e * ep, 9) AS DECIMAL(38,9))) AS num
           FROM pairs GROUP BY 1, 2)
         SELECT num.g AS event_type, CAST(lg AS INT) AS lag,
           n_terms,
           round(CASE WHEN d <> 0 THEN
             CAST(num AS DOUBLE) / CAST(d AS DOUBLE) END, 6) AS r
         FROM num JOIN den USING (g) ORDER BY event_type, lag""",

    // floor-to-minute lag grid + the exact ceil-rank order statistics;
    // both engines floor epoch seconds before differencing
    "q253_conversion_lag" ->
      """WITH rows AS (SELECT user_id AS u, event_type AS ty,
             CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE ts IS NOT NULL
             AND event_type IN ('signup', 'purchase')),
         ff AS (SELECT u, min(ts) AS f FROM rows
           WHERE ty = 'signup' GROUP BY 1),
         cu AS (SELECT r.u, ff.f, min(r.ts) AS t
           FROM rows r JOIN ff ON r.u = ff.u
           WHERE r.ty = 'purchase' AND r.ts >= ff.f
           GROUP BY r.u, ff.f),
         lags AS (SELECT u, CAST(floor(
             (CAST(floor(epoch(t)) AS BIGINT)
               - CAST(floor(epoch(f)) AS BIGINT)) / 60) AS BIGINT) AS lg
           FROM cu),
         started AS (SELECT count(*) AS n_started FROM ff),
         lvl AS (SELECT lg, count(*) AS c FROM lags GROUP BY 1),
         conv AS (SELECT coalesce(sum(c), 0) AS n_converted,
             min(lg) AS min_lag, max(lg) AS max_lag FROM lvl),
         w AS (SELECT lg, c, sum(c) OVER (ORDER BY lg) AS cum FROM lvl),
         p50 AS (SELECT lg AS p50_lag FROM w, conv
           WHERE cum >= ceil(CAST(n_converted AS DOUBLE)
               * CAST(0.5 AS DOUBLE))
             AND cum - c < ceil(CAST(n_converted AS DOUBLE)
               * CAST(0.5 AS DOUBLE))),
         p90 AS (SELECT lg AS p90_lag FROM w, conv
           WHERE cum >= ceil(CAST(n_converted AS DOUBLE)
               * CAST(0.9 AS DOUBLE))
             AND cum - c < ceil(CAST(n_converted AS DOUBLE)
               * CAST(0.9 AS DOUBLE)))
         SELECT CAST(n_started AS BIGINT) AS n_started,
           CAST(n_converted AS BIGINT) AS n_converted,
           min_lag, p50_lag, p90_lag, max_lag
         FROM started, conv
         LEFT JOIN p50 ON true LEFT JOIN p90 ON true""",

    // same sweep: running max end over the strict prefix, opening flag,
    // running opening count as group id — order among exact duplicates
    // is arbitrary but the sweep is invariant to it
    "q254_interval_merge" ->
      """WITH iv AS (SELECT user_id AS k, CAST(ts AS TIMESTAMP) AS s,
             CAST(ts AS TIMESTAMP) + INTERVAL 30 MINUTE AS e
           FROM events WHERE ts IS NOT NULL),
         pm AS (SELECT k, s, e, max(e) OVER (PARTITION BY k
             ORDER BY s, e
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
           FROM iv),
         fl AS (SELECT k, s, e,
             CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS nw
           FROM pm),
         gr AS (SELECT k, s, e, sum(nw) OVER (PARTITION BY k
             ORDER BY s, e
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
           FROM fl)
         SELECT k AS user_id, min(s) AS start, max(e) AS "end",
           CAST(count(*) AS BIGINT) AS n_merged
         FROM gr GROUP BY k, g ORDER BY user_id, start""",

    // exact brute force over the query sample (the q228 full-probe
    // adjudication); self excluded, 4-grid sim rounding BEFORE ranking
    "q255_knn_outlier" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
           FROM embeddings WHERE vec_id % 5 = 0),
         sims AS (
           SELECT q.query_id, e.vec_id,
             round(sum(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(q.qe[CAST(i AS INT)] AS DOUBLE))
               / (sqrt(sum(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)))
                  * sqrt(sum(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) * CAST(q.qe[CAST(i AS INT)] AS DOUBLE)))), 4) AS cosine_sim
           FROM embeddings e, q, generate_series(1, 64) AS g(i)
           WHERE e.vec_id <> q.query_id
           GROUP BY q.query_id, e.vec_id),
         ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY cosine_sim DESC, vec_id) AS rk FROM sims)
         SELECT query_id AS vec_id,
           round(1.0 - cosine_sim, 4) AS outlier_score
         FROM ranked WHERE rk = 5
         ORDER BY outlier_score DESC, vec_id LIMIT 20""",

    // the q206 count/term chain carrying the item through, ranked by
    // contribution — lower-cased tokenization (the engine's whitespace
    // contract)
    "q256_drift_terms" ->
      """WITH ta AS (SELECT unnest(list_filter(
             string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS i
           FROM documents WHERE doc_id % 2 = 0),
         tb AS (SELECT unnest(list_filter(
             string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS i
           FROM documents WHERE doc_id % 2 = 1),
         ca AS (SELECT i, count(*) AS ca FROM ta GROUP BY 1),
         cb AS (SELECT i, count(*) AS cb FROM tb GROUP BY 1),
         j AS (SELECT coalesce(ca.i, cb.i) AS i, coalesce(ca, 0) AS ca,
             coalesce(cb, 0) AS cb
           FROM ca FULL JOIN cb ON ca.i = cb.i),
         t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM j),
         f AS (SELECT i, ca, cb, ca / CAST(na AS DOUBLE) AS p,
             cb / CAST(nb AS DOUBLE) AS q FROM j, t),
         terms AS (SELECT i, ca, cb, round(
             (CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2.0)) * 0.5
               ELSE 0.0 END) +
             (CASE WHEN q > 0 THEN q * ln(q / ((p + q) / 2.0)) * 0.5
               ELSE 0.0 END), 9) AS term FROM f)
         SELECT i AS token, CAST(ca AS BIGINT) AS n_a,
           CAST(cb AS BIGINT) AS n_b, term
         FROM terms ORDER BY term DESC, token ASC LIMIT 20""",

    // same floor-epoch seconds, same (t, v) tie-break pinning which
    // same-second value holds the zero-duration slot
    "q257_twap" ->
      """WITH rows AS (SELECT event_type AS k,
             CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS t,
             CAST(value AS DOUBLE) AS v
           FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
         led AS (SELECT k, t, v,
             lead(t) OVER (PARTITION BY k ORDER BY t, v) AS nt
           FROM rows),
         agg AS (SELECT k, count(*) AS n,
             max(t) - min(t) AS span_sec,
             sum(CASE WHEN nt IS NOT NULL THEN
               CAST(round(v * (nt - t), 9) AS DECIMAL(38,9)) END) AS num
           FROM led GROUP BY 1)
         SELECT k AS event_type, n, span_sec,
           round(CASE WHEN span_sec > 0 THEN
             CAST(num AS DOUBLE) / span_sec END, 6) AS twa
         FROM agg ORDER BY event_type""",

    // integer ceil-ranks (n·k + 9) // 10, cumulative count AND 9-grid
    // DECIMAL value sums on the level grid, exact partial share at a
    // tie-cut
    "q258_lorenz" ->
      """WITH r AS (SELECT o_orderpriority AS g,
             round(CAST(o_totalprice AS DOUBLE), 9) AS v
           FROM orders WHERE o_totalprice IS NOT NULL),
         lvl AS (SELECT g, v, count(*) AS c,
             sum(CAST(round(v, 9) AS DECIMAL(38,9))) AS w
           FROM r GROUP BY 1, 2),
         tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS n, sum(w) AS tw
           FROM lvl GROUP BY 1),
         wk AS (SELECT g, v, c,
             sum(c) OVER (PARTITION BY g ORDER BY v) AS cum,
             sum(w) OVER (PARTITION BY g ORDER BY v) AS cumw
           FROM lvl),
         grid AS (SELECT wk.g, v, c, cum, cumw, n, tw, d.d AS d,
             (n * d.d + 9) // 10 AS rnk
           FROM wk JOIN tot USING (g) CROSS JOIN range(1, 11) d(d))
         SELECT g AS o_orderpriority, CAST(d AS INT) AS decile,
           CAST(rnk AS BIGINT) AS rank,
           round(CAST(d AS DOUBLE) / 10, 6) AS pop_frac,
           round(CASE WHEN CAST(tw AS DOUBLE) <> 0 THEN
             (CAST(cumw AS DOUBLE) - CAST(cum - rnk AS DOUBLE) * v)
               / CAST(tw AS DOUBLE) END, 6) AS value_share
         FROM grid WHERE cum >= rnk AND cum - c < rnk
         ORDER BY o_orderpriority, decile""",

    // per-column grouped deciles + the q196 epsilon-floored terms,
    // folded to one PSI per column
    "q259_psi_sweep" ->
      """WITH ref0 AS (SELECT * FROM orders
           WHERE o_orderdate < DATE '1996-01-01'),
         cur0 AS (SELECT * FROM orders
           WHERE o_orderdate >= DATE '1996-01-01'),
         refs AS (
           SELECT 'o_custkey' AS c, CAST(o_custkey AS DOUBLE) AS v
           FROM ref0 WHERE o_custkey IS NOT NULL
           UNION ALL
           SELECT 'o_orderkey', CAST(o_orderkey AS DOUBLE)
           FROM ref0 WHERE o_orderkey IS NOT NULL
           UNION ALL
           SELECT 'o_totalprice', CAST(o_totalprice AS DOUBLE)
           FROM ref0 WHERE o_totalprice IS NOT NULL),
         curs AS (
           SELECT 'o_custkey' AS c, CAST(o_custkey AS DOUBLE) AS v
           FROM cur0 WHERE o_custkey IS NOT NULL
           UNION ALL
           SELECT 'o_orderkey', CAST(o_orderkey AS DOUBLE)
           FROM cur0 WHERE o_orderkey IS NOT NULL
           UNION ALL
           SELECT 'o_totalprice', CAST(o_totalprice AS DOUBLE)
           FROM cur0 WHERE o_totalprice IS NOT NULL),
         b AS (SELECT c, quantile_cont(v, [0.1, 0.2, 0.3, 0.4, 0.5,
             0.6, 0.7, 0.8, 0.9]) AS bounds FROM refs GROUP BY 1),
         rb AS (SELECT refs.c, 1 + len(list_filter(bounds, x -> v > x))
               AS bin, count(*) AS rn
           FROM refs JOIN b USING (c) GROUP BY 1, 2),
         cb AS (SELECT curs.c, 1 + len(list_filter(bounds, x -> v > x))
               AS bin, count(*) AS cn
           FROM curs JOIN b USING (c) GROUP BY 1, 2),
         j AS (SELECT coalesce(rb.c, cb.c) AS c,
             coalesce(rb.bin, cb.bin) AS bin,
             coalesce(rn, 0) AS rn, coalesce(cn, 0) AS cn
           FROM rb FULL JOIN cb ON rb.c = cb.c AND rb.bin = cb.bin),
         t AS (SELECT c, sum(rn) AS rt, sum(cn) AS ct FROM j GROUP BY 1),
         f AS (SELECT j.c, rn, cn,
             greatest(rn / CAST(rt AS DOUBLE), 1e-6) AS p,
             greatest(cn / CAST(ct AS DOUBLE), 1e-6) AS q
           FROM j JOIN t ON j.c = t.c)
         SELECT c AS "column", CAST(sum(rn) AS BIGINT) AS ref_n,
           CAST(sum(cn) AS BIGINT) AS cur_n,
           round(CAST(sum(CAST(round((q - p) * ln(q / p), 9)
             AS DECIMAL(38,9))) AS DOUBLE), 6) AS psi
         FROM f GROUP BY c ORDER BY c""",

    // same content-hash clustering as q37; null text is its own level
    "q261_dedup_report" ->
      """WITH corpus AS (
           SELECT text FROM documents
           UNION ALL SELECT text FROM documents WHERE doc_id < 50),
         cl AS (SELECT sha256(text) AS h, count(*) AS sz
           FROM corpus GROUP BY 1)
         SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(sz) AS BIGINT) AS n_docs
         FROM cl GROUP BY 1 ORDER BY 1""",

    // fixed reference deciles, dense periods × bins frame (absent bins
    // are real ε-floored zeros), one 9-grid DECIMAL fold per period
    "q262_psi_timeline" ->
      """WITH ref AS (SELECT o_totalprice AS v FROM orders
           WHERE o_orderdate < DATE '1996-01-01'
             AND o_totalprice IS NOT NULL),
         curr AS (SELECT year(o_orderdate) AS p, o_totalprice AS v
           FROM orders WHERE o_orderdate >= DATE '1996-01-01'
             AND o_totalprice IS NOT NULL),
         b AS (SELECT quantile_cont(v, [0.1, 0.2, 0.3, 0.4, 0.5,
             0.6, 0.7, 0.8, 0.9]) AS bounds FROM ref),
         rb AS (SELECT 1 + len(list_filter(bounds, x -> v > x)) AS bin,
             count(*) AS rn FROM ref, b GROUP BY 1),
         cb AS (SELECT p, 1 + len(list_filter(bounds, x -> v > x)) AS bin,
             count(*) AS cn FROM curr, b GROUP BY 1, 2),
         dense AS (SELECT pp.p AS p, t.bin AS bin,
             coalesce(rn, 0) AS rn, coalesce(cn, 0) AS cn
           FROM (SELECT DISTINCT p FROM cb) pp
           CROSS JOIN range(1, 11) t(bin)
           LEFT JOIN rb ON rb.bin = t.bin
           LEFT JOIN cb ON cb.p = pp.p AND cb.bin = t.bin),
         tt AS (SELECT p, sum(rn) AS rt, sum(cn) AS ct
           FROM dense GROUP BY 1),
         f AS (SELECT dense.p, rn, cn,
             greatest(rn / CAST(rt AS DOUBLE), 1e-6) AS pr,
             greatest(cn / CAST(ct AS DOUBLE), 1e-6) AS q
           FROM dense JOIN tt ON dense.p = tt.p)
         SELECT CAST(p AS INT) AS yr, CAST(sum(rn) AS BIGINT) AS ref_n,
           CAST(sum(cn) AS BIGINT) AS cur_n,
           round(CAST(sum(CAST(round((q - pr) * ln(q / pr), 9)
             AS DECIMAL(38,9))) AS DOUBLE), 6) AS psi
         FROM f GROUP BY p ORDER BY yr""",

    // three instantiations of the proven q212 CUSUM block; child
    // sources gate on the root peak via scalar subqueries
    "q263_changepoints2" -> {
      val base =
        """WITH srs AS (SELECT o_orderdate AS k, CAST(count(*) AS DOUBLE) AS v
           FROM orders GROUP BY 1),
         """
      val le =
        """,
         lsrc AS (SELECT * FROM srs
           WHERE k <= (SELECT k FROM rootb WHERE rk = 1)),
         """ + cpBlock("le", "lsrc")
      val gt =
        """,
         gsrc AS (SELECT * FROM srs
           WHERE k > (SELECT k FROM rootb WHERE rk = 1)),
         """ + cpBlock("gt", "gsrc")
      val finalSel =
        """
         SELECT 'root' AS segment, k AS change_at,
           round(abs(CAST(cusum AS DOUBLE)), 6) AS max_abs_cusum,
           round(mean, 6) AS mean, n
         FROM rootb WHERE rk = 1
         UNION ALL
         SELECT 'le' AS segment, k AS change_at,
           round(abs(CAST(cusum AS DOUBLE)), 6) AS max_abs_cusum,
           round(mean, 6) AS mean, n
         FROM leb WHERE rk = 1
         UNION ALL
         SELECT 'gt' AS segment, k AS change_at,
           round(abs(CAST(cusum AS DOUBLE)), 6) AS max_abs_cusum,
           round(mean, 6) AS mean, n
         FROM gtb WHERE rk = 1
         ORDER BY segment"""
      base + cpBlock("root", "srs") + le + gt + finalSel
    },

    // same keyed lag/lead neighbor test; prominence compares on the
    // 9-grid
    "q264_peaks" ->
      """WITH srs AS (SELECT event_type AS g, CAST(ts AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS v
           FROM events GROUP BY 1, 2),
         n AS (SELECT g, day, v,
             lag(v) OVER (PARTITION BY g ORDER BY day) AS pv,
             lead(v) OVER (PARTITION BY g ORDER BY day) AS nv
           FROM srs),
         pk AS (SELECT g, day, v,
             round(least(v - pv, v - nv), 9) AS prom
           FROM n WHERE pv IS NOT NULL AND nv IS NOT NULL
             AND v > pv AND v > nv)
         SELECT g AS event_type, day, round(v, 6) AS value,
           round(prom, 6) AS prominence
         FROM pk WHERE prom >= round(CAST(3.0 AS DOUBLE), 9)
         ORDER BY event_type, day""",

    // integer week indexing from the fixed epoch (no locale weeks),
    // 9-grid DECIMAL revenue sums, keyed cumulative over ages
    "q265_cohort_ltv" ->
      """WITH rows AS (SELECT user_id AS u,
             CAST(floor(datediff('day', DATE '2024-01-01',
               CAST(ts AS DATE)) / 7) AS BIGINT) AS w,
             coalesce(CAST(value AS DOUBLE), 0.0) AS v
           FROM events WHERE ts IS NOT NULL),
         co AS (SELECT u, min(w) AS cw FROM rows GROUP BY 1),
         sizes AS (SELECT cw, count(*) AS n_users FROM co GROUP BY 1),
         cells AS (SELECT co.cw, r.w - co.cw AS age,
             sum(CAST(round(v, 9) AS DECIMAL(38,9))) AS rev
           FROM rows r JOIN co ON r.u = co.u GROUP BY 1, 2),
         wk AS (SELECT cw, age, rev,
             sum(rev) OVER (PARTITION BY cw ORDER BY age) AS cum
           FROM cells)
         SELECT CAST(cw AS INT) AS cohort_week, CAST(age AS INT) AS age_weeks,
           CAST(n_users AS BIGINT) AS n_users,
           round(CAST(rev AS DOUBLE), 6) AS revenue,
           round(CAST(cum AS DOUBLE) / CAST(n_users AS DOUBLE), 6)
             AS cum_ltv
         FROM wk JOIN sizes USING (cw) ORDER BY cohort_week, age_weeks""",

    // exact integer pair accounting in DECIMAL(38,0), RENDERED as
    // strings (exact past 2^63; raw DECIMAL outputs are banned — the
    // q174/q266 type-sensitive-hash rule); per-term b(b-1) is even so
    // the /2 is exact on both engines
    "q266_blocking_report" ->
      """WITH b AS (SELECT c_nationkey, c_mktsegment, count(*) AS nb
           FROM customer GROUP BY 1, 2)
         SELECT CAST(sum(nb) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(max(nb) AS BIGINT) AS max_block,
           CAST(CAST(sum(CAST(nb AS DECIMAL(38,0))
             * CAST(nb - 1 AS DECIMAL(38,0)) / 2) AS DECIMAL(38,0))
             AS VARCHAR) AS candidate_pairs,
           CAST(CAST(CAST(sum(nb) AS DECIMAL(38,0))
             * CAST(sum(nb) - 1 AS DECIMAL(38,0)) / 2 AS DECIMAL(38,0))
             AS VARCHAR) AS all_pairs,
           CASE WHEN sum(nb) > 1 THEN
             round(1.0 - CAST(sum(CAST(nb AS DECIMAL(38,0))
                 * CAST(nb - 1 AS DECIMAL(38,0)) / 2) AS DOUBLE)
               / CAST(CAST(sum(nb) AS DECIMAL(38,0))
                 * CAST(sum(nb) - 1 AS DECIMAL(38,0)) / 2 AS DOUBLE), 6)
           END AS reduction_ratio
         FROM b""",

    // the same left-folded square sum (0.0 + x² prefix ≡ plain fold),
    // exists/isnan gate, exact interpolated median of norms
    "q267_vector_health" ->
      """WITH e AS (SELECT vec_id % 4 AS g, embedding FROM embeddings),
         r AS (SELECT g, embedding,
             CASE WHEN embedding IS NOT NULL
               THEN CAST(len(embedding) AS INT) END AS dim,
             CASE WHEN embedding IS NOT NULL THEN
               len(list_filter(embedding, x -> isnan(CAST(x AS DOUBLE))
                 OR abs(CAST(x AS DOUBLE)) = CAST('Infinity' AS DOUBLE)))
                 > 0 END AS bad,
             CASE WHEN embedding IS NOT NULL AND NOT
               (len(list_filter(embedding, x -> isnan(CAST(x AS DOUBLE))
                 OR abs(CAST(x AS DOUBLE)) = CAST('Infinity' AS DOUBLE)))
                 > 0)
               THEN sqrt(list_reduce(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                 (a, x) -> a + x)) END AS norm
           FROM e)
         SELECT g AS grp, CAST(count(*) AS BIGINT) AS n,
           CAST(count(CASE WHEN embedding IS NULL THEN 1 END) AS BIGINT)
             AS n_null,
           CAST(count(DISTINCT dim) AS BIGINT) AS n_dims,
           CAST(min(dim) AS INT) AS dim,
           CAST(count(CASE WHEN bad THEN 1 END) AS BIGINT) AS n_nonfinite,
           CAST(count(CASE WHEN norm = 0.0 THEN 1 END) AS BIGINT)
             AS n_zero,
           round(min(norm), 6) AS norm_min,
           round(quantile_cont(norm, 0.5), 6) AS norm_med,
           round(max(norm), 6) AS norm_max
         FROM r GROUP BY g ORDER BY grp""",

    // the same (salt, doc, 0-based position) md5 coin per token; the
    // oracle re-aggregates per-token rows in position order where the
    // engine stays a per-row HOF chain
    "q268_mask_tokens" ->
      """WITH tok AS (SELECT doc_id, list_filter(
             string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')
             AS tk
           FROM documents),
         pos AS (SELECT doc_id, unnest(tk) AS tok,
             CAST(generate_subscripts(tk, 1) - 1 AS BIGINT) AS i
           FROM tok),
         m AS (SELECT doc_id, i, tok,
             (('0x' || substr(md5('msk' || CAST(doc_id AS VARCHAR)
               || '#' || CAST(i AS VARCHAR)), 1, 13))::BIGINT + 1)
               / 4503599627370496.0 < CAST(0.15 AS DOUBLE) AS mk
           FROM pos),
         agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(count(CASE WHEN mk THEN 1 END) AS BIGINT) AS n_masked,
             string_agg(CASE WHEN mk THEN '[MASK]' ELSE tok END,
               ' ' ORDER BY i) AS masked_text
           FROM m GROUP BY 1)
         SELECT d.doc_id, coalesce(n_tokens, 0) AS n_tokens,
           coalesce(n_masked, 0) AS n_masked,
           coalesce(masked_text, '') AS masked_text
         FROM documents d LEFT JOIN agg USING (doc_id)
         ORDER BY doc_id""",

    // the exact inverse-CDF Laplace transform from the same md5
    // uniform; 1/epsilon = 2.0 pinned as a double literal
    "q269_noisy_counts" ->
      """WITH c AS (SELECT event_type AS g, count(*) AS n
           FROM events GROUP BY 1),
         u AS (SELECT g, n,
             (('0x' || substr(md5('dp' || g), 1, 13))::BIGINT + 1)
               / 4503599627370496.0 AS u
           FROM c)
         SELECT g AS event_type, CAST(n AS BIGINT) AS n,
           round(round(-CAST(2.0 AS DOUBLE) * sign(u - 0.5)
             * ln(1.0 - 2.0 * abs(u - 0.5)), 9), 6) AS noise,
           round(n + round(-CAST(2.0 AS DOUBLE) * sign(u - 0.5)
             * ln(1.0 - 2.0 * abs(u - 0.5)), 9), 6) AS noisy_n
         FROM u ORDER BY event_type""",

    // conditioned Wald z on the log rate ratio; equal 30-day exposures
    "q270_rate_test" ->
      """WITH c AS (SELECT
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS ka,
             sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
               AS kb
           FROM events WHERE event_type IN ('purchase', 'signup'))
         SELECT CAST(ka AS BIGINT) AS k_a, CAST(kb AS BIGINT) AS k_b,
           round(ka / CAST(30.0 AS DOUBLE), 6) AS rate_a,
           round(kb / CAST(30.0 AS DOUBLE), 6) AS rate_b,
           round(CASE WHEN ka > 0 AND kb > 0 THEN
             (ka * CAST(30.0 AS DOUBLE)) / (kb * CAST(30.0 AS DOUBLE))
             END, 6) AS rate_ratio,
           round(CASE WHEN ka > 0 AND kb > 0 THEN
             ln((ka * CAST(30.0 AS DOUBLE)) / (kb * CAST(30.0 AS DOUBLE)))
               / sqrt(CAST(1.0 AS DOUBLE) / ka + CAST(1.0 AS DOUBLE) / kb)
             END, 6) AS z
         FROM c""",

    // the plain global row_number the bucketed form must equal exactly
    "q271_global_ordinal" ->
      """SELECT o_orderkey,
           CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS ord
         FROM orders ORDER BY o_orderkey""",

    // 2*cum >= tot comparisons on exact DECIMAL sums (no half-total
    // division), weights collapsed per value level first
    "q272_weighted_median" ->
      """WITH r AS (SELECT l_returnflag AS g,
             CAST(l_quantity AS DOUBLE) AS v,
             CAST(round(CAST(l_extendedprice AS DOUBLE), 9)
               AS DECIMAL(38,9)) AS w
           FROM lineitem WHERE l_quantity IS NOT NULL
             AND l_extendedprice IS NOT NULL
             AND CAST(l_extendedprice AS DOUBLE) > 0.0),
         lvl AS (SELECT g, v, count(*) AS c, sum(w) AS lw
           FROM r GROUP BY 1, 2),
         tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS n, sum(lw) AS tw
           FROM lvl GROUP BY 1),
         wk AS (SELECT g, v, lw,
             sum(lw) OVER (PARTITION BY g ORDER BY v) AS cum FROM lvl)
         SELECT wk.g AS l_returnflag, n,
           round(CAST(tw AS DOUBLE), 6) AS total_w, v AS wmedian
         FROM wk JOIN tot USING (g)
         WHERE cum * 2 >= tw AND (cum - lw) * 2 < tw
         ORDER BY l_returnflag""",

    // blocks + the proven rounded-JW gate (q191 parity) + the q77
    // recursive-CTE connected components; component = min reachable id
    "q273_er_clusters" ->
      """WITH RECURSIVE e0 AS (
           SELECT a.c_custkey AS src, b.c_custkey AS dst
           FROM customer a JOIN customer b
             ON a.c_nationkey = b.c_nationkey
             AND a.c_custkey < b.c_custkey
           WHERE round(jaro_winkler_similarity(a.c_name, b.c_name), 4)
             >= 0.97),
         undirected AS (SELECT src, dst FROM e0
           UNION SELECT dst, src FROM e0),
         cc(id, comp) AS (
           SELECT c_custkey, c_custkey FROM customer
           UNION
           SELECT u.dst, cc.comp FROM undirected u JOIN cc ON u.src = cc.id)
         SELECT id AS c_custkey, CAST(min(comp) AS BIGINT) AS entity_id
         FROM cc GROUP BY id ORDER BY c_custkey""",
  )

  /** The q212 CUSUM-peak CTE chain, prefix-renamed for the q263
    * binary-segmentation oracle — text kept token-identical to the
    * proven q212 oracle. */
  private def cpBlock(p: String, src: String): String =
    s"""${p}m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(v, 9) AS DECIMAL(38,9))) AS DOUBLE)
               / count(*) AS mean
           FROM $src),
         ${p}c AS (SELECT k, ${p}m.n, ${p}m.mean,
             sum(CAST(round(v - ${p}m.mean, 9) AS DECIMAL(38,9)))
               OVER (ORDER BY k) AS cusum
           FROM $src, ${p}m),
         ${p}b AS (SELECT *, row_number() OVER (
             ORDER BY abs(CAST(cusum AS DOUBLE)) DESC, k ASC) AS rk
           FROM ${p}c)"""
}
