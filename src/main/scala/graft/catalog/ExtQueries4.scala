package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 batch: bounded string-similarity linkage and the entity
  * registry — the candidate-generation and persistence halves that turn
  * the ER family from functional into 100 TB-shaped. */
object ExtQueries4 {

  import Catalog._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- bounded Jaro-Winkler similarity join ------------------------------
    // All customer-name pairs at jw >= 0.97 WITHOUT the n² cartesian:
    // char-multiset prefix filter + length band (no false negatives by
    // the Jaro bound), exact codegen JW gate on candidates only. The
    // oracle is the all-pairs shape — the equivalence IS the test.
    "q274_jw_join" -> ((s, d) =>
      graft.operators.JwJoin.jaroWinklerSelfJoin(
          t(s, d, "customer"), "c_custkey", "c_name", threshold = 0.9699)
        .filter(round(col("jw"), 4) >= 0.97)
        .select(col("id_a"), col("id_b"), round(col("jw"), 6).as("jw"))
        .orderBy(col("id_a"), col("id_b"))),

    // --- bounded JW join, prefix channel -----------------------------------
    // Part names (7-12 chars, adjective-noun vocab) at 0.95: lengths
    // vary too much for the multiset channel (depth 3), so this walks
    // the char-frequency prefix filter — the OTHER candidate channel —
    // and folds the pair set to a similarity histogram.
    "q276_jw_prefix_join" -> ((s, d) =>
      graft.operators.JwJoin.jaroWinklerSelfJoin(
          t(s, d, "part"), "p_partkey", "p_name", threshold = 0.95)
        .groupBy(round(col("jw"), 2).as("jw_bucket"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("jw_bucket"))),

    // --- persisted incremental entity registry -----------------------------
    // Build the registry on 90% of customers, fold the last 10% in as
    // an APPEND (bounded link against the stored corpus + incremental
    // CC on touched components only), serve entity ids. The oracle is
    // an independent full-corpus recursive-CTE clustering — the
    // incremental ≡ full equivalence IS the test (session-cached
    // store, swept on app end).
    "q275_er_registry" -> ((s, d) => {
      val cust = t(s, d, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      val store = LlmQueries.cachedStore(s, d, "er-q275") { p =>
        graft.operators.ErStore.build(
          cust.filter(col("c_custkey") % 10 =!= 9),
          "c_custkey", "c_name", p, threshold = 0.97,
          blockCols = Seq("c_nationkey"))
        graft.operators.ErStore.append(
          cust.filter(col("c_custkey") % 10 === 9), p, batchId = 1L)
      }
      graft.operators.ErStore.entities(s, store)
        .select(col("c_custkey"), col("entity").as("entity_id"))
        .orderBy(col("c_custkey"))
    }),

    // --- modularity of a node partition ------------------------------------
    // How community-like is the LANGUAGE partition of the q133/q158
    // doc graph? Exact per-community intra-edge/degree accounting.
    "q277_modularity" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("lang"))
      val edges = docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * col("doc_id") + 1, lit(500L)).as("dst"))
        .unionByName(docs.select(col("doc_id").as("src"),
          pmod(col("doc_id") * 37, lit(100L)).as("dst")))
      graft.operators.Graph.modularity(edges, "src", "dst",
          docs, "doc_id", "lang")
        .orderBy(col("community"))
    }),

    // --- simplified silhouette (clustering quality) ------------------------
    // The quality readout for the q103 frozen-centroid assignment:
    // per-cluster mean of (b − a)/max(a, b) against own vs nearest-
    // other centroid — the large-data silhouette (all-pairs is O(n²)).
    "q278_silhouette" -> ((s, d) => {
      val emb = t(s, d, "embeddings").filter(col("embedding").isNotNull)
      val centroids = emb.filter(col("vec_id") < 8)
        .select((col("vec_id") + 1L).as("cluster_id"),
          col("embedding").cast("array<double>").as("centroid"))
      graft.operators.KMeans.silhouette(emb, "embedding", "vec_id",
          centroids)
        .orderBy(col("cluster_id"))
    }),

    // --- partial autocorrelation (Durbin-Levinson, lags 1..3) --------------
    // The AR-order detector on the q252 daily event-count series: PACF
    // cuts off where ACF only decays.
    "q279_pacf" -> ((s, d) =>
      graft.operators.TimeSeries.pacf(
          ev(s, d).groupBy(col("event_type"),
              col("ts").cast("date").as("day"))
            .agg(count(lit(1)).cast("double").as("cnt")),
          "event_type", "day", "cnt")
        .orderBy(col("event_type"))),

    // --- position-based (U-shaped) attribution -----------------------------
    // 40/20/40 credit over each converting user's pre-purchase journey
    // — the standard corrective to q182's last-touch recency bias.
    "q280_position_attribution" -> ((s, d) =>
      graft.operators.Funnel.positionAttribution(
          ev(s, d), "user_id", "ts", "event_id", "event_type", "purchase")
        .orderBy(col("channel"))),

    // --- time-decay attribution --------------------------------------------
    // Reciprocal decay by seconds-to-conversion (exact rational
    // weights — exp() is not ULP-stable across engines), half-life 1
    // day, one unit of credit per converting user.
    "q281_time_decay_attribution" -> ((s, d) =>
      graft.operators.Funnel.timeDecayAttribution(
          ev(s, d), "user_id", "ts", "event_id", "event_type", "purchase",
          halfLifeSec = 86400.0)
        .orderBy(col("channel"))),

    // --- hard-negative mining ----------------------------------------------
    // The contrastive-training complement to random negativeSample:
    // for each anchor, the 3 most-similar vectors OUTSIDE its
    // pseudo-class (vec_id % 50) from the global top-10 (full probe =
    // exact, the q228/q255 adjudication; production prunes nprobe).
    "q282_hard_negatives" -> ((s, d) => {
      import graft.functions.IvfIndex
      val emb = t(s, d, "embeddings")
      val idx = LlmQueries.cachedIvfIndex(s, d + "#all")(
        IvfIndex.build(emb, "embedding", "vec_id", k = 8))
      val qs = emb.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine_sim").desc, col("vec_id"))
      IvfIndex.knnJoin(idx, qs, "query_id", "qvec",
          "embedding", "vec_id", k = 10, nprobe = 8, grid = 4)
        .filter(col("query_id") =!= col("vec_id") &&
          pmod(col("query_id"), lit(50L)) =!= pmod(col("vec_id"), lit(50L)))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("vec_id"), col("cosine_sim"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // --- T5-style span corruption ------------------------------------------
    // Deterministic 3-token-block dropping at 15% with ordinal
    // sentinels, emitting BOTH seq2seq sides (corrupted input +
    // targets) — the denoising-pair generator beside q268's MLM coin.
    "q283_span_corruption" -> ((s, d) =>
      graft.operators.Quality.corruptSpans(
          t(s, d, "documents"), "doc_id", "text", rate = 0.15, spanLen = 3)
        .orderBy(col("doc_id"))),

    // --- sentence BLEU-2 (generation eval) ---------------------------------
    // Score the q268 masked reconstruction against its own original:
    // clipped n-gram precisions + brevity penalty, per doc.
    "q284_bleu2" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val cand = graft.operators.Quality.maskTokens(
          docs, "doc_id", "text", rate = 0.15)
        .select(col("doc_id"), col("masked_text"))
      graft.operators.Eval.bleu2(
          docs.select(col("doc_id"), col("text")).join(cand, "doc_id"),
          "doc_id", "text", "masked_text")
        .orderBy(col("doc_id"))
    }),

    // --- rolling regression ------------------------------------------------
    // Trailing-14-day local slope of each event type's daily volume —
    // the local-trend detector a single global OLS smooths away.
    "q286_rolling_regression" -> ((s, d) =>
      graft.operators.TimeSeries.rollingRegression(
          ev(s, d).groupBy(col("event_type"),
              col("ts").cast("date").as("day"))
            .agg(count(lit(1)).cast("double").as("cnt"))
            .withColumn("t", datediff(col("day"), lit("2024-01-01"))),
          "event_type", "t", "cnt", window = 14)
        .orderBy(col("event_type"), col("t"))),

    // --- additive seasonal decomposition -----------------------------------
    // Weekly-period trend/seasonal/residual split of the daily series
    // (7-point centered MA, day-of-week seasonal means re-centered).
    "q287_seasonal_decompose" -> ((s, d) =>
      graft.operators.TimeSeries.seasonalDecompose(
          ev(s, d).groupBy(col("event_type"),
              col("ts").cast("date").as("day"))
            .agg(count(lit(1)).cast("double").as("cnt"))
            .withColumn("t", datediff(col("day"), lit("2024-01-01")))
            .withColumn("dow", pmod(col("t"), lit(7))),
          "event_type", "t", "cnt", "dow", period = 7)
        .orderBy(col("event_type"), col("t"))),

    // --- trimmed mean ------------------------------------------------------
    // 10%-each-side trimmed mean of extended price per return flag —
    // exact on the value-level grid, ties trim identically anywhere.
    "q288_trimmed_mean" -> ((s, d) =>
      graft.operators.Features.trimmedMean(
          t(s, d, "lineitem"), "l_returnflag", "l_extendedprice",
          frac = 0.1)
        .orderBy(col("l_returnflag"))),

    // --- Benford first-digit profile ---------------------------------------
    // Are extended prices Benford-distributed? String-exact digit
    // extraction, per-digit chi-square terms against log10(1+1/d).
    "q289_benford" -> ((s, d) =>
      graft.operators.Profile.benfordProfile(
        t(s, d, "lineitem"), "l_extendedprice")),

    // --- Flesch reading ease -----------------------------------------------
    // The classic readability gate on engine-exact sentence/word/
    // vowel-group counts.
    "q290_flesch" -> ((s, d) =>
      graft.operators.Quality.fleschReadingEase(
          t(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // --- clustering agreement (pairwise P/R/F1 + adjusted Rand) ------------
    // Score the q273 ER clusters against the exact-name gold
    // partition: which fuzzy merges does the 0.97 gate add, and do
    // they co-cluster what exact equality would?
    "q291_er_agreement" -> ((s, d) => {
      // predicted clusters SERVE from the q275 registry (same cached
      // store — the registry -> evaluation composition; re-running the
      // link+cluster would double-bill q273's cost in the bench)
      val cust = t(s, d, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      val store = LlmQueries.cachedStore(s, d, "er-q275") { p =>
        graft.operators.ErStore.build(
          cust.filter(col("c_custkey") % 10 =!= 9),
          "c_custkey", "c_name", p, threshold = 0.97,
          blockCols = Seq("c_nationkey"))
        graft.operators.ErStore.append(
          cust.filter(col("c_custkey") % 10 === 9), p, batchId = 1L)
      }
      graft.operators.Eval.clusteringAgreement(
        cust.join(graft.operators.ErStore.entities(s, store),
          "c_custkey"),
        "entity", "c_name")
    }),

    // --- ROUGE-L (oracled since r14: the mask coin is standard md5,
    // and the token-LCS DP unrolls as an anti-diagonal recursive CTE —
    // see the oracle) ------------------------------------------------------
    // The recall lens on the q284 reconstruction: order-preserving
    // shared tokens through the native codegen TokenLcs DP.
    // EvalSpec2 additionally pins ≡ an independent DP reference.
    "q292_rouge_l" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val cand = graft.operators.Quality.maskTokens(
          docs, "doc_id", "text", rate = 0.15)
        .select(col("doc_id"), col("masked_text"))
      graft.operators.Eval.rougeL(
          docs.select(col("doc_id"), col("text")).join(cand, "doc_id"),
          "doc_id", "text", "masked_text")
        .orderBy(col("doc_id"))
    }),

    // --- binned interval-overlap join (no equi key) ------------------------
    // Per-user daily activity windows vs high-value purchase incident
    // windows (±30 min), joined on the overlap predicate ALONE — the
    // event-overlap / downtime-vs-session shape. The bin equi-join
    // (1-day bins) replaces the nested-loop plan two large interval
    // sets would otherwise force; the exact overlap predicate gates and
    // the responsibility-bin trick emits each pair exactly once.
    "q293_interval_overlap" -> ((s, d) => {
      val es = unix_timestamp(col("ts"))
      val sessions = ev(s, d)
        .select(col("user_id"), es.as("es"))
        .withColumn("day", expr("es div 86400"))
        .groupBy(col("user_id"), col("day"))
        .agg(min(col("es")).as("w_start"), max(col("es")).as("w_end"))
        .select(concat_ws("_", col("user_id"), col("day")).as("win_id"),
          col("w_start"), col("w_end"))
      val incidents = ev(s, d)
        .filter(col("event_type") === "purchase" && col("value") > 200)
        .select(col("event_id"),
          (es - 1800L).as("i_start"), (es + 1800L).as("i_end"))
      graft.operators.AsOfJoin.intervalOverlapJoin(
          sessions, "win_id", "w_start", "w_end",
          incidents, "event_id", "i_start", "i_end",
          binWidth = 86400L)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // --- perceptual-hash media near-dup (rows-only: the decode stub and
    // the engine-hash-seeded signatures have no SQL form — correctness
    // is MultimodalSpec's planted-pair proof, the q43/q102 adjudication)
    // -----------------------------------------------------------------------
    // Image near-dup end-to-end through the codec seam: synthetic media
    // + planted same-length one-byte perturbations of the first 50
    // payloads (ids +1000000) → decode → mean-pool → dHash →
    // SimHash-family pigeonhole candidate pairs + exact Hamming gate.
    "q294_media_neardup" -> ((s, d) => {
      import graft.operators.Multimodal
      val docs = t(s, d, "documents")
      val base = Multimodal.syntheticMedia(docs)
      val planted = Multimodal.syntheticMedia(
        docs.filter(col("doc_id") < 50)
          .withColumn("doc_id", col("doc_id") + 1000000L)
          .withColumn("text", expr("overlay(text PLACING 'Z' FROM 11)")))
      Multimodal.mediaNearDupPairs(base.unionByName(planted),
          maxHamming = 8)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // --- winnowing document fingerprints -----------------------------------
    // The MOSS rolling-hash fingerprint over every document: 3-token
    // shingles, window 4, rightmost-min ties — substring-granular
    // summaries at ~2/(w+1) of the shingle count.
    "q295_winnowing" -> ((s, d) =>
      graft.operators.Dedup.winnowingFingerprints(
          t(s, d, "documents"), "doc_id", "text", k = 3, window = 4)
        .orderBy(col("doc_id"), col("fp_pos"), col("fp_hash"))),

    // --- McNemar's paired test ---------------------------------------------
    // Two threshold "classifiers" predicting purchase from event value
    // (cut 100 vs 120), scored on the same events — do they err
    // systematically differently? Only the discordant pairs count.
    "q296_mcnemar" -> ((s, d) => {
      val truth = col("event_type") === "purchase"
      val scored = ev(s, d).select(
        (truth === (col("value") > 100.0)).cast("int").as("ok_a"),
        (truth === (col("value") > 120.0)).cast("int").as("ok_b"))
      graft.operators.Eval.mcnemar(scored, "ok_a", "ok_b")
    }),

    // --- cross-table exact Jaccard join ------------------------------------
    // Planted perturbed twins (the q107 construction) probed AGAINST
    // the document corpus as two separate tables — the cross-corpus
    // linkage form of the prefix-filtered set-similarity join (this
    // week's batch vs the catalog); zero false negatives, exact gate.
    "q297_jaccard_join" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val twins = docs.filter(col("doc_id") < 20).select(
        (col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" zz zz")).as("text"))
      def sets(df: DataFrame) = df.select(col("doc_id"),
        graft.plans.ShingleHashSet(col("text")).as("shingles"))
      graft.operators.SetSimJoin.jaccardJoin(
          sets(twins), "doc_id", "shingles",
          sets(docs), "doc_id", "shingles", 0.8, frequencyOrder = true)
        .select(col("id_a"), col("id_b"), col("intersection"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // --- whole-doc FFD bin packing (rows-only: first-fit decreasing is
    // inherently sequential per shard — no SQL form; correctness is
    // PackSpec's ≡ independent-reference proof, the q101/q208
    // adjudication) ---------------------------------------------------------
    // Documents packed whole into 256-token windows across 8 shards —
    // the no-split training-window packer beside q89's concat-stream.
    "q298_bin_pack" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"),
        expr(s"size(${graft.plans.Tokens.whitespaceSql("text")})")
          .cast("long").as("n_tokens"))
        .filter(col("n_tokens") > 0)
      graft.operators.Pack.binPackFFD(docs, "doc_id", "n_tokens",
          capacity = 256, numShards = 8)
        .orderBy(col("shard"), col("bin_id"), col("pos_in_bin"))
    }),

    // --- cross-correlation function (lead-lag) -----------------------------
    // Do daily views LEAD daily purchases? CCF of the two global daily
    // series at lags 0..7 — the lead-lag detector beside q252's ACF.
    "q299_ccf" -> ((s, d) => {
      val daily = ev(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .cast("double").as("views"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("double").as("purchases"))
        .withColumn("g", lit("all"))
      graft.operators.TimeSeries.crossCorrelation(
          daily, "g", "day", "views", "purchases", maxLag = 7)
        .orderBy(col("lag"))
    }),

    // --- key-skew report ---------------------------------------------------
    // The pre-join diagnostic: the 20 heaviest customers by order rows,
    // with shares and the global key facts — what decides salting and
    // AQE skew thresholds before a shuffle detonates.
    "q300_key_skew" -> ((s, d) =>
      graft.operators.Profile.keySkew(t(s, d, "orders"),
          Seq("o_custkey"), topK = 20)
        .orderBy(col("rank"))),

    // --- golden-record survivorship ----------------------------------------
    // One canonical row per customer from their order history: modal
    // status (ties smallest), longest priority string (ties smallest),
    // earliest order date, biggest order, the most recent order's key —
    // the post-ER merge step with every tie-break pinned.
    "q301_golden_record" -> ((s, d) =>
      graft.operators.Merge.goldenRecord(t(s, d, "orders"), "o_custkey",
          mostFrequent = Seq("o_orderstatus"),
          longest = Seq("o_orderpriority"),
          minOf = Seq("o_orderdate"),
          maxOf = Seq("o_totalprice"),
          latestBy = Some(("o_orderdate", Seq("o_orderkey"))))
        .orderBy(col("o_custkey"))),

    // --- expected calibration error ----------------------------------------
    // The one-number summary of q201's reliability table (ECE + MCE),
    // computed FROM the same binned aggregation.
    "q302_ece" -> ((s, d) =>
      graft.operators.Eval.expectedCalibrationError(
        ev(s, d)
          .withColumn("is_pm", (hour(col("ts")) >= 12).cast("int"))
          .withColumn("p", least(col("value") / lit(500.0), lit(1.0))),
        "is_pm", "p", numBins = 10)),

    // --- Cochran's Q -------------------------------------------------------
    // Three value-threshold purchase classifiers (cuts 80/100/120)
    // scored on the same events — one shared success rate? The
    // k-classifier generalization of q296.
    "q303_cochran_q" -> ((s, d) => {
      val truth = col("event_type") === "purchase"
      val long = ev(s, d).select(col("event_id"),
          explode(array(
            struct(lit("c80").as("rater"),
              (truth === (col("value") > 80.0)).cast("int").as("ok")),
            struct(lit("c100").as("rater"),
              (truth === (col("value") > 100.0)).cast("int").as("ok")),
            struct(lit("c120").as("rater"),
              (truth === (col("value") > 120.0)).cast("int").as("ok"))))
            .as("r"))
        .select(col("event_id"), col("r.rater"), col("r.ok"))
      graft.operators.Eval.cochranQ(long, "event_id", "rater", "ok")
    }),

    // --- Huber robust regression (IRLS) ------------------------------------
    // Price-on-quantity per return flag with outliers fading as 1/|r|
    // instead of voting quadratically: OLS start + 2 reweighted
    // passes, absolute delta 10000.
    "q285_huber_regression" -> ((s, d) =>
      graft.operators.Features.huberRegression(
          t(s, d, "lineitem"), "l_returnflag", "l_quantity",
          "l_extendedprice", delta = 10000.0, iters = 2)
        .orderBy(col("l_returnflag"))),
  )

  def oracleSql: Map[String, String] = Map(
    // same R/C sums and the (k-1)(k*SC2 - SR^2)/(k*SR - SR2) form
    "q303_cochran_q" ->
      """WITH r AS (SELECT event_id,
             u.rater AS rater, u.ok AS ok
           FROM events, unnest([
             {'rater': 'c80',
              'ok': (((event_type = 'purchase') = (value > 80.0)))::INT},
             {'rater': 'c100',
              'ok': (((event_type = 'purchase') = (value > 100.0)))::INT},
             {'rater': 'c120',
              'ok': (((event_type = 'purchase') = (value > 120.0)))::INT}
           ]) t(u)),
         ri AS (SELECT event_id, sum(ok) AS ri FROM r GROUP BY 1),
         rs AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
             sum(CAST(ri AS DECIMAL(19,0))) AS sr,
             sum(CAST(ri AS DECIMAL(19,0)) * CAST(ri AS DECIMAL(19,0)))
               AS sr2 FROM ri),
         cj AS (SELECT rater, sum(ok) AS cj FROM r GROUP BY 1),
         cs AS (SELECT sum(CAST(cj AS DECIMAL(19,0)) *
             CAST(cj AS DECIMAL(19,0))) AS sc2 FROM cj)
         SELECT n_items, CAST(3 AS BIGINT) AS k,
           round(CASE WHEN 3 * CAST(sr AS DOUBLE) - CAST(sr2 AS DOUBLE)
               <> 0 THEN
             (3 * CAST(sc2 AS DOUBLE) - CAST(sr AS DOUBLE)
               * CAST(sr AS DOUBLE)) * 2
               / (3 * CAST(sr AS DOUBLE) - CAST(sr2 AS DOUBLE)) END, 6)
             AS q
         FROM rs, cs""",
    // the q201 binned table folded to the weighted |gap| sum and max,
    // per-bin means at the table's rounded-6 rendering
    "q302_ece" ->
      """WITH r AS (SELECT CASE WHEN hour(ts) >= 12 THEN 1 ELSE 0 END AS y,
             least(value / 500.0, 1.0) AS s
           FROM events WHERE value IS NOT NULL),
         b AS (SELECT least(greatest(CAST(floor(s * 10) AS INT) + 1, 1),
             10) AS bin, y, s FROM r),
         tbl AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
             round(CAST(sum(CAST(round(s, 9) AS DECIMAL(28,9))) AS DOUBLE)
               / count(*), 6) AS mean_score,
             round(sum(y) / CAST(count(*) AS DOUBLE), 6) AS frac_pos
           FROM b GROUP BY bin),
         g AS (SELECT n, abs(mean_score - frac_pos) AS gap FROM tbl)
         SELECT CAST(sum(n) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_bins_used,
           round(CAST(sum(CAST(round(n * gap, 9) AS DECIMAL(38,9)))
             AS DOUBLE) / sum(n), 6) AS ece,
           round(max(round(gap, 9)), 6) AS mce
         FROM g""",
    // one ranked window per strategy with identical pinned tie-breaks
    "q301_golden_record" ->
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

    // same counts, ranks and percentage arithmetic
    "q300_key_skew" ->
      """WITH c AS (SELECT coalesce(CAST(o_custkey AS VARCHAR), 'NULL')
             AS key, CAST(count(*) AS BIGINT) AS cnt
           FROM orders GROUP BY 1),
         t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_keys FROM c),
         r AS (SELECT key, cnt,
             row_number() OVER (ORDER BY cnt DESC, key ASC) AS rank,
             sum(cnt) OVER (ORDER BY cnt DESC, key ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM c)
         SELECT CAST(rank AS INT) AS rank, key, cnt,
           round(CAST(cnt AS DOUBLE) * 100.0 / n_rows, 4) AS share_pct,
           round(CAST(cum AS DOUBLE) * 100.0 / n_rows, 4) AS cum_share_pct,
           n_rows, n_keys,
           round(CAST(n_rows AS DOUBLE) / n_keys, 4) AS avg_per_key
         FROM r, t WHERE rank <= 20 ORDER BY rank""",

    // the q252 construction with a forward (pos + lag) join and the
    // sqrt(dx*dy) denominator; lag 0 included
    "q299_ccf" ->
      """WITH srs AS (SELECT 'all' AS g, CAST(ts AS DATE) AS day,
             CAST(count(*) FILTER (event_type = 'view') AS DOUBLE) AS x,
             CAST(count(*) FILTER (event_type = 'purchase') AS DOUBLE) AS y
           FROM events GROUP BY 1, 2),
         pos AS (SELECT g, x, y,
             row_number() OVER (PARTITION BY g ORDER BY day) AS p
           FROM srs),
         mu AS (SELECT g,
             round(CAST(sum(CAST(round(x, 9) AS DECIMAL(38,9)))
               AS DOUBLE) / count(*), 9) AS mx,
             round(CAST(sum(CAST(round(y, 9) AS DECIMAL(38,9)))
               AS DOUBLE) / count(*), 9) AS my
           FROM pos GROUP BY 1),
         cen AS (SELECT pos.g, p, x - mx AS ex, y - my AS ey
           FROM pos JOIN mu USING (g)),
         den AS (SELECT g,
             sum(CAST(round(ex * ex, 9) AS DECIMAL(38,9))) AS dx,
             sum(CAST(round(ey * ey, 9) AS DECIMAL(38,9))) AS dy
           FROM cen GROUP BY 1),
         pairs AS (SELECT a.g, t.lg, a.ex AS ex, b.ey AS ey
           FROM cen a CROSS JOIN range(0, 8) t(lg)
           JOIN cen b ON b.g = a.g AND b.p = a.p + t.lg),
         num AS (SELECT g, lg, count(*) AS n_terms,
             sum(CAST(round(ex * ey, 9) AS DECIMAL(38,9))) AS num
           FROM pairs GROUP BY 1, 2)
         SELECT num.g AS g, CAST(lg AS INT) AS lag, n_terms,
           round(CASE WHEN dx <> 0 AND dy <> 0 THEN
             CAST(num AS DOUBLE) /
               sqrt(CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE)) END, 6) AS r
         FROM num JOIN den USING (g) ORDER BY lag""",

    // the q107 shingle-string construction, cross-table (twins × docs),
    // no id-order constraint — values equal up to the 64-bit
    // shingle-hash collision contract
    "q297_jaccard_join" ->
      """WITH twins AS (
           SELECT doc_id + 1000000 AS doc_id, text || ' zz zz' AS text
           FROM documents WHERE doc_id < 20),
         tka AS (SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
               x -> x <> '') AS tk FROM twins),
         tkb AS (SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
               x -> x <> '') AS tk FROM documents),
         sa AS (SELECT doc_id,
             list_distinct([array_to_string(list_slice(tk, i, i+2), ' ')
               for i in range(1, greatest(len(tk)-2,1)+1)]) AS s FROM tka),
         sb AS (SELECT doc_id,
             list_distinct([array_to_string(list_slice(tk, i, i+2), ' ')
               for i in range(1, greatest(len(tk)-2,1)+1)]) AS s FROM tkb),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS intersection,
             CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
               len(list_distinct(list_concat(a.s, b.s))) AS j
           FROM sa a JOIN sb b ON true)
         SELECT id_a, id_b, intersection, round(j, 4) AS jaccard
         FROM pairs WHERE j >= 0.8 ORDER BY id_a, id_b""",

    // same integer cells + continuity-corrected (|b-c|-1)^2/(b+c)
    "q296_mcnemar" ->
      """WITH r AS (SELECT
           ((event_type = 'purchase') = (value > 100.0))::INT AS ok_a,
           ((event_type = 'purchase') = (value > 120.0))::INT AS ok_b
         FROM events),
         c AS (SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) FILTER (ok_a = 1 AND ok_b = 1) AS BIGINT) AS n_both,
           CAST(count(*) FILTER (ok_a = 1 AND ok_b = 0) AS BIGINT) AS n_a_only,
           CAST(count(*) FILTER (ok_a = 0 AND ok_b = 1) AS BIGINT) AS n_b_only,
           CAST(count(*) FILTER (ok_a = 0 AND ok_b = 0) AS BIGINT) AS n_neither
         FROM r)
         SELECT n, n_both, n_a_only, n_b_only, n_neither,
           round(CASE WHEN n_a_only + n_b_only > 0 THEN
             (abs(CAST(n_a_only AS DOUBLE) - n_b_only) - 1)
               * (abs(CAST(n_a_only AS DOUBLE) - n_b_only) - 1)
               / (n_a_only + n_b_only) END, 6) AS chi2
         FROM c""",

    // identical construction: shingle strings via list_slice (the q88
    // convention), the engine's 13-hex-digit md5 long, window min with
    // the rightmost-min tie resolved by a max(pos)-at-min-hash join
    "q295_winnowing" ->
      """WITH tk AS (SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
               x -> x <> '') AS t
           FROM documents),
         h0 AS (SELECT doc_id,
             unnest([{'pos': i - 1,
               'hash': ('0x' || substr(md5(array_to_string(
                 list_slice(t, i, i + 2), ' ')), 1, 13))::BIGINT}
               for i in range(1, greatest(len(t) - 2, 0) + 1)]) AS u
           FROM tk WHERE len(t) >= 3),
         h AS (SELECT doc_id, u.pos AS pos, u.hash AS hash FROM h0),
         mins AS (SELECT doc_id, pos AS i,
             min(hash) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS m
           FROM h),
         sel AS (SELECT m.doc_id, max(h.pos) AS fp_pos, m.m AS fp_hash
           FROM mins m JOIN h ON h.doc_id = m.doc_id
             AND h.pos BETWEEN m.i - 3 AND m.i AND h.hash = m.m
           WHERE m.i >= 3
           GROUP BY m.doc_id, m.i, m.m)
         SELECT DISTINCT doc_id, fp_pos, fp_hash FROM sel
         ORDER BY doc_id, fp_pos, fp_hash""",

    // ROUGE-L replayed move-for-move (converted from rows-only in r14):
    // the maskTokens md5 coin is a STANDARD hash — DuckDB reparses the
    // same 13 hex chars ((0x-cast ≡ Spark conv(…,16,10), verified) into
    // the same (0,1] double, so the candidate token list reproduces
    // exactly ('[mask]' because tokens() lowercases the sentinel) —
    // and the token-LCS DP unrolls as an ANTI-DIAGONAL recursive CTE:
    // diagonal t depends only on diagonals t−1/t−2, so each step is a
    // pure list_transform (no intra-row scan), and the cell (C, R) on
    // the final diagonal IS the LCS length. P/R/F arithmetic in the
    // engine's exact double chain, rounded 6.
    "q292_rouge_l" ->
      """WITH RECURSIVE base AS (
           SELECT doc_id,
             coalesce(list_filter(string_split_regex(lower(text), '\s+'),
               x -> x <> ''), CAST([] AS VARCHAR[])) AS ref
           FROM documents),
         cand AS (
           SELECT doc_id, ref,
             list_transform(range(1, len(ref) + 1), k ->
               CASE WHEN (CAST(CAST(concat('0x', substr(md5(concat('msk',
                      CAST(doc_id AS VARCHAR), '#',
                      CAST(k - 1 AS VARCHAR))), 1, 13)) AS UBIGINT)
                      AS DOUBLE) + 1.0) / 4503599627370496.0
                    < CAST(0.15 AS DOUBLE)
                 THEN '[mask]' ELSE ref[k] END) AS cnd
           FROM base),
         dims AS (SELECT doc_id, ref, cnd, len(ref) AS rl, len(cnd) AS cl
           FROM cand),
         rec AS (
           SELECT doc_id, ref, cnd, rl, cl, 1 AS t,
             [CAST(0 AS BIGINT), CAST(0 AS BIGINT)] AS d1,
             [CAST(0 AS BIGINT)] AS d2
           FROM dims WHERE rl >= 1 AND cl >= 1
           UNION ALL
           SELECT doc_id, ref, cnd, rl, cl, t + 1,
             list_transform(
               range(1, least(t + 1, cl) - greatest(0, t + 1 - rl) + 2),
               k -> CASE
                 WHEN greatest(0, t + 1 - rl) + k - 1 = 0
                   OR t + 1 - (greatest(0, t + 1 - rl) + k - 1) = 0
                 THEN CAST(0 AS BIGINT)
                 WHEN cnd[greatest(0, t + 1 - rl) + k - 1]
                   = ref[t + 1 - (greatest(0, t + 1 - rl) + k - 1)]
                 THEN d2[greatest(0, t + 1 - rl) + k - 1
                         - greatest(0, t - 1 - rl)] + 1
                 ELSE greatest(
                   d1[greatest(0, t + 1 - rl) + k - 1 - greatest(0, t - rl)],
                   d1[greatest(0, t + 1 - rl) + k - greatest(0, t - rl)])
               END),
             d1
           FROM rec WHERE t < rl + cl),
         fin AS (SELECT doc_id, d1[1] AS lcs FROM rec WHERE t = rl + cl),
         pr AS (SELECT d.doc_id, d.rl, d.cl, coalesce(f.lcs, 0) AS lcs,
             CASE WHEN d.cl > 0
               THEN CAST(coalesce(f.lcs, 0) AS DOUBLE) / d.cl END AS p,
             CASE WHEN d.rl > 0
               THEN CAST(coalesce(f.lcs, 0) AS DOUBLE) / d.rl END AS r
           FROM dims d LEFT JOIN fin f USING (doc_id))
         SELECT doc_id, CAST(rl AS BIGINT) AS ref_len,
           CAST(cl AS BIGINT) AS cand_len, CAST(lcs AS BIGINT) AS lcs,
           round(p, 6) AS rouge_p, round(r, 6) AS rouge_r,
           round(CASE WHEN p IS NULL OR r IS NULL THEN NULL
             WHEN p + r = 0.0 THEN 0.0
             ELSE 2.0 * p * r / (p + r) END, 6) AS rouge_f
         FROM pr ORDER BY doc_id""",

    // plain theta join (DuckDB's IEJoin serves it) over the same two
    // interval CTEs; inclusive-endpoint overlap, same floor-div day
    "q293_interval_overlap" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value,
             epoch_us(ts) // 1000000 AS es FROM events),
         sessions AS (SELECT
             CAST(user_id AS VARCHAR) || '_' ||
               CAST(es // 86400 AS VARCHAR) AS id_a,
             min(es) AS w_start, max(es) AS w_end
           FROM e GROUP BY user_id, es // 86400),
         incidents AS (SELECT event_id AS id_b,
             es - 1800 AS i_start, es + 1800 AS i_end
           FROM e WHERE event_type = 'purchase' AND value > 200)
         SELECT id_a, id_b,
           greatest(w_start, i_start) AS overlap_start,
           least(w_end, i_end) AS overlap_end
         FROM sessions s JOIN incidents i
           ON s.w_start <= i.i_end AND i.i_start <= s.w_end
         ORDER BY id_a, id_b""",

    // all-pairs reference: DuckDB's jaro_winkler_similarity is the same
    // classic definition (verified bit-exact on this corpus for q191);
    // both engines gate on the rounded-4 grid and render rounded-6
    "q274_jw_join" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           round(jaro_winkler_similarity(a.c_name, b.c_name), 6) AS jw
         FROM customer a, customer b
         WHERE a.c_custkey < b.c_custkey
           AND round(jaro_winkler_similarity(a.c_name, b.c_name), 4) >= 0.97
         ORDER BY id_a, id_b""",

    // all-pairs reference folded to the same rounded-2 histogram
    "q276_jw_prefix_join" ->
      """SELECT round(round(jaro_winkler_similarity(a.p_name, b.p_name),
             2), 2) AS jw_bucket,
           CAST(count(*) AS BIGINT) AS n_pairs
         FROM part a, part b
         WHERE a.p_partkey < b.p_partkey
           AND jaro_winkler_similarity(a.p_name, b.p_name) >= 0.95
         GROUP BY 1 ORDER BY 1""",

    // independent full-corpus clustering (the q273 recursive-CTE
    // pattern) against the registry's INCREMENTAL build+append path;
    // gate expression identical on both engines (bit-exact jw)
    "q275_er_registry" ->
      """WITH RECURSIVE e0 AS (
           SELECT a.c_custkey AS src, b.c_custkey AS dst
           FROM customer a JOIN customer b
             ON a.c_nationkey = b.c_nationkey
             AND a.c_custkey < b.c_custkey
           WHERE jaro_winkler_similarity(a.c_name, b.c_name) >= 0.97),
         undirected AS (SELECT src, dst FROM e0
           UNION SELECT dst, src FROM e0),
         cc(id, comp) AS (
           SELECT c_custkey, c_custkey FROM customer
           UNION
           SELECT u.dst, cc.comp FROM undirected u JOIN cc ON u.src = cc.id)
         SELECT id AS c_custkey, CAST(min(comp) AS BIGINT) AS entity_id
         FROM cc GROUP BY id ORDER BY c_custkey""",

    // exact integer intra-edge/degree accounting over the canonical
    // undirected labeled subgraph; two double divisions rounded 6
    "q277_modularity" ->
      """WITH e0 AS (SELECT doc_id AS s, (doc_id*doc_id + 1) % 500 AS t
             FROM documents
           UNION ALL SELECT doc_id, (doc_id*37) % 100 FROM documents),
         canon AS (SELECT DISTINCT least(s, t) AS u, greatest(s, t) AS v
           FROM e0 WHERE s IS NOT NULL AND t IS NOT NULL AND s <> t),
         lab AS (SELECT doc_id AS n, lang AS c FROM documents
           WHERE lang IS NOT NULL),
         le AS (SELECT u, v, lu.c AS cu, lv.c AS cv FROM canon
           JOIN lab lu ON lu.n = u JOIN lab lv ON lv.n = v),
         m AS (SELECT count(*) AS m FROM le),
         degs AS (SELECT u AS n, cu AS c FROM le
           UNION ALL SELECT v, cv FROM le),
         comm AS (SELECT c, count(DISTINCT n) AS n_nodes,
             count(*) AS degree_sum FROM degs GROUP BY 1),
         intra AS (SELECT cu AS c, count(*) AS intra FROM le
           WHERE cu = cv GROUP BY 1)
         SELECT comm.c AS community, CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST(coalesce(intra, 0) AS BIGINT) AS intra_edges,
           CAST(degree_sum AS BIGINT) AS degree_sum,
           round(CAST(coalesce(intra, 0) AS DOUBLE) / m.m
             - (CAST(degree_sum AS DOUBLE) / (2.0 * m.m))
               * (CAST(degree_sum AS DOUBLE) / (2.0 * m.m)), 6)
             AS contribution
         FROM comm LEFT JOIN intra USING (c), m ORDER BY community""",

    // the q103 distance grid + argmin, then the silhouette ratio on
    // the 9-grid before the per-cluster DECIMAL mean
    "q278_silhouette" ->
      """WITH c AS (
           SELECT CAST(vec_id + 1 AS BIGINT) AS cluster_id,
             embedding AS centroid
           FROM embeddings WHERE vec_id < 8),
         d AS (
           SELECT e.vec_id, c.cluster_id,
             sqrt(sum((CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)
                 - CAST(c.centroid[CAST(i AS INT)] AS DOUBLE))
               * (CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)
                 - CAST(c.centroid[CAST(i AS INT)] AS DOUBLE)))) AS dist
           FROM embeddings e, c, generate_series(1, 64) AS g(i)
           WHERE e.embedding IS NOT NULL
           GROUP BY e.vec_id, c.cluster_id),
         own AS (SELECT vec_id, cluster_id, dist AS a FROM (
             SELECT *, row_number() OVER (PARTITION BY vec_id
               ORDER BY dist ASC, cluster_id ASC) AS rn FROM d)
           WHERE rn = 1),
         oth AS (SELECT d.vec_id, min(d.dist) AS b
           FROM d JOIN own ON d.vec_id = own.vec_id
             AND d.cluster_id <> own.cluster_id
           GROUP BY 1),
         sil AS (SELECT own.cluster_id,
             round(CASE WHEN greatest(a, b) > 0
               THEN (b - a) / greatest(a, b) ELSE 0.0 END, 9) AS s
           FROM own JOIN oth USING (vec_id))
         SELECT cluster_id, CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(CAST(s AS DECIMAL(38,9))) AS DOUBLE)
             / count(*), 6) AS mean_silhouette
         FROM sil GROUP BY 1 ORDER BY cluster_id""",

    // the q252 ACF chain to lag 3, pivoted, then the Durbin-Levinson
    // closed forms — every intermediate on the 9-grid, double-rounded
    // (9 then 6) exactly as the engine renders
    "q279_pacf" ->
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
           FROM cen a CROSS JOIN range(1, 4) t(lg)
           JOIN cen b ON b.g = a.g AND b.p = a.p - t.lg),
         num AS (SELECT g, lg,
             sum(CAST(round(e * ep, 9) AS DECIMAL(38,9))) AS num
           FROM pairs GROUP BY 1, 2),
         acf AS (SELECT num.g, lg,
             round(CASE WHEN d <> 0 THEN
               CAST(num AS DOUBLE) / CAST(d AS DOUBLE) END, 6) AS r
           FROM num JOIN den USING (g)),
         piv AS (SELECT g,
             max(CASE WHEN lg = 1 THEN r END) AS r1,
             max(CASE WHEN lg = 2 THEN r END) AS r2,
             max(CASE WHEN lg = 3 THEN r END) AS r3
           FROM acf GROUP BY 1),
         f1 AS (SELECT g, r1, r2, r3,
             round(CASE WHEN 1.0 - r1*r1 <> 0
               THEN (r2 - r1*r1) / (1.0 - r1*r1) END, 9) AS p22
           FROM piv),
         f2 AS (SELECT *, round(r1 * (1.0 - p22), 9) AS p21 FROM f1)
         SELECT g AS event_type, round(r1, 6) AS pacf1,
           round(p22, 6) AS pacf2,
           round(round(CASE WHEN 1.0 - p21*r1 - p22*r2 <> 0
             THEN (r3 - p21*r2 - p22*r1) / (1.0 - p21*r1 - p22*r2) END,
             9), 6) AS pacf3
         FROM f2 ORDER BY event_type""",

    // journey = touches strictly before the FIRST purchase ((ts, id)
    // total order); U-shaped credits are exact small-integer divisions
    // on the 9-grid
    "q280_position_attribution" ->
      """WITH rows AS (SELECT user_id AS u, event_type AS ty,
             CAST(ts AS TIMESTAMP) AS ts, event_id AS i
           FROM events WHERE ts IS NOT NULL),
         conv AS (SELECT u, ts AS cts, i AS ci FROM (
             SELECT u, ts, i, row_number() OVER (PARTITION BY u
               ORDER BY ts, i) AS rn FROM rows WHERE ty = 'purchase')
           WHERE rn = 1),
         touch AS (SELECT r.u, r.ty AS ch, r.ts, r.i
           FROM rows r JOIN conv ON r.u = conv.u
           WHERE r.ty <> 'purchase'
             AND (r.ts < cts OR (r.ts = cts AND r.i < ci))),
         rk AS (SELECT u, ch,
             row_number() OVER (PARTITION BY u ORDER BY ts, i) AS pos,
             count(*) OVER (PARTITION BY u) AS k FROM touch),
         cold AS (SELECT conv.u, NULL AS ch, 0 AS pos, 0 AS k
           FROM conv LEFT JOIN (SELECT DISTINCT u FROM touch) t
             ON conv.u = t.u WHERE t.u IS NULL),
         j AS (SELECT * FROM rk UNION ALL SELECT * FROM cold),
         cr AS (SELECT coalesce(ch, 'none') AS channel,
             CASE WHEN k = 0 THEN 1.0 WHEN k = 1 THEN 1.0
               WHEN k = 2 THEN 0.5
               WHEN pos = 1 OR pos = k THEN 0.4
               ELSE 0.2 / (k - 2) END AS c
           FROM j)
         SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
           round(CAST(sum(CAST(round(c, 9) AS DECIMAL(38,9)))
             AS DOUBLE), 6) AS credit
         FROM cr GROUP BY 1 ORDER BY 1""",

    // reciprocal decay on floored epoch-second differences (the q253
    // flooring discipline); per-user normalization on the 9-grid
    "q281_time_decay_attribution" ->
      """WITH rows AS (SELECT user_id AS u, event_type AS ty,
             CAST(ts AS TIMESTAMP) AS ts, event_id AS i
           FROM events WHERE ts IS NOT NULL),
         conv AS (SELECT u, ts AS cts, i AS ci FROM (
             SELECT u, ts, i, row_number() OVER (PARTITION BY u
               ORDER BY ts, i) AS rn FROM rows WHERE ty = 'purchase')
           WHERE rn = 1),
         touch AS (SELECT r.u, r.ty AS ch,
             CAST(floor(epoch(cts)) AS BIGINT)
               - CAST(floor(epoch(r.ts)) AS BIGINT) AS dt
           FROM rows r JOIN conv ON r.u = conv.u
           WHERE r.ty <> 'purchase'
             AND (r.ts < cts OR (r.ts = cts AND r.i < ci))),
         wt AS (SELECT u, ch,
             round(1.0 / (1.0 + CAST(dt AS DOUBLE) / 86400.0), 9) AS w
           FROM touch),
         tot AS (SELECT u, sum(CAST(w AS DECIMAL(38,9))) AS tw
           FROM wt GROUP BY 1),
         cr AS (SELECT ch AS channel,
             round(w / CAST(tw AS DOUBLE), 9) AS c
           FROM wt JOIN tot USING (u)
           UNION ALL
           SELECT 'none', 1.0 FROM conv
           LEFT JOIN (SELECT DISTINCT u FROM touch) t ON conv.u = t.u
           WHERE t.u IS NULL)
         SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
           round(CAST(sum(CAST(round(c, 9) AS DECIMAL(38,9)))
             AS DOUBLE), 6) AS credit
         FROM cr GROUP BY 1 ORDER BY 1""",

    // the q228 exact-cosine grid, global top-10, then the class gate
    // and re-rank — semantics matched to the engine's probe-k contract
    "q282_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
           FROM embeddings WHERE vec_id % 20 = 0),
         sims AS (
           SELECT q.query_id, e.vec_id,
             round(sum(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(q.qe[CAST(i AS INT)] AS DOUBLE))
               / (sqrt(sum(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)))
                  * sqrt(sum(CAST(q.qe[CAST(i AS INT)] AS DOUBLE) * CAST(q.qe[CAST(i AS INT)] AS DOUBLE)))), 4) AS cosine_sim
           FROM embeddings e, q, generate_series(1, 64) AS g(i)
           GROUP BY q.query_id, e.vec_id),
         top10 AS (SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY cosine_sim DESC, vec_id) AS rk FROM sims),
         neg AS (SELECT query_id, vec_id, cosine_sim,
             row_number() OVER (PARTITION BY query_id
               ORDER BY cosine_sim DESC, vec_id) AS rank
           FROM top10 WHERE rk <= 10 AND vec_id <> query_id
             AND (query_id % 50) <> (vec_id % 50))
         SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, cosine_sim
         FROM neg WHERE rank <= 3 ORDER BY query_id, rank""",

    // the q268 md5-coin machinery lifted to 3-token BLOCKS; string_agg
    // drops the NULL placeholders of non-first masked tokens, the
    // cumulative masked-block window numbers the sentinels
    "q283_span_corruption" ->
      """WITH tok AS (SELECT doc_id, list_filter(
             string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')
             AS tk
           FROM documents),
         pos AS (SELECT doc_id, unnest(tk) AS tok,
             CAST(generate_subscripts(tk, 1) - 1 AS BIGINT) AS i
           FROM tok),
         m AS (SELECT doc_id, i, tok, i // 3 AS b FROM pos),
         bm AS (SELECT DISTINCT doc_id, b FROM m),
         coin AS (SELECT doc_id, b,
             (('0x' || substr(md5('spn' || CAST(doc_id AS VARCHAR)
               || '#' || CAST(b AS VARCHAR)), 1, 13))::BIGINT + 1)
               / 4503599627370496.0 < CAST(0.15 AS DOUBLE) AS mk
           FROM bm),
         sent AS (SELECT doc_id, b, mk,
             coalesce(CAST(sum(CASE WHEN mk THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY b
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS BIGINT), 0) AS k
           FROM coin),
         t2 AS (SELECT m.doc_id, m.i, m.tok, m.b, s.mk, s.k
           FROM m JOIN sent s ON m.doc_id = s.doc_id AND m.b = s.b),
         corr AS (SELECT doc_id,
             string_agg(CASE WHEN NOT mk THEN tok
               WHEN i % 3 = 0 THEN '<extra_id_' || CAST(k AS VARCHAR) || '>'
               END, ' ' ORDER BY i) AS corrupted_text
           FROM t2 GROUP BY 1),
         blocktxt AS (SELECT doc_id, b,
             '<extra_id_' || CAST(min(k) AS VARCHAR) || '> '
               || string_agg(tok, ' ' ORDER BY i) AS bt
           FROM t2 WHERE mk GROUP BY doc_id, b),
         tgt AS (SELECT doc_id, string_agg(bt, ' ' ORDER BY b)
             AS targets_text FROM blocktxt GROUP BY 1),
         counts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(count(DISTINCT CASE WHEN mk THEN b END) AS BIGINT)
               AS n_spans,
             CAST(sum(CASE WHEN mk THEN 1 ELSE 0 END) AS BIGINT)
               AS n_masked_tokens
           FROM t2 GROUP BY 1)
         SELECT d.doc_id, coalesce(n_tokens, 0) AS n_tokens,
           coalesce(n_spans, 0) AS n_spans,
           coalesce(n_masked_tokens, 0) AS n_masked_tokens,
           coalesce(corrupted_text, '') AS corrupted_text,
           coalesce(targets_text, '') AS targets_text
         FROM documents d
         LEFT JOIN counts USING (doc_id)
         LEFT JOIN corr USING (doc_id)
         LEFT JOIN tgt USING (doc_id)
         ORDER BY doc_id""",

    // the q273 recursive-CTE clusters vs the exact-name partition:
    // one contingency pass, exact DECIMAL pair counts rendered as
    // strings (the q266 rule), double ARI arithmetic
    "q291_er_agreement" ->
      """WITH RECURSIVE cust AS (
           SELECT c_custkey, c_nationkey, c_name FROM customer),
         e0 AS (
           SELECT a.c_custkey AS src, b.c_custkey AS dst
           FROM cust a JOIN cust b
             ON a.c_nationkey = b.c_nationkey
             AND a.c_custkey < b.c_custkey
           WHERE jaro_winkler_similarity(a.c_name, b.c_name) >= 0.97),
         undirected AS (SELECT src, dst FROM e0
           UNION SELECT dst, src FROM e0),
         cc(id, comp) AS (
           SELECT c_custkey, c_custkey FROM cust
           UNION
           SELECT u.dst, cc.comp FROM undirected u JOIN cc ON u.src = cc.id),
         pred AS (SELECT id, CAST(min(comp) AS BIGINT) AS p
           FROM cc GROUP BY id),
         j AS (SELECT p, c_name AS g
           FROM pred JOIN cust ON id = c_custkey),
         cells AS (SELECT p, g, count(*) AS c FROM j GROUP BY 1, 2),
         pa AS (SELECT p, sum(c) AS a FROM cells GROUP BY 1),
         gb AS (SELECT g, sum(c) AS b FROM cells GROUP BY 1),
         tps AS (SELECT CAST(sum(CAST(c AS DECIMAL(38,0))
             * CAST(c - 1 AS DECIMAL(38,0)) / 2) AS DECIMAL(38,0)) AS tp,
             sum(c) AS n
           FROM cells),
         pps AS (SELECT CAST(sum(CAST(a AS DECIMAL(38,0))
             * CAST(a - 1 AS DECIMAL(38,0)) / 2) AS DECIMAL(38,0)) AS pp,
             count(*) AS kp
           FROM pa),
         gps AS (SELECT CAST(sum(CAST(b AS DECIMAL(38,0))
             * CAST(b - 1 AS DECIMAL(38,0)) / 2) AS DECIMAL(38,0)) AS gp,
             count(*) AS kg
           FROM gb),
         f AS (SELECT n, kp, kg, tp, pp, gp,
             CAST(CAST(n AS DECIMAL(38,0))
               * CAST(n - 1 AS DECIMAL(38,0)) / 2 AS DECIMAL(38,0)) AS np,
             CASE WHEN pp > 0
               THEN CAST(tp AS DOUBLE) / CAST(pp AS DOUBLE) END AS prec,
             CASE WHEN gp > 0
               THEN CAST(tp AS DOUBLE) / CAST(gp AS DOUBLE) END AS rec
           FROM tps, pps, gps)
         SELECT CAST(n AS BIGINT) AS n, CAST(kp AS BIGINT)
             AS n_pred_clusters,
           CAST(kg AS BIGINT) AS n_gold_clusters,
           CAST(tp AS VARCHAR) AS tp_pairs,
           CAST(pp AS VARCHAR) AS pred_pairs,
           CAST(gp AS VARCHAR) AS gold_pairs,
           round(prec, 6) AS precision,
           round(rec, 6) AS recall,
           round(CASE WHEN prec + rec > 0
             THEN 2.0 * prec * rec / (prec + rec) END, 6) AS f1,
           round(CASE WHEN n <= 1 THEN NULL
             WHEN (CAST(pp AS DOUBLE) + CAST(gp AS DOUBLE)) / 2.0
                 - CAST(pp AS DOUBLE) * CAST(gp AS DOUBLE)
                   / CAST(np AS DOUBLE) = 0.0
                 AND CAST(tp AS DOUBLE)
                 - CAST(pp AS DOUBLE) * CAST(gp AS DOUBLE)
                   / CAST(np AS DOUBLE) = 0.0
               THEN 1.0
             WHEN (CAST(pp AS DOUBLE) + CAST(gp AS DOUBLE)) / 2.0
                 - CAST(pp AS DOUBLE) * CAST(gp AS DOUBLE)
                   / CAST(np AS DOUBLE) <> 0.0
               THEN (CAST(tp AS DOUBLE)
                 - CAST(pp AS DOUBLE) * CAST(gp AS DOUBLE)
                   / CAST(np AS DOUBLE))
                 / ((CAST(pp AS DOUBLE) + CAST(gp AS DOUBLE)) / 2.0
                   - CAST(pp AS DOUBLE) * CAST(gp AS DOUBLE)
                     / CAST(np AS DOUBLE)) END, 6) AS ari
         FROM f""",

    // the same decimal-grid window sums (olsFit's 4-grid inputs,
    // exact associative frames) and closed-form solve
    "q286_rolling_regression" ->
      """WITH srs AS (SELECT event_type AS g, CAST(ts AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS cnt
           FROM events GROUP BY 1, 2),
         r AS (SELECT g, datediff('day', DATE '2024-01-01', day) AS t,
             cnt FROM srs),
         dec AS (SELECT g, t,
             CAST(round(CAST(t AS DOUBLE), 4) AS DECIMAL(18,4)) AS td,
             CAST(round(cnt, 4) AS DECIMAL(18,4)) AS vd
           FROM r),
         win AS (SELECT g, t,
             CAST(count(*) OVER w AS DOUBLE) AS n,
             CAST(sum(td) OVER w AS DOUBLE) AS sx,
             CAST(sum(vd) OVER w AS DOUBLE) AS sy,
             CAST(sum(CAST(td * td AS DECIMAL(38,8))) OVER w AS DOUBLE)
               AS sxx,
             CAST(sum(CAST(td * vd AS DECIMAL(38,8))) OVER w AS DOUBLE)
               AS sxy
           FROM dec WINDOW w AS (PARTITION BY g ORDER BY td
             ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
         SELECT g AS event_type, CAST(t AS INT) AS t,
           CAST(n AS BIGINT) AS n,
           round(CASE WHEN n*sxx - sx*sx <> 0
             THEN (n*sxy - sx*sy) / (n*sxx - sx*sx) END, 6) AS slope
         FROM win ORDER BY event_type, t""",

    // centered 7-MA + per-position means re-centered, every mean on
    // the 9-grid
    "q287_seasonal_decompose" ->
      """WITH srs AS (SELECT event_type AS g, CAST(ts AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS cnt
           FROM events GROUP BY 1, 2),
         r AS (SELECT g, datediff('day', DATE '2024-01-01', day) AS t,
             cnt FROM srs),
         rows2 AS (SELECT g, t, t % 7 AS dow, cnt FROM r),
         w7 AS (SELECT g, t, dow, cnt,
             count(*) OVER w AS wn,
             sum(CAST(round(cnt, 9) AS DECIMAL(38,9))) OVER w AS wsum
           FROM rows2 WINDOW w AS (PARTITION BY g ORDER BY t
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         tr AS (SELECT g, t, dow, cnt, CASE WHEN wn = 7
             THEN round(CAST(wsum AS DOUBLE) / 7, 9) END AS trend
           FROM w7),
         det AS (SELECT g, dow, cnt - trend AS dv FROM tr
           WHERE trend IS NOT NULL),
         s0 AS (SELECT g, dow,
             round(CAST(sum(CAST(round(dv, 9) AS DECIMAL(38,9)))
               AS DOUBLE) / count(*), 9) AS s0
           FROM det GROUP BY 1, 2),
         sm AS (SELECT g, round(CAST(sum(CAST(round(s0, 9)
             AS DECIMAL(38,9))) AS DOUBLE) / count(*), 9) AS smean
           FROM s0 GROUP BY 1),
         seas AS (SELECT s0.g, dow, round(s0 - smean, 9) AS seas
           FROM s0 JOIN sm ON s0.g = sm.g)
         SELECT tr.g AS event_type, CAST(t AS INT) AS t,
           round(cnt, 6) AS value, round(trend, 6) AS trend,
           round(seas, 6) AS seasonal,
           round(cnt - trend - seas, 6) AS residual
         FROM tr LEFT JOIN seas ON tr.g = seas.g AND tr.dow = seas.dow
         ORDER BY event_type, t""",

    // the conversionLag level-grid trim: a level keeps
    // max(0, min(cum, n-k) - max(cum-c, k)) copies
    "q288_trimmed_mean" ->
      """WITH lvl AS (SELECT l_returnflag AS g,
             CAST(l_extendedprice AS DOUBLE) AS v, count(*) AS c
           FROM lineitem WHERE l_extendedprice IS NOT NULL
           GROUP BY 1, 2),
         tot AS (SELECT g, sum(c) AS n FROM lvl GROUP BY 1),
         cum AS (SELECT g, v, c,
             sum(c) OVER (PARTITION BY g ORDER BY v) AS cum FROM lvl),
         j AS (SELECT cum.g, v, c, cum, n,
             CAST(floor(n * 0.1) AS BIGINT) AS k
           FROM cum JOIN tot USING (g)),
         kept AS (SELECT g, n, k, v,
             greatest(0, least(cum, n - k) - greatest(cum - c, k)) AS kc
           FROM j)
         SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
           k AS n_trimmed_each,
           round(CASE WHEN n - 2*k > 0 THEN
             CAST(sum(CAST(round(v * kc, 9) AS DECIMAL(38,9))) AS DOUBLE)
               / (n - 2*k) END, 6) AS trimmed_mean
         FROM kept GROUP BY g, n, k ORDER BY 1""",

    // string-exact first significant digit; expected fractions and
    // chi-square terms on the engine's round-9 log grid
    "q289_benford" ->
      """WITH src AS (SELECT regexp_extract(
             CAST(abs(l_extendedprice) AS VARCHAR), '[1-9]') AS ds
           FROM lineitem WHERE l_extendedprice IS NOT NULL),
         cnts AS (SELECT CAST(ds AS INT) AS digit, count(*) AS c
           FROM src WHERE ds <> '' GROUP BY 1),
         tot AS (SELECT sum(c) AS n FROM cnts),
         dg AS (SELECT CAST(UNNEST(generate_series(1, 9)) AS INT)
           AS digit),
         p AS (SELECT dg.digit, coalesce(c, 0) AS c, tot.n,
             round(ln(1.0 + 1.0 / dg.digit) / ln(10.0), 9) AS pd
           FROM dg LEFT JOIN cnts USING (digit), tot)
         SELECT digit, CAST(c AS BIGINT) AS n,
           round(CASE WHEN n > 0 THEN CAST(c AS DOUBLE) / n END, 6)
             AS observed_frac,
           round(pd, 6) AS expected_frac,
           round(CASE WHEN n > 0 THEN
             (CAST(c AS DOUBLE) - n * pd) * (CAST(c AS DOUBLE) - n * pd)
               / (n * pd) END, 6) AS chi2_term
         FROM p ORDER BY digit""",

    // engine-exact sentence/word/vowel-group counts, one double
    // formula
    "q290_flesch" ->
      """WITH c AS (SELECT doc_id, text,
             CASE WHEN text IS NULL THEN 0 ELSE
               len(list_filter(string_split_regex(text, '[.!?]+'),
                 s -> len(regexp_replace(s, '\s+', '', 'g')) > 0)) END
               AS ns,
             coalesce(len(list_filter(string_split_regex(
               trim(lower(text)), '\s+'), x -> x <> '')), 0) AS nw,
             coalesce(list_sum(list_transform(list_filter(
               string_split_regex(trim(lower(text)), '\s+'),
               x -> x <> ''),
               w -> len(regexp_replace(regexp_replace(w, '[aeiouy]+',
                 '#', 'g'), '[^#]', '', 'g')))), 0) AS syl
           FROM documents)
         SELECT doc_id, CAST(ns AS BIGINT) AS n_sentences,
           CAST(nw AS BIGINT) AS n_words,
           CAST(syl AS BIGINT) AS n_syllables,
           round(CASE WHEN text IS NOT NULL AND ns > 0 AND nw > 0 THEN
             206.835 - 1.015 * CAST(nw AS DOUBLE) / ns
               - 84.6 * CAST(syl AS DOUBLE) / nw END, 4) AS flesch
         FROM c ORDER BY doc_id""",

    // the q268 mask reconstruction as the candidate, then clipped
    // n-gram precisions over DuckDB list HOFs — every intermediate on
    // the engine's 9-then-6 grid; chr(1) joins bigrams on both engines
    "q284_bleu2" ->
      """WITH tok AS (SELECT doc_id, coalesce(list_filter(
             string_split_regex(trim(lower(text)), '\s+'), x -> x <> ''),
             CAST([] AS VARCHAR[])) AS rt
           FROM documents),
         pos AS (SELECT doc_id, unnest(rt) AS tok,
             CAST(generate_subscripts(rt, 1) - 1 AS BIGINT) AS i
           FROM tok),
         mrow AS (SELECT doc_id, i,
             CASE WHEN (('0x' || substr(md5('msk' || CAST(doc_id AS VARCHAR)
               || '#' || CAST(i AS VARCHAR)), 1, 13))::BIGINT + 1)
               / 4503599627370496.0 < CAST(0.15 AS DOUBLE)
               THEN '[mask]' ELSE tok END AS ct
           FROM pos),
         carr AS (SELECT doc_id, list(ct ORDER BY i) AS ct
           FROM mrow GROUP BY 1),
         arrs AS (SELECT t.doc_id, t.rt,
             coalesce(c.ct, CAST([] AS VARCHAR[])) AS ct
           FROM tok t LEFT JOIN carr c USING (doc_id)),
         big AS (SELECT doc_id, rt, ct,
             CASE WHEN len(rt) < 2 THEN CAST([] AS VARCHAR[])
               ELSE list_transform(range(1, len(rt)),
                 i -> rt[i] || chr(1) || rt[i + 1]) END AS rb,
             CASE WHEN len(ct) < 2 THEN CAST([] AS VARCHAR[])
               ELSE list_transform(range(1, len(ct)),
                 i -> ct[i] || chr(1) || ct[i + 1]) END AS cb
           FROM arrs),
         stats AS (SELECT doc_id,
             CAST(len(rt) AS BIGINT) AS ref_len,
             CAST(len(ct) AS BIGINT) AS cand_len,
             coalesce(list_sum(list_transform(list_distinct(ct),
               g -> least(len(list_filter(ct, x -> x = g)),
                 len(list_filter(rt, x -> x = g))))), 0) AS m1,
             coalesce(list_sum(list_transform(list_distinct(cb),
               g -> least(len(list_filter(cb, x -> x = g)),
                 len(list_filter(rb, x -> x = g))))), 0) AS m2,
             CAST(len(cb) AS BIGINT) AS nb
           FROM big),
         p AS (SELECT doc_id, ref_len, cand_len,
             CASE WHEN cand_len > 0
               THEN round(CAST(m1 AS DOUBLE) / cand_len, 9) END AS p1,
             CASE WHEN nb > 0
               THEN round(CAST(m2 AS DOUBLE) / nb, 9) END AS p2,
             CASE WHEN cand_len = 0 THEN NULL
               WHEN cand_len >= ref_len THEN 1.0
               ELSE round(exp(1.0 - CAST(ref_len AS DOUBLE) / cand_len), 9)
               END AS bp
           FROM stats)
         SELECT doc_id, ref_len, cand_len,
           round(p1, 6) AS p1, round(p2, 6) AS p2,
           round(bp, 6) AS brevity_penalty,
           round(bp * coalesce(sqrt(p1 * p2), p1), 6) AS bleu2
         FROM p ORDER BY doc_id""",
  ) ++ huberOracle

  /** The q285 IRLS chain: one weighted-stats block per iteration,
    * text-parameterized like the q246 igBlock — iteration 0 at w = 1
    * (plain OLS), then two Huber-reweighted passes against the
    * previous block's params, every weight/product/param on the
    * engine's 9-grid. */
  private def hbBlock(p: String, w: String, from: String): String =
    s"""${p}s AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN round($w, 9) < 1.0 THEN 1 ELSE 0 END)
             AS BIGINT) AS ndw,
           CAST(sum(CAST(round(round($w, 9), 9) AS DECIMAL(38,9)))
             AS DOUBLE) AS sw,
           CAST(sum(CAST(round(round($w, 9) * x, 9) AS DECIMAL(38,9)))
             AS DOUBLE) AS swx,
           CAST(sum(CAST(round(round($w, 9) * y, 9) AS DECIMAL(38,9)))
             AS DOUBLE) AS swy,
           CAST(sum(CAST(round(round($w, 9) * x * x, 9) AS DECIMAL(38,9)))
             AS DOUBLE) AS swxx,
           CAST(sum(CAST(round(round($w, 9) * x * y, 9) AS DECIMAL(38,9)))
             AS DOUBLE) AS swxy
         FROM $from GROUP BY g),
       ${p}p AS (SELECT g, n, ndw,
           round(CASE WHEN sw*swxx - swx*swx <> 0
             THEN (sw*swxy - swx*swy) / (sw*swxx - swx*swx) END, 9) AS b1,
           round(CASE WHEN sw <> 0 THEN (swy -
             round(CASE WHEN sw*swxx - swx*swx <> 0
               THEN (sw*swxy - swx*swy) / (sw*swxx - swx*swx) END, 9)
             * swx) / sw END, 9) AS b0
         FROM ${p}s)"""

  private def huberW(pp: String): String =
    s"""CASE WHEN ${pp}.b0 IS NULL OR ${pp}.b1 IS NULL
          THEN CAST(NULL AS DOUBLE)
        WHEN abs(y - (${pp}.b0 + ${pp}.b1 * x)) <= 10000.0 THEN 1.0
        ELSE 10000.0 / abs(y - (${pp}.b0 + ${pp}.b1 * x)) END"""

  private def huberOracle: Map[String, String] = Map(
    "q285_huber_regression" ->
      s"""WITH rows AS (SELECT l_returnflag AS g,
             CAST(l_quantity AS DOUBLE) AS x,
             CAST(l_extendedprice AS DOUBLE) AS y
           FROM lineitem
           WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
         ${hbBlock("i0", "1.0", "rows")},
         r1 AS (SELECT rows.g, x, y, ${huberW("i0p")} AS w
           FROM rows JOIN i0p ON rows.g = i0p.g),
         ${hbBlock("i1", "w", "r1")},
         r2 AS (SELECT rows.g, x, y, ${huberW("i1p")} AS w
           FROM rows JOIN i1p ON rows.g = i1p.g),
         ${hbBlock("i2", "w", "r2")}
         SELECT g AS l_returnflag, n, ndw AS n_downweighted,
           round(b1, 6) AS slope, round(b0, 6) AS intercept
         FROM i2p ORDER BY l_returnflag""",
  )
}
