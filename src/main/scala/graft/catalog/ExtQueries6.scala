package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 batch: the incremental centroid store served against a
  * DuckDB oracle (the r12 verdict's registration task — frozen-anchor
  * assignment is the SQL-replayable q103 shape; three appends vs one
  * one-shot pass is the q313 streamed-≡-batch shape). */
object ExtQueries6 {

  import Catalog._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- incremental centroid store (streaming cluster serving) ----------
    // Anchors pinned as the 4 lowest-id embeddings (4-grid at create),
    // the corpus ingested as three batches; serveGrid folds per-batch
    // DECIMAL partial sums into the one-step Lloyd update of the
    // union. Exactness contract: frozen anchors make the per-batch
    // partials independent, so streamed ≡ one-shot, and the one-shot
    // pass is what the oracle replays (session-cached store, swept on
    // app end).
    "q326_centroid_store" -> ((s, d) => {
      val store = LlmQueries.cachedStore(s, d, "centroid-q326") { p =>
        val emb = t(s, d, "embeddings").filter(col("embedding").isNotNull)
        graft.operators.CentroidStore.create(
          emb.filter(col("vec_id") < 4)
            .select((col("vec_id") + 1L).as("cluster_id"),
              col("embedding").as("centroid")), p)
        (0 to 2).foreach { b =>
          graft.operators.CentroidStore.append(
            emb.filter(pmod(col("vec_id"), lit(3)) === b),
            "embedding", p, b.toLong)
        }
      }
      graft.operators.CentroidStore.serveGrid(s, store)
        .orderBy(col("cluster_id"), col("i"))
    }),

    // --- exact global ntile without the single-partition funnel ----------
    // q51's keyed ntile partitions by status; the GLOBAL form is the
    // one that funnels a corpus through one task when written as
    // ntile().over(Window.orderBy) — Ranks.globalNtile re-expresses it
    // on the bucketed two-level rank machinery with pure integer tile
    // arithmetic. Summarized per tile so the oracle pins every
    // boundary exactly.
    "q327_global_ntile" -> ((s, d) =>
      graft.operators.Ranks.globalNtile(
          t(s, d, "orders").select(col("o_orderkey")),
          "o_orderkey", 7, "tile")
        .groupBy(col("tile"))
        .agg(count(lit(1)).as("n"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy(col("tile"))),

    // --- weight-of-evidence categorical encoding --------------------------
    // Does order priority carry signal about finishing? WoE per
    // priority level + its information-value contribution (Σ iv_term
    // is the classic IV feature screen).
    "q328_woe" -> ((s, d) =>
      graft.operators.Features.woeEncode(
        t(s, d, "orders").select(col("o_orderpriority"),
          (col("o_orderstatus") === "F").cast("int").as("fin")),
        "o_orderpriority", "fin")),

    // --- exact global percent_rank / cume_dist with ties ------------------
    // The corpus-window forms funnel every row through one task;
    // Ranks.globalRankStats walks the value LEVEL grid instead.
    // l_quantity is 50 integer levels with thousands of rows each —
    // the heavy-ties shape that makes tie-correctness the whole test;
    // summarized per level so the oracle pins every shared rank.
    "q329_global_rank_stats" -> ((s, d) =>
      graft.operators.Ranks.globalRankStats(
          t(s, d, "lineitem").select(col("l_quantity")), "l_quantity")
        .filter(col("l_quantity").isNotNull)
        .groupBy(col("l_quantity"))
        .agg(count(lit(1)).as("n"),
          round(min(col("percent_rank")), 6).as("percent_rank"),
          round(min(col("cume_dist")), 6).as("cume_dist"))
        .orderBy(col("l_quantity"))),

    // --- per-group rank stats, giant-group safe ---------------------------
    // The keyed sibling: percent_rank/cume_dist of quantity WITHIN
    // each return flag (one flag holds half the corpus — exactly the
    // group size where the plain keyed window becomes the funnel).
    "q330_grouped_rank_stats" -> ((s, d) =>
      graft.operators.Ranks.groupedRankStats(
          t(s, d, "lineitem").select(col("l_returnflag"),
            col("l_quantity")),
          Seq("l_returnflag"), "l_quantity")
        .filter(col("l_quantity").isNotNull)
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("n"),
          round(min(col("percent_rank")), 6).as("percent_rank"),
          round(min(col("cume_dist")), 6).as("cume_dist"))
        .orderBy(col("l_returnflag"), col("l_quantity"))),

    // --- per-group exact ntile, giant-group safe --------------------------
    "q331_grouped_ntile" -> ((s, d) =>
      graft.operators.Ranks.groupedNtile(
          t(s, d, "orders").select(col("o_orderstatus"),
            col("o_orderkey")),
          Seq("o_orderstatus"), "o_orderkey", 5, "tile")
        .groupBy(col("o_orderstatus"), col("tile"))
        .agg(count(lit(1)).as("n"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy(col("o_orderstatus"), col("tile"))),

    // --- IVF re-anchor served against SQL ---------------------------------
    // The drift-loop close (serve → new anchors → retrain), DRIVER-
    // certified: a Lloyd-trained store is re-anchored onto the 4
    // lowest-id embeddings, and the retrained store's FULL probe
    // (nprobe = k degenerates to brute force regardless of the coarse
    // layout) must reproduce DuckDB's exact cosine top-10 — if retrain
    // lost, duplicated, or mis-keyed one vector, the full probe moves.
    "q332_retrained_topk" -> ((s, d) => {
      val store = LlmQueries.cachedStore(s, d, "ivf-retrain-q332") { p =>
        val emb = t(s, d, "embeddings").filter(col("embedding").isNotNull)
        graft.functions.IvfStore.build(emb, "embedding", "vec_id", p,
          k = 8, iterations = 2)
        graft.functions.IvfStore.retrain(s, p,
          emb.filter(col("vec_id") < 4)
            .select((col("vec_id") + 1L).as("cluster_id"),
              col("embedding").cast("array<double>").as("centroid")))
      }
      import scala.jdk.CollectionConverters._
      val qv = t(s, d, "embeddings").filter(col("vec_id") === 0)
        .select(col("embedding")).collect()(0)
        .getList[Float](0).asScala.toSeq
      // over-fetch (k=14), round, THEN cut by (rounded sim, vec_id) —
      // topK cuts by unrounded cosine, the oracle cuts by the rounded
      // value, so a 4dp tie straddling the rank-10/11 boundary would
      // otherwise make the two sides disagree. The k=14 margin NARROWS
      // the seam, it does not remove it (ADVICE r14): a 4dp tie group
      // spanning >4 vectors across the boundary, or an unrounded tie
      // exactly at the k=14 cut, could still diverge on a different
      // corpus. Accepted for this acceptance query — removing it
      // entirely needs a rank-all-by-rounded-key probe (O(corpus)
      // driver-bounded top-k), which is the wrong engine shape; the
      // test corpora have distinct 4dp sims well clear of the margin.
      graft.functions.IvfStore.topK(s, store, qv, k = 14, nprobe = 4)
        .select(col("vec_id"), round(col("cosine_sim"), 4)
          .as("cosine_sim"))
        .orderBy(col("cosine_sim").desc, col("vec_id"))
        .limit(10)
    }),

    // --- Tukey (boxplot) IQR fences per group -----------------------------
    // The profiling convention beside q175's median/MAD gate: which
    // event types carry values beyond Q1/Q3 ± 1.5 IQR, and how many.
    "q333_tukey_fences" -> ((s, d) =>
      graft.operators.Features.tukeyFences(ev(s, d), "event_type",
        "value")))

  def oracleSql: Map[String, String] = Map(
    // the q103 assignment shape against 4-grid anchors (round-4
    // distances, lowest-cluster tie-break), then per-(cluster, dim)
    // means from round-9 DECIMAL(38,9) partial sums — one DuckDB pass
    // over the union the three appends streamed in; untouched clusters
    // keep their anchor components with n = 0
    "q326_centroid_store" ->
      """WITH a AS (SELECT CAST(vec_id + 1 AS BIGINT) AS cluster_id,
             CAST(i AS INT) AS i,
             round(CAST(embedding[CAST(i AS INT)] AS DOUBLE), 4) AS ac
           FROM embeddings, generate_series(1, 64) AS g(i)
           WHERE vec_id < 4 AND embedding IS NOT NULL),
         d AS (SELECT e.vec_id, a.cluster_id,
             round(sum((CAST(e.embedding[a.i] AS DOUBLE) - a.ac)
               * (CAST(e.embedding[a.i] AS DOUBLE) - a.ac)), 4) AS d2
           FROM embeddings e, a
           WHERE e.embedding IS NOT NULL
           GROUP BY e.vec_id, a.cluster_id),
         best AS (SELECT vec_id, cluster_id,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY d2 ASC, cluster_id ASC) AS rn
           FROM d),
         asg AS (SELECT vec_id, cluster_id FROM best WHERE rn = 1),
         grid AS (SELECT c.cluster_id, CAST(i AS INT) AS i,
             CAST(count(*) AS BIGINT) AS n,
             round(CAST(sum(CAST(round(
                 CAST(e.embedding[CAST(i AS INT)] AS DOUBLE), 9)
               AS DECIMAL(38,9))) AS DOUBLE) / count(*), 4) AS mean
           FROM embeddings e JOIN asg c USING (vec_id),
             generate_series(1, 64) AS g(i)
           WHERE e.embedding IS NOT NULL
           GROUP BY c.cluster_id, i)
         SELECT a.cluster_id, a.i,
           CAST(coalesce(grid.n, 0) AS BIGINT) AS n,
           CASE WHEN grid.n IS NOT NULL THEN grid.mean ELSE a.ac END
             AS mean
         FROM a LEFT JOIN grid ON a.cluster_id = grid.cluster_id
           AND a.i = grid.i
         ORDER BY a.cluster_id, a.i""",

    // ANSI ntile is ANSI ntile — the oracle is the window function
    // itself; the engine side must reproduce every tile boundary
    "q327_global_ntile" ->
      """WITH t AS (SELECT o_orderkey,
             ntile(7) OVER (ORDER BY o_orderkey) AS tile
           FROM orders)
         SELECT tile, CAST(count(*) AS BIGINT) AS n,
           min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
         FROM t GROUP BY tile ORDER BY tile""",

    // identical smoothed-share arithmetic: one conditional-count agg,
    // additive alpha = 0.5 on (category, class) counts with totals
    // inflated by alpha*k, one ln per category
    "q328_woe" ->
      """WITH r AS (SELECT o_orderpriority AS category,
             CAST(o_orderstatus = 'F' AS BIGINT) AS y
           FROM orders WHERE o_orderstatus IS NOT NULL),
         per AS (SELECT category, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(count(*) - sum(y) AS BIGINT) AS n_neg
           FROM r GROUP BY 1),
         tot AS (SELECT CAST(sum(n_pos) AS BIGINT) AS tp,
             CAST(sum(n_neg) AS BIGINT) AS tn,
             CAST(count(*) AS BIGINT) AS k FROM per),
         s AS (SELECT category, n, n_pos, n_neg,
             (CAST(n_pos AS DOUBLE) + 0.5)
               / (CAST(tp AS DOUBLE) + 0.5 * k) AS p,
             (CAST(n_neg AS DOUBLE) + 0.5)
               / (CAST(tn AS DOUBLE) + 0.5 * k) AS q
           FROM per, tot)
         SELECT category, n, n_pos, n_neg,
           round(ln(p / q), 6) AS woe,
           round((p - q) * ln(p / q), 6) AS iv_term
         FROM s ORDER BY category""",

    // ANSI percent_rank/cume_dist are the oracle — constant within a
    // tie group, so min() per level reads the shared value back
    "q329_global_rank_stats" ->
      """WITH r AS (SELECT l_quantity,
             percent_rank() OVER (ORDER BY l_quantity) AS pr,
             cume_dist() OVER (ORDER BY l_quantity) AS cd
           FROM lineitem WHERE l_quantity IS NOT NULL)
         SELECT l_quantity, CAST(count(*) AS BIGINT) AS n,
           round(min(pr), 6) AS percent_rank,
           round(min(cd), 6) AS cume_dist
         FROM r GROUP BY l_quantity ORDER BY l_quantity""",

    "q330_grouped_rank_stats" ->
      """WITH r AS (SELECT l_returnflag, l_quantity,
             percent_rank() OVER (PARTITION BY l_returnflag
               ORDER BY l_quantity) AS pr,
             cume_dist() OVER (PARTITION BY l_returnflag
               ORDER BY l_quantity) AS cd
           FROM lineitem WHERE l_quantity IS NOT NULL)
         SELECT l_returnflag, l_quantity,
           CAST(count(*) AS BIGINT) AS n,
           round(min(pr), 6) AS percent_rank,
           round(min(cd), 6) AS cume_dist
         FROM r GROUP BY l_returnflag, l_quantity
         ORDER BY l_returnflag, l_quantity""",

    "q331_grouped_ntile" ->
      """WITH t AS (SELECT o_orderstatus, o_orderkey,
             ntile(5) OVER (PARTITION BY o_orderstatus
               ORDER BY o_orderkey) AS tile
           FROM orders)
         SELECT o_orderstatus, tile, CAST(count(*) AS BIGINT) AS n,
           min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
         FROM t GROUP BY o_orderstatus, tile
         ORDER BY o_orderstatus, tile""",

    // the q42 brute-force cosine shape, self-hit included (the store
    // indexes the full corpus): a full probe over the RETRAINED
    // layout must reproduce exact top-10
    "q332_retrained_topk" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings
           WHERE vec_id = 0),
         sims AS (
           SELECT e.vec_id,
             round(sum(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)
                 * CAST(q.qe[CAST(i AS INT)] AS DOUBLE))
               / (sqrt(sum(CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)
                     * CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)))
                  * sqrt(sum(CAST(q.qe[CAST(i AS INT)] AS DOUBLE)
                     * CAST(q.qe[CAST(i AS INT)] AS DOUBLE)))), 4)
               AS cosine_sim
           FROM embeddings e, q, generate_series(1, 64) AS g(i)
           WHERE e.embedding IS NOT NULL
           GROUP BY e.vec_id)
         SELECT vec_id, cosine_sim FROM sims
         ORDER BY cosine_sim DESC, vec_id ASC LIMIT 10""",

    // quantile_cont ≡ Spark exact percentile (the q49 parity), fence
    // arithmetic in the identical double chain, boundary comparisons
    // against the UNROUNDED fences
    "q333_tukey_fences" ->
      """WITH r AS (SELECT event_type AS g, CAST(value AS DOUBLE) AS v
           FROM events WHERE value IS NOT NULL),
         q AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
             quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.75) AS q3
           FROM r GROUP BY 1),
         f AS (SELECT g, n, q1, q3,
             q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi
           FROM q),
         c AS (SELECT r.g,
             CAST(sum(CASE WHEN r.v < f.lo THEN 1 ELSE 0 END)
               AS BIGINT) AS n_low,
             CAST(sum(CASE WHEN r.v > f.hi THEN 1 ELSE 0 END)
               AS BIGINT) AS n_high
           FROM r JOIN f USING (g) GROUP BY r.g)
         SELECT f.g AS event_type, f.n, round(f.q1, 4) AS q1,
           round(f.q3, 4) AS q3, round(f.lo, 4) AS lo_fence,
           round(f.hi, 4) AS hi_fence,
           coalesce(c.n_low, 0) AS n_low,
           coalesce(c.n_high, 0) AS n_high
         FROM f LEFT JOIN c ON f.g = c.g ORDER BY event_type""")
}
