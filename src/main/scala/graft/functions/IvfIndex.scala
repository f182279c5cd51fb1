package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** IVF (inverted-file) approximate nearest-neighbor index — the coarse-
  * quantizer scale path for similarity search (complements the
  * random-hyperplane LSH variant in [[VectorFunctions]]).
  *
  * Train: deterministic k-means-style clustering — initial centroids are
  * the k lowest-id vectors, then `iterations` Lloyd rounds of
  * (assign to max-cosine centroid, recompute centroid = element-wise
  * mean). All steps are DataFrame plans: assignment is a broadcast cross
  * join against the (small) centroid set + keep-best aggregation; the
  * mean is the [[TypedAggregators.VectorMean]] UDAF (map-side combined).
  *
  * Query: score the query against the k centroids, probe only the
  * `nprobe` nearest clusters, brute-force within them. At 100 TB the
  * probed fraction (~nprobe/k of the corpus) is the whole point —
  * partition the indexed table by `cluster_id` on disk so a probe is a
  * partition-pruned scan.
  */
object IvfIndex {

  /** A built index. The centroid frame is persisted for the index's
    * lifetime (every probe and the assignment lineage read it); the caller
    * owns that lifecycle — `close()` unpersists. Queries planned before
    * `close()` still compute correctly afterwards (lineage is intact),
    * they just re-run the clustering. */
  final case class Index(indexed: DataFrame, centroids: DataFrame) extends AutoCloseable {
    override def close(): Unit = { centroids.unpersist(); () }
  }

  /** Assign every vector to its best centroid (max cosine, ties to the
    * lowest centroid id). `centroids` must be small (broadcast).
    * Shared with [[IvfStore]] so the persisted index's assignment is
    * BIT-identical to the in-session one. */
  private[functions] def assign(vectors: DataFrame, centroids: DataFrame,
                                vecCol: String, idCol: String): DataFrame = {
    val scored = vectors
      .crossJoin(broadcast(centroids.select(
        col("cluster_id"), col("centroid"))))
      .withColumn("__sim",
        graft.plans.CosineSimilarity(col(vecCol), col("centroid")))
      .drop("centroid")
    // keep-best: max sim, then lowest cluster_id — deterministic
    Dedup.keepFirst(scored, Seq(idCol),
      Seq(col("__sim").desc_nulls_last, col("cluster_id").asc))
      .drop("__sim")
  }

  /** Build the index: returns an [[Index]] of (vectors + `cluster_id`,
    * centroids).
    *
    * `k = 0` (the default) AUTO-SIZES the centroid count to
    * max(8, round(√n)) — the measured scale rule (SCALE.md round-16):
    * with k ∝ √n and a fixed `nprobe`, the probed corpus fraction is
    * nprobe/√n and per-query work stays O(√n), and recall@10 held
    * ~0.94 across a 2k -> 20k decade where a FIXED k=8 read 0.77/0.835
    * (8 centroids under-partition any real corpus, and a fixed k
    * probes a fixed — linear-work — fraction). Auto mode costs one
    * count() of the non-null vectors. Pass an explicit k to pin
    * geometry (the catalog's oracle-pinned queries do).
    *
    * The centroid frame is tiny (k rows) and feeds every later stage —
    * it is persisted so probes and the assigned frame don't re-run the
    * iterative clustering lineage; the caller unpersists via
    * `Index.close()`. Null vectors are excluded up front. */
  def build(vectors: DataFrame, vecCol: String, idCol: String,
            k: Int = 0, iterations: Int = 2): Index = {
    require(k >= 0, s"k must be >= 1 (or 0 = auto-size), got $k")
    val clean = vectors.filter(col(vecCol).isNotNull)
    val kEff =
      if (k == 0)
        math.max(8L, math.round(math.sqrt(clean.count().toDouble))).toInt
      else k
    val dimRow = clean.select(size(col(vecCol)).as("d")).limit(1).collect()
    require(dimRow.nonEmpty, "IvfIndex.build: no non-null vectors to index")
    val dim = dimRow(0).getInt(0)
    val mean = udaf(new TypedAggregators.VectorMean(dim))
    // deterministic seeding: the k lowest-id vectors
    var centroids = clean.orderBy(col(idCol).asc).limit(kEff)
      .select(row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col(idCol)))
          .cast("long").as("cluster_id"),
        col(vecCol).cast("array<double>").as("centroid"))
    var assigned = assign(clean, centroids, vecCol, idCol)
    for (_ <- 1 to iterations) {
      centroids = assigned
        .groupBy(col("cluster_id"))
        .agg(mean(col(vecCol).cast("array<float>")).as("centroid"))
      assigned = assign(clean, centroids, vecCol, idCol)
    }
    val pinned = centroids.persist()
    pinned.count() // materialize so downstream plans reuse, not re-cluster
    Index(assign(clean, pinned, vecCol, idCol), pinned)
  }

  /** Batch kNN JOIN: for EVERY query row, its top-k corpus neighbors
    * by cosine — the all-queries-at-once form [[topK]]'s single-vector
    * probe cannot batch (N driver dispatches for N queries, the
    * pre-q128 BM25 bottleneck). The retrieval/eval sweep primitive:
    * score a whole query table against the corpus in ONE job.
    *
    * Shape: queries rank the k-row centroid table on a broadcast
    * (keyed window — per-query, never global), explode to `nprobe`
    * (query, cluster) probes, then ONE equi-join on `cluster_id`
    * against the indexed corpus — work is Σ probed-cluster sizes, not
    * |Q|·|corpus|. Each corpus row lives in exactly one cluster, so
    * candidates are already distinct per (query, corpus) pair. With
    * the [[IvfStore]] layout the same join becomes a partition-pruned
    * scan per probed cluster. Per-query top-k is a keyed window.
    *
    * Determinism: candidates compare on the `grid`-rounded cosine with
    * id tie-break (the Mmr rounded-grid convention), so the selection
    * is bit-reproducible and — at full probe (`nprobe` ≥ k_clusters),
    * where results are EXACT brute force — SQL-oracle-able.
    * Below full probe results are approximate (recall measured in
    * AnnRecallSpec, the q76 adjudication).
    *
    * Output: (qIdCol, idCol, cosine_sim) — ≤ k rows per query, null
    * query vectors dropped. */
  def knnJoin(index: Index, queries: DataFrame, qIdCol: String,
              qVecCol: String, vecCol: String, idCol: String, k: Int,
              nprobe: Int = 2, grid: Int = 6): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val w = org.apache.spark.sql.expressions.Window
    val probeW = w.partitionBy(col("__qid"))
      .orderBy(col("__csim").desc_nulls_last, col("cluster_id").asc)
    val probes = queries.filter(col(qVecCol).isNotNull)
      .select(col(qIdCol).as("__qid"), col(qVecCol).as("__qv"))
      .crossJoin(broadcast(index.centroids.select(
        col("cluster_id"), col("centroid"))))
      .withColumn("__csim",
        graft.plans.CosineSimilarity(col("__qv"), col("centroid")))
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nprobe)
      .select(col("__qid"), col("__qv"), col("cluster_id"))
    val rankW = w.partitionBy(col("__qid"))
      .orderBy(col("__sim").desc_nulls_last, col(idCol).asc)
    probes.join(index.indexed, Seq("cluster_id"))
      .withColumn("__sim",
        round(graft.plans.CosineSimilarity(col(vecCol), col("__qv")), grid))
      .withColumn("__rk", row_number().over(rankW))
      .filter(col("__rk") <= k)
      .select(col("__qid").as(qIdCol), col(idCol),
        col("__sim").as("cosine_sim"))
  }

  /** Batch RADIUS join: for every query row, ALL corpus neighbors at
    * cosine ≥ `threshold` — the range-search complement to [[knnJoin]]
    * (top-k answers "the best k whatever they score"; radius answers
    * "everything genuinely close", the primitive behind duplicate
    * sweeps and recall-complete candidate generation where a fixed k
    * either truncates dense neighborhoods or pads sparse ones).
    *
    * Same shape as [[knnJoin]]: per-query centroid ranking on a
    * broadcast, `nprobe` (query, cluster) probes, ONE cluster-keyed
    * equi-join — work is Σ probed-cluster sizes, never |Q|·|corpus| —
    * then a narrow threshold filter instead of the top-k window (no
    * per-query sort at all: the output is gate-selected, not ranked).
    * The gate compares on the `grid`-rounded cosine (deterministic
    * boundary resolution, the [[knnJoin]] convention). At full probe
    * (`nprobe` ≥ k_clusters) results are EXACT and SQL-oracle-able;
    * below, approximate with recall governed by the same probe
    * geometry AnnRecallSpec measures. `includeSelf = false` drops
    * qid = id matches for self-join sweeps. Output: (qIdCol, idCol,
    * cosine_sim), unbounded rows per query by design — the threshold
    * is the valve. */
  def radiusJoin(index: Index, queries: DataFrame, qIdCol: String,
                 qVecCol: String, vecCol: String, idCol: String,
                 threshold: Double, nprobe: Int = 2, grid: Int = 6,
                 includeSelf: Boolean = true): DataFrame = {
    require(threshold >= -1.0 && threshold <= 1.0,
      s"threshold must be in [-1, 1], got $threshold")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val w = org.apache.spark.sql.expressions.Window
    val probeW = w.partitionBy(col("__qid"))
      .orderBy(col("__csim").desc_nulls_last, col("cluster_id").asc)
    val probes = queries.filter(col(qVecCol).isNotNull)
      .select(col(qIdCol).as("__qid"), col(qVecCol).as("__qv"))
      .crossJoin(broadcast(index.centroids.select(
        col("cluster_id"), col("centroid"))))
      .withColumn("__csim",
        graft.plans.CosineSimilarity(col("__qv"), col("centroid")))
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nprobe)
      .select(col("__qid"), col("__qv"), col("cluster_id"))
    val joined = probes.join(index.indexed, Seq("cluster_id"))
      .withColumn("__sim",
        round(graft.plans.CosineSimilarity(col(vecCol), col("__qv")), grid))
      .filter(col("__sim") >= threshold)
    (if (includeSelf) joined
     else joined.filter(col("__qid") =!= col(idCol)))
      .select(col("__qid").as(qIdCol), col(idCol),
        col("__sim").as("cosine_sim"))
  }

  /** Probe the `nprobe` clusters nearest to `queryVec`, brute-force
    * cosine within them, return top-k (sim desc, id asc). */
  def topK(indexed: DataFrame, centroids: DataFrame, vecCol: String,
           idCol: String, queryVec: Seq[Float], k: Int,
           nprobe: Int = 2): DataFrame = {
    val q = array(queryVec.map(v => lit(v)): _*)
    val probeClusters = centroids
      .withColumn("__sim", graft.plans.CosineSimilarity(col("centroid"), q))
      .orderBy(col("__sim").desc_nulls_last, col("cluster_id").asc)
      .limit(nprobe)
      .select("cluster_id")
    indexed
      .join(broadcast(probeClusters), Seq("cluster_id"), "left_semi")
      .withColumn("cosine_sim", graft.plans.CosineSimilarity(col(vecCol), q))
      .select(col(idCol), col("cosine_sim"))
      .orderBy(col("cosine_sim").desc_nulls_last, col(idCol).asc)
      .limit(k)
  }
}
