package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF×PQ serving layout — the full 100 TB ANN story in one
  * store: IVF prunes WHICH partitions a probe scans ([[IvfStore]]'s
  * `cluster=<id>` layout → partition pruning), PQ shrinks WHAT each
  * scanned row costs (m one-byte codes instead of dim floats — the
  * shuffle/scan payload drops ~16×). A store carries BOTH layers over
  * the same batches:
  *
  *  - `<store>/vectors/ab=<b>/cluster=<c>/` — the raw vectors
  *    ([[IvfStore]] owns this layer: frozen centroids in its
  *    manifest, batch append, compaction);
  *  - `<store>/codes/ab=<b>/cluster=<c>/` — the PQ codes, partitioned
  *    IDENTICALLY so an ADC probe and its exact refine prune the same
  *    directories;
  *  - `<store>/_graft_pq_meta.<n>` — the codebooks
  *    ([[PqIndex.saveCodebooks]] bit-exact manifest swap).
  *
  * Crash contract: [[build]] writes codes BEFORE the codebook
  * manifest, and [[append]] writes codes before [[IvfStore.append]]'s
  * vectors-manifest swap — so the codes layer is visible only when
  * both its bytes and the batch registration exist. A crash mid-build
  * leaves a plain working [[IvfStore]] with the PQ layer simply
  * absent ([[pqLayerExists]] false, [[topK]] refuses friendly); a
  * crash mid-append leaves orphan `ab=` dirs no manifest references
  * (invisible, overwritten by the replay).
  *
  * Serving ([[topK]]): probe the frozen centroids (k rows,
  * driver-side), partition-pruned scan of the probed clusters' CODES
  * for the ADC shortlist, then the exact re-rank touches only the
  * shortlist's raw vectors via a broadcast semi-join against the
  * equally-pruned vectors layer — the corpus's floats are never
  * scanned. Same ADC-then-L2 arithmetic as the in-session
  * [[PqIndex.adcRefineTopK]] ∘ [[IvfIndex]] composition, so the
  * spec can assert served ≡ in-session on identical inputs. */
object IvfPqStore {

  private def codesPath(store: String) = store + "/codes"
  private val CodesCol = "pq_codes"

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Both layers present: the IVF store AND the codebook manifest. */
  def pqLayerExists(spark: SparkSession, store: String): Boolean =
    IvfStore.storeExists(spark, store) &&
      PqIndex.codebooksExist(spark, store)

  private def writeCodes(assigned: DataFrame, cb: PqIndex.Codebooks,
                         idCol: String, vecCol: String,
                         store: String): Unit =
    graft.sources.Sinks.overwritePartitions(
      PqIndex.encode(assigned.filter(col(vecCol).isNotNull), vecCol, cb,
          CodesCol)
        .select(col(idCol), col(CodesCol), col("ab"), col("cluster")),
      codesPath(store), Seq("ab", "cluster"))

  /** Train both layers and persist: [[IvfStore.build]] (centroids +
    * cluster-partitioned vectors + its manifest), then PQ codebooks
    * trained on the stored vectors, the codes layer written for every
    * visible batch, and the codebook manifest swapped LAST — the PQ
    * layer's visibility gate. `k = 0` (default) auto-sizes the coarse
    * layer to max(8, round(√n)) — [[IvfIndex.build]]'s measured scale
    * rule; `ksub = 0` (default) auto-sizes the codebooks to min(256,
    * training vectors) — [[PqIndex.train]]'s measured rule (the code
    * byte is paid either way; finer is strictly better). Explicit
    * values pin geometry (the oracle-certified catalog queries do). */
  def build(vectors: DataFrame, vecCol: String, idCol: String,
            store: String, k: Int = 0, iterations: Int = 2,
            m: Int = 8, ksub: Int = 0, pqIterations: Int = 3,
            baseBatchId: Long = 0L): Unit = {
    val spark = vectors.sparkSession
    graft.sources.Manifest.clear(spark, store, "_graft_pq_meta")
    val cp = new org.apache.hadoop.fs.Path(codesPath(store))
    val fs = fsOf(spark, store)
    if (fs.exists(cp)) fs.delete(cp, true)
    IvfStore.build(vectors, vecCol, idCol, store, k, iterations,
      baseBatchId)
    val meta = IvfStore.readMeta(spark, store)
    val raw = spark.read.parquet(IvfStore.vectorsPath(store))
      .filter(col("ab").isin(meta.batches: _*))
    val cb = PqIndex.train(raw, meta.vecCol, meta.idCol, m, ksub,
      pqIterations)
    writeCodes(raw, cb, meta.idCol, meta.vecCol, store)
    PqIndex.saveCodebooks(spark, store, cb) // LAST: PQ layer visible
  }

  /** Append a batch with BOTH layers frozen: assign against the stored
    * centroids, encode against the stored codebooks, codes first, then
    * the vectors layer + manifest swap via [[IvfStore.append]] (which
    * also makes the codes batch visible). Replay of a registered
    * batchId is a no-op. */
  def append(vectors: DataFrame, store: String, batchId: Long): Unit = {
    val spark = vectors.sparkSession
    require(pqLayerExists(spark, store), s"no IVF×PQ store at $store")
    val meta = IvfStore.readMeta(spark, store)
    if (meta.batches.contains(batchId) || meta.retired.contains(batchId))
      return // completed replay (possibly folded away by a compaction)
    val cb = PqIndex.loadCodebooks(spark, store)
    val assigned = IvfIndex.assign(
        vectors.filter(col(meta.vecCol).isNotNull),
        broadcast(IvfStore.centroidsDf(spark, store)),
        meta.vecCol, meta.idCol)
      .select(col(meta.idCol), col(meta.vecCol),
        lit(batchId).as("ab"), col("cluster_id").cast("long").as("cluster"))
    writeCodes(assigned, cb, meta.idCol, meta.vecCol, store)
    IvfStore.append(vectors, store, batchId)
  }

  /** ADC-shortlist + exact-refine top-k over the persisted layout:
    * centroid probe (k rows, driver-side) → partition-pruned CODES
    * scan of the `nprobe` winning clusters scored by the broadcast
    * lookup table → top-`shortlist` by (adc ascending, id) → exact
    * squared-L2 re-rank of just those ids against the equally-pruned
    * vectors layer. Output: (idCol, l2_dist) ascending, id tie-break —
    * the [[PqIndex.adcRefineTopK]] contract served from disk.
    *
    * `shortlist = 0` (default) AUTO-SIZES to
    * max(4·k, ceil(0.7 · scanned)) where `scanned` is the probed
    * clusters' visible code count (one cheap count over the SAME
    * pruned partitions the ADC pass is about to read) — the measured
    * scale rule (SCALE.md round-17): recall tracks shortlist/scanned,
    * and 0.7·scanned reached the IVF exact-refine ceiling (0.940) at
    * BOTH measured scales where every fixed shortlist decays (60:
    * 0.825 → 0.635 across the 2k → 20k decade). Under the auto-k
    * coarse layer, scanned ≈ nprobe·√n, so the auto shortlist is
    * O(√n) per query — quality flat, cost sublinear. Explicit
    * shortlist pins geometry (the oracle-certified catalog queries
    * do). */
  def topK(spark: SparkSession, store: String, queryVec: Seq[Float],
           k: Int, nprobe: Int = 2, shortlist: Int = 0): DataFrame = {
    require(k >= 1 && (shortlist == 0 || shortlist >= k),
      s"need shortlist >= k >= 1 (or 0 = auto-size), got k=$k shortlist=$shortlist")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    require(pqLayerExists(spark, store), s"no IVF×PQ store at $store")
    val meta = IvfStore.readMeta(spark, store)
    val cb = PqIndex.loadCodebooks(spark, store)
    val q = array(queryVec.map(v => lit(v)): _*)
    // k-bounded collect: the centroid table IS tiny by contract
    val probeIds = IvfStore.centroidsDf(spark, store)
      .withColumn("__sim", graft.plans.CosineSimilarity(col("centroid"), q))
      .orderBy(col("__sim").desc_nulls_last, col("cluster_id").asc)
      .limit(nprobe)
      .select(col("cluster_id"))
      .collect().map(_.getLong(0)).toSeq
    def prunedCodes = spark.read.parquet(codesPath(store))
      .filter(col("ab").isin(meta.batches: _*) &&
        col("cluster").isin(probeIds: _*))
    val sl =
      if (shortlist > 0) shortlist
      else {
        // parquet count over the pruned partitions: footer statistics,
        // no column decode — cheap relative to the ADC scan that reads
        // the same directories next
        val scanned = prunedCodes.count()
        math.max(4L * k, math.ceil(0.7 * scanned).toLong)
          .min(Int.MaxValue.toLong).toInt
      }
    val shortIds = prunedCodes
      .withColumn("adc_dist",
        graft.plans.PqCodes.adc(col(CodesCol), PqIndex.lut(queryVec, cb)))
      .filter(col("adc_dist").isNotNull)
      .orderBy(col("adc_dist").asc, col(meta.idCol).asc)
      .limit(sl)
      .select(meta.idCol)
    spark.read.parquet(IvfStore.vectorsPath(store))
      .filter(col("ab").isin(meta.batches: _*) &&
        col("cluster").isin(probeIds: _*))
      .join(broadcast(shortIds), Seq(meta.idCol), "left_semi")
      .withColumn("l2_dist", graft.plans.SquaredL2(col(meta.vecCol), q))
      .select(col(meta.idCol), col("l2_dist"))
      .orderBy(col("l2_dist").asc, col(meta.idCol).asc)
      .limit(k)
  }

  /** Re-anchor the COARSE layer on `newCentroids` with the PQ layer
    * kept consistent — [[IvfStore.retrain]]'s composed sibling (the
    * plain path refuses on a PQ store: codes are partitioned by this
    * store's (ab, cluster), so moving only the vectors would strand
    * them on dead partitions). Codes BYTES never change — PQ encodes
    * raw vectors, not residuals, so a coarse re-anchor only MOVES
    * them: the visible codes re-key to each id's NEW cluster (one
    * id-equi join against the re-assigned vectors, no re-encode) and
    * land under the same new generation, codes BEFORE the one
    * vectors-manifest swap that flips both layers atomically (the
    * [[append]] ordering). Old index served at every crash point;
    * codebooks untouched, so ADC arithmetic is identical before and
    * after — only WHICH partitions a probe prunes to changes. */
  def retrain(spark: SparkSession, store: String,
              newCentroids: DataFrame): Unit = {
    require(pqLayerExists(spark, store), s"no IVF×PQ store at $store")
    val meta = IvfStore.readMeta(spark, store)
    val m2 = IvfStore.retrainWrite(spark, store, newCentroids)
    val gen = m2.batches.head
    // re-key the visible codes to the new assignment: id → new cluster
    // off the just-written generation (invisible until the swap below)
    val newAssign = spark.read.parquet(IvfStore.vectorsPath(store))
      .filter(col("ab") === gen)
      .select(col(meta.idCol), col("cluster"))
    val moved = spark.read.parquet(codesPath(store))
      .filter(col("ab").isin(meta.batches: _*))
      .select(col(meta.idCol), col(CodesCol))
      .join(newAssign, Seq(meta.idCol))
      .select(col(meta.idCol), col(CodesCol), lit(gen).as("ab"),
        col("cluster"))
      .repartition(col("cluster"))
    graft.sources.Sinks.overwritePartitions(moved, codesPath(store),
      Seq("ab", "cluster"))
    IvfStore.retrainCommit(spark, store, m2) // both layers flip here
    val fs = fsOf(spark, store)
    val root = new org.apache.hadoop.fs.Path(codesPath(store))
    if (fs.exists(root))
      fs.listStatus(root).foreach { s =>
        val name = s.getPath.getName
        if (s.isDirectory && name.startsWith("ab=") &&
            name.stripPrefix("ab=").toLongOption.exists(_ != gen))
          fs.delete(s.getPath, true)
      }
  }

  /** Compact BOTH layers into one negative generation: codes fold
    * first (under the new gen dir), then [[IvfStore.compactStore]]
    * swaps the manifest (the visibility pivot for both layers), then
    * superseded codes dirs sweep LAST — readable at every crash
    * point, probe results identical before and after. */
  def compactStore(spark: SparkSession, store: String): Unit = {
    require(pqLayerExists(spark, store), s"no IVF×PQ store at $store")
    val meta = IvfStore.readMeta(spark, store)
    val gen = math.min(0L, meta.batches.min) - 1L
    val folded = spark.read.parquet(codesPath(store))
      .filter(col("ab").isin(meta.batches: _*))
      .select(col(meta.idCol), col(CodesCol), lit(gen).as("ab"),
        col("cluster"))
      .repartition(col("cluster"))
    graft.sources.Sinks.overwritePartitions(folded, codesPath(store),
      Seq("ab", "cluster"))
    IvfStore.compactStore(spark, store)
    val fs = fsOf(spark, store)
    val root = new org.apache.hadoop.fs.Path(codesPath(store))
    if (fs.exists(root))
      fs.listStatus(root).foreach { s =>
        val name = s.getPath.getName
        if (s.isDirectory && name.startsWith("ab=") &&
            name.stripPrefix("ab=").toLongOption.exists(_ != gen))
          fs.delete(s.getPath, true)
      }
  }
}
