package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent MinHash signature store in BANDED, BUCKETED layout — the
  * storage half of incremental/streaming near-dup dedup
  * ([[Dedup.dedupAgainstStore]]).
  *
  * Round 3 stored raw `(id, minhash)` rows, which forced every micro-batch
  * to re-scan and re-band the FULL store before the semi-join could prune
  * anything — O(corpus) work per batch, the scale-killer at a 100 TB
  * corpus with frequent ingest. This layout fixes the access path:
  *
  *  - `<store>/bands/bucket=<b>/…` holds the store's rows in ALREADY-BANDED
  *    form `(id, band_id, band_hash)`, partitioned by
  *    `bucket = pmod(band_hash, numBuckets)`. A batch touches at most its
  *    own band hashes, so the corpus side of candidate generation is a
  *    PARTITION-PRUNED scan of just the touched buckets — work per batch
  *    is O(batch + touched-bucket membership), never O(corpus).
  *  - `<store>/ids/idb=<b>/…` holds one `(id)` row per stored document,
  *    partitioned by `idb = pmod(xxhash64(id), numBuckets)`, so the
  *    replay-guard anti-join reads only the id buckets the batch occupies.
  *  - `<store>/_graft_buckets` pins the bucket count at store creation:
  *    later writers/readers use the pinned value even if called with a
  *    different `numBuckets` (a mismatched modulus would silently read the
  *    wrong partitions).
  *
  * Streaming appends one file set per micro-batch; [[compact]] rewrites
  * each partition directory down to one file (crash-safe tmp/swap via
  * [[graft.sources.Sinks.compactParquet]]) — run it periodically from a
  * maintenance job to bound file counts over a long-lived stream.
  *
  * Single-writer per store path (same contract as the round-3 store).
  */
object SignatureStore {

  val DefaultBuckets = 64

  private def bandsPath(store: String)   = store + "/bands"
  private def idsPath(store: String)     = store + "/ids"
  private def metaPath(store: String)    = store + "/_graft_buckets"
  private def stagingPath(store: String) = store + "/_legacy_migrating"

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def hPath(s: String) = new org.apache.hadoop.fs.Path(s)

  /** True when `store` holds a round-3-style FLAT signature store —
    * `(id, minhash)` parquet data files directly under the root instead of
    * the banded `bands/` + `ids/` subtrees (or a migration of one is
    * staged but unfinished). A flat store carries no bucket marker, so
    * without this check it would read as "absent": its corpus would never
    * be consulted and duplicate ids would be silently re-admitted. */
  def isLegacyLayout(spark: SparkSession, store: String): Boolean = {
    val fs = fsOf(spark, store)
    val root = hPath(store)
    if (!fs.exists(root)) return false
    val flatDataFiles = fs.listStatus(root).exists { s =>
      s.isFile && s.getPath.getName.startsWith("part-") &&
        s.getPath.getName.contains(".parquet")
    }
    flatDataFiles ||
      (fs.exists(hPath(stagingPath(store))) && !fs.exists(hPath(metaPath(store))))
  }

  private def failIfLegacy(spark: SparkSession, store: String): Unit =
    if (isLegacyLayout(spark, store))
      throw new IllegalStateException(
        s"$store holds a legacy FLAT (id, minhash) signature store, which this " +
          "banded/bucketed layout cannot read. Run SignatureStore.migrateLegacy(" +
          "spark, store, idCol, bands, rowsPerBand) ONCE with the same band " +
          "layout the dedup uses, then retry. Refusing to proceed: treating the " +
          "store as absent would silently re-admit already-stored documents.")

  /** A store exists once its bucket-count marker is durable. The marker is
    * written LAST on creation (after both data appends): a crash mid-append
    * leaves the store invisible, and the replayed batch — which recomputes
    * the same survivors deterministically — re-appends after [[append]]
    * clears the orphaned partial subtrees, never a marker pointing at
    * missing data. Fails fast on a legacy flat store (see
    * [[isLegacyLayout]]) rather than reporting it absent. */
  def exists(spark: SparkSession, store: String): Boolean = {
    failIfLegacy(spark, store)
    fsOf(spark, store).exists(hPath(metaPath(store)))
  }

  /** The pinned bucket count, or `requested` for a store not yet created. */
  def resolveBuckets(spark: SparkSession, store: String, requested: Int): Int = {
    val fs = fsOf(spark, store)
    val p = new org.apache.hadoop.fs.Path(metaPath(store))
    if (!fs.exists(p)) requested
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toInt
      finally in.close()
    }
  }

  private def writeMetaIfAbsent(spark: SparkSession, store: String, n: Int): Unit = {
    val fs = fsOf(spark, store)
    val p = new org.apache.hadoop.fs.Path(metaPath(store))
    if (!fs.exists(p)) {
      val out = fs.create(p, false)
      try out.write(n.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  /** Band-hash → storage bucket. `pmod` keeps negative hashes non-negative. */
  def bandBucket(bandHash: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    pmod(bandHash, lit(n.toLong)).cast("int")

  /** Document id → id-store bucket. */
  def idBucket(id: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(id), lit(n.toLong)).cast("int")

  /** Append `(idCol, minhash)` signature rows in banded+bucketed form.
    * No-op for an empty frame (never creates a file-less partition tree
    * that would break schema inference on read).
    *
    * If data subtrees exist WITHOUT the bucket marker, they are orphans of
    * a first append that crashed mid-write — possibly bucketed under a
    * DIFFERENT modulus than this call's. They are deleted before writing:
    * the caller that replays a crashed first batch recomputes the same
    * rows deterministically (the store never became visible), so deletion
    * converges, whereas keeping them would let a re-pinned modulus make
    * pruned reads silently miss the orphaned rows. */
  def append(sigs: DataFrame, idCol: String, bands: Int, rowsPerBand: Int,
             store: String, numBuckets: Int = DefaultBuckets): Unit = {
    failIfLegacy(sigs.sparkSession, store)
    appendInternal(sigs, idCol, bands, rowsPerBand, store, numBuckets)
  }

  /** The write path shared by [[append]] and [[migrateLegacy]] — no legacy
    * check (migration legitimately writes while the staged legacy rows
    * still exist). */
  private def appendInternal(sigs: DataFrame, idCol: String, bands: Int,
                             rowsPerBand: Int, store: String,
                             numBuckets: Int): Unit = {
    if (sigs.isEmpty) return
    val spark = sigs.sparkSession
    val fs = fsOf(spark, store)
    if (!fs.exists(hPath(metaPath(store)))) {
      Seq(bandsPath(store), idsPath(store)).foreach { d =>
        if (fs.exists(hPath(d))) fs.delete(hPath(d), true)
      }
    }
    val n = resolveBuckets(spark, store, numBuckets)
    val banded = Dedup.bandedSignatures(sigs, idCol, bands, rowsPerBand)
      .select(col("__id").as("id"), col("band_id"), col("band_hash"),
        bandBucket(col("band_hash"), n).as("bucket"))
    graft.sources.Sinks.appendParquet(banded, bandsPath(store), Seq("bucket"))
    val ids = sigs.select(col(idCol).as("id"), idBucket(col(idCol), n).as("idb"))
    graft.sources.Sinks.appendParquet(ids, idsPath(store), Seq("idb"))
    writeMetaIfAbsent(spark, store, n) // LAST — see exists()
  }

  /** One-shot migration of a round-3-style FLAT store — `(id, minhash)`
    * parquet files directly under `store` — into the banded/bucketed
    * layout, in place. Pass the SAME `bands`/`rowsPerBand` the dedup will
    * use (banding is baked into the stored rows). Resumable after a crash
    * at any point:
    *
    *  1. flat root data files move (rename) into `_legacy_migrating/`;
    *  2. the staged rows are re-banded and appended (a partial append's
    *     orphans are cleared on resume by the marker-absent cleanup);
    *  3. the bucket marker lands (store becomes visible);
    *  4. the staging directory is deleted.
    *
    * A rerun after step 3 only performs the step-4 cleanup. Until step 3,
    * [[exists]]/[[append]] keep failing fast — the store is never
    * readable-but-incomplete. */
  def migrateLegacy(spark: SparkSession, store: String, idCol: String,
                    bands: Int, rowsPerBand: Int,
                    numBuckets: Int = DefaultBuckets): Unit = {
    val fs = fsOf(spark, store)
    val staging = hPath(stagingPath(store))
    if (fs.exists(hPath(metaPath(store)))) {
      if (fs.exists(staging)) fs.delete(staging, true) // crashed after step 3
      return
    }
    require(isLegacyLayout(spark, store),
      s"no legacy flat store at $store — nothing to migrate")
    fs.mkdirs(staging)
    fs.listStatus(hPath(store)).foreach { s =>
      val name = s.getPath.getName
      if (s.isFile && (name.startsWith("part-") || name == "_SUCCESS"))
        fs.rename(s.getPath, new org.apache.hadoop.fs.Path(staging, name))
    }
    val legacy = spark.read.parquet(stagingPath(store))
      .select(col(idCol), col("minhash"))
    appendInternal(legacy, idCol, bands, rowsPerBand, store, numBuckets)
    fs.delete(staging, true)
  }

  /** Banded rows `(id, band_id, band_hash)` of the touched buckets only —
    * `bucket` is a partition column, so the IN-filter is partition pruning
    * (directories outside `buckets` are never listed into the scan). */
  def readBands(spark: SparkSession, store: String, buckets: Seq[Int]): DataFrame =
    spark.read.parquet(bandsPath(store))
      .filter(col("bucket").isin(buckets: _*))
      .select("id", "band_id", "band_hash")

  /** Stored ids of the touched id-buckets only (partition-pruned). */
  def readIds(spark: SparkSession, store: String, buckets: Seq[Int]): DataFrame =
    spark.read.parquet(idsPath(store))
      .filter(col("idb").isin(buckets: _*))
      .select("id")

  /** All stored ids (maintenance/inspection — not the per-batch path). */
  def allIds(spark: SparkSession, store: String): DataFrame =
    spark.read.parquet(idsPath(store)).select("id")

  /** Rewrite both sub-tables down to one file per partition directory —
    * the periodic maintenance pass that bounds the small-files growth of
    * per-micro-batch appends. Crash-safe (tmp write + swap with
    * recovery-at-entry). */
  def compact(spark: SparkSession, store: String): Unit = {
    graft.sources.Sinks.compactParquet(spark, bandsPath(store), Seq("bucket"))
    graft.sources.Sinks.compactParquet(spark, idsPath(store), Seq("idb"))
  }
}
