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

  private def bandsPath(store: String) = store + "/bands"
  private def idsPath(store: String)   = store + "/ids"
  private def metaPath(store: String)  = store + "/_graft_buckets"

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** A store exists once its bucket-count marker is durable. The marker is
    * written LAST on creation (after both data appends): a crash mid-append
    * leaves the store invisible, and the replayed batch — which recomputes
    * the same survivors deterministically — re-appends; at worst the bands
    * table briefly holds duplicate rows (harmless: candidate pairs are
    * distinct()-ed), never a marker pointing at missing data. */
  def exists(spark: SparkSession, store: String): Boolean =
    fsOf(spark, store).exists(new org.apache.hadoop.fs.Path(metaPath(store)))

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
    * that would break schema inference on read). */
  def append(sigs: DataFrame, idCol: String, bands: Int, rowsPerBand: Int,
             store: String, numBuckets: Int = DefaultBuckets): Unit = {
    if (sigs.isEmpty) return
    val spark = sigs.sparkSession
    val n = resolveBuckets(spark, store, numBuckets)
    val banded = Dedup.bandedSignatures(sigs, idCol, bands, rowsPerBand)
      .select(col("__id").as("id"), col("band_id"), col("band_hash"),
        bandBucket(col("band_hash"), n).as("bucket"))
    graft.sources.Sinks.appendParquet(banded, bandsPath(store), Seq("bucket"))
    val ids = sigs.select(col(idCol).as("id"), idBucket(col(idCol), n).as("idb"))
    graft.sources.Sinks.appendParquet(ids, idsPath(store), Seq("idb"))
    writeMetaIfAbsent(spark, store, n) // LAST — see exists()
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
