package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.FreqSketch

/** Mergeable-sketch HEAVY-HITTERS store — "which items dominate each
  * group, over everything ingested so far": the third member of the
  * incremental sketch-store family ([[Sketches]] = how many distinct,
  * [[Quantiles]] = how distributed, this = which ones). A 100 TB
  * pipeline watches top domains per crawl, top tokens per language,
  * top templates per source — re-counting per question is O(corpus),
  * and exact counts per group ARE the group. Misra-Gries sketches
  * (kilobytes per group) bound estimate error by n/maxMapSize — ZERO
  * while a group's distinct-item count stays under the map capacity
  * (the exact regime the oracle exercises) — and merge without losing
  * those bounds.
  *
  * Layout + crash contract: identical to [[Quantiles]]/[[Sketches]]
  * (`ab=` batch partitions, versioned `_graft_freq_meta.<n>` manifest
  * pinning maxMapSize + keys written LAST, replay-idempotent appends,
  * invisible orphans, negative compaction generations).
  */
object HeavyHitters {

  private def sketchesPath(store: String) = store + "/sketches"
  private val MetaPrefix                  = "_graft_freq_meta"

  private[graft] case class FreqMeta(maxMapSize: Int, keys: Seq[String],
                                     batches: Seq[Long],
                                     retired: Seq[Long] = Nil)

  private[graft] def readMeta(spark: SparkSession, store: String): FreqMeta = {
    require(storeExists(spark, store), s"no heavy-hitters store at $store")
    val lines = graft.sources.Manifest.read(spark, store, MetaPrefix)
      .trim.split("\n")
    val head = lines(0).trim.split("\\s+")
    val (vis, ret) = graft.sources.Manifest.parseBatchLine(
      if (lines.length > 2) lines(2) else "")
    FreqMeta(head(0).toInt, lines(1).trim.split("\\s+").toSeq, vis, ret)
  }

  private def writeMeta(spark: SparkSession, store: String, m: FreqMeta): Unit =
    graft.sources.Manifest.write(spark, store, MetaPrefix,
      s"${m.maxMapSize}\n${m.keys.mkString(" ")}\n" +
        graft.sources.Manifest.fmtBatchLine(m.batches, m.retired))

  def storeExists(spark: SparkSession, store: String): Boolean =
    graft.sources.Manifest.exists(spark, store, MetaPrefix)

  /** Per-group frequent-items sketch of `itemCol` — one-pass batch
    * form (map-side combined). */
  def freqSketches(df: DataFrame, keys: Seq[String], itemCol: String,
                   maxMapSize: Int = FreqSketch.DefaultMaxMapSize): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(FreqSketch.sketch(col(itemCol).cast("string"), maxMapSize).as("freq"))

  /** Append one ingest batch's per-group sketches (the shared store
    * contract: first call creates + pins, manifested batchId = replay
    * no-op, single writer). */
  def appendSketches(df: DataFrame, keys: Seq[String], itemCol: String,
                     store: String, batchId: Long,
                     maxMapSize: Int = FreqSketch.DefaultMaxMapSize): Unit = {
    require(keys.nonEmpty, "keys must be non-empty")
    val spark = df.sparkSession
    val meta =
      if (storeExists(spark, store)) {
        val m = readMeta(spark, store)
        require(m.keys == keys,
          s"store $store is keyed by ${m.keys.mkString(", ")}, got ${keys.mkString(", ")}")
        require(m.maxMapSize == maxMapSize,
          s"store $store pins maxMapSize=${m.maxMapSize}, got $maxMapSize — " +
            "mixed map sizes shift the error bound, refuse instead")
        m
      } else FreqMeta(maxMapSize, keys, Seq.empty)
    if (meta.batches.contains(batchId) ||
        meta.retired.contains(batchId)) return // completed replay
    // an empty batch writes nothing: on store creation a rows-less
    // append would manifest an unreadable (schema-less) store, and
    // later it only adds a skeleton dir (the SignatureStore guard)
    if (df.isEmpty) return
    graft.sources.Sinks.overwritePartitions(
      freqSketches(df, keys, itemCol, maxMapSize).withColumn("ab", lit(batchId)),
      sketchesPath(store), Seq("ab"))
    writeMeta(spark, store, meta.copy(batches = meta.batches :+ batchId))
  }

  /** Per-group merged sketches over the manifested batches. */
  def mergedSketches(spark: SparkSession, store: String): DataFrame = {
    val meta = readMeta(spark, store)
    spark.read.parquet(sketchesPath(store))
      .filter(col("ab").isin(meta.batches: _*))
      .groupBy(meta.keys.map(col): _*)
      .agg(FreqSketch.merge(col("freq"), meta.maxMapSize).as("freq"))
  }

  /** Top-k heavy hitters per group over EVERYTHING ingested so far,
    * one output row per (group, rank): (keys…, rank 1-based, item,
    * estimate, lower_bound, upper_bound), ordered inside each group by
    * (estimate DESC, item ASC). O(groups × batches) sketch rows read. */
  def topItems(spark: SparkSession, store: String, k: Int): DataFrame = {
    val meta = readMeta(spark, store)
    mergedSketches(spark, store)
      .select(meta.keys.map(col) :+
        posexplode(FreqSketch.topK(col("freq"), k)).as(Seq("__pos", "__hh")): _*)
      .select(meta.keys.map(col) ++ Seq(
        (col("__pos") + 1).cast("int").as("rank"),
        col("__hh.item").as("item"),
        col("__hh.estimate").as("estimate"),
        col("__hh.lower_bound").as("lower_bound"),
        col("__hh.upper_bound").as("upper_bound")): _*)
  }

  /** Fold manifested batches into one negative generation (shared
    * protocol). Misra-Gries merge is deterministic, so answers are
    * identical before and after whenever the merged sketch is — and in
    * the exact regime (no purges) they are exact either way. */
  def compactStore(spark: SparkSession, store: String): Unit = {
    val meta = readMeta(spark, store)
    if (meta.batches.isEmpty) return
    val gen = math.min(0L, meta.batches.min) - 1L
    val folded = mergedSketches(spark, store).withColumn("ab", lit(gen))
    graft.sources.Sinks.overwritePartitions(folded, sketchesPath(store), Seq("ab"))
    writeMeta(spark, store, meta.copy(batches = Seq(gen),
      retired = (meta.retired ++ meta.batches.filter(_ >= 0)).distinct))
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(sketchesPath(store))
    if (fs.exists(root))
      fs.listStatus(root).foreach { s =>
        val name = s.getPath.getName
        if (s.isDirectory && name.startsWith("ab=") &&
            name.stripPrefix("ab=").toLongOption.exists(_ != gen))
          fs.delete(s.getPath, true)
      }
  }
}
