package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sink layer: how the engine lands data.
  *
  * The reference writes to Postgres row-at-a-time in 1000-row batches
  * (load.py:18-22); the engine's native sink is partitioned parquet, with
  * merge semantics expressed as recompute plans ([[graft.operators.Merge]])
  * + partition overwrite. JDBC remains available for compat via
  * `df.write.jdbc` with `foreachPartition`-style batching handled by Spark.
  *
  * 100 TB rules encoded here:
  *  - partition by a natural key of bounded cardinality (date, region) so
  *    merge rewrites touch only affected partitions (dynamic overwrite);
  *  - target file size via repartition before write (small-files problem);
  *  - no coalesce(1)-style driver funnels outside tests.
  */
object Sinks {

  /** Append (reference ON CONFLICT-free INSERT path). */
  def appendParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Append)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Overwrite only the partitions present in `df` (dynamic partition
    * overwrite) — the scalable form of the reference's keyed UPDATE: the
    * merge plan recomputes affected partitions, this lands them. */
  def overwritePartitions(df: DataFrame, path: String, partitionBy: Seq[String]): Unit = {
    val conf = df.sparkSession.conf
    val prev = conf.getOption("spark.sql.sources.partitionOverwriteMode")
    conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try df.write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*).parquet(path)
    finally {
      prev match {
        case Some(v) => conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None    => conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  private def renameOrThrow(fs: org.apache.hadoop.fs.FileSystem,
                            src: org.apache.hadoop.fs.Path,
                            to: org.apache.hadoop.fs.Path,
                            intactAt: => org.apache.hadoop.fs.Path): Unit =
    if (!fs.rename(src, to))
      throw new java.io.IOException(s"rename $src -> $to failed; " +
        s"existing data is intact at $intactAt")

  /** Crash recovery at entry for the tmp/old swap protocol: if a prior run
    * died between parking dst at `__graft_old` and promoting tmp,
    * `__graft_old` holds the only full copy and dst is absent — restore it
    * first (and discard the dead run's tmp, whose contents may be partial).
    * `__graft_old` is only garbage when dst exists. */
  private def recoverInterruptedSwap(fs: org.apache.hadoop.fs.FileSystem,
                                     dst: org.apache.hadoop.fs.Path,
                                     tmp: org.apache.hadoop.fs.Path,
                                     old: org.apache.hadoop.fs.Path): Unit =
    if (!fs.exists(dst) && fs.exists(old)) {
      fs.delete(tmp, true)
      renameOrThrow(fs, old, dst, old)
    }

  /** Promote a fully-written tmp dir over dst. Swap order keeps a primary
    * copy at every step (old data is parked at `__graft_old`, never deleted
    * before the new data is in place) and every rename's boolean result is
    * checked — rename can return false without throwing (e.g. object-store
    * FileSystem impls), which round 1 silently ignored. */
  private def promoteSwap(fs: org.apache.hadoop.fs.FileSystem,
                          dst: org.apache.hadoop.fs.Path,
                          tmp: org.apache.hadoop.fs.Path,
                          old: org.apache.hadoop.fs.Path): Unit = {
    val hadExisting = fs.exists(dst)
    if (hadExisting) {
      fs.delete(old, true) // stale leftover; dst holds the data, safe to clear
      renameOrThrow(fs, dst, old, dst)
    }
    renameOrThrow(fs, tmp, dst, if (fs.exists(dst)) dst else old)
    if (hadExisting) fs.delete(old, true)
  }

  /** Upsert-to-storage: read current state, apply Merge.upsert, rewrite.
    * At scale, pair with `partitionBy` on the merge key's partition column
    * and [[overwritePartitions]]. */
  def upsertParquet(updates: DataFrame, path: String, keys: Seq[String],
                    tiebreak: Seq[org.apache.spark.sql.Column]): Unit = {
    val spark = updates.sparkSession
    val dst = new org.apache.hadoop.fs.Path(path)
    // resolve the filesystem FROM THE PATH (hdfs://, s3a://, file:, ...) —
    // a java.io.File check would silently miss non-local targets and drop
    // the existing table from the merge
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + "__graft_tmp")
    val old = new org.apache.hadoop.fs.Path(path + "__graft_old")
    recoverInterruptedSwap(fs, dst, tmp, old)
    val merged =
      if (fs.exists(dst))
        graft.operators.Merge.upsert(spark.read.parquet(path), updates, keys, tiebreak)
      else updates
    // write via temp dir then swap: parquet sinks can't read-and-overwrite
    // the same path in one job
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    promoteSwap(fs, dst, tmp, old)
  }

  /** In-place compaction of a (possibly partitioned) parquet table: rewrite
    * down to one file per partition directory (or `targetFiles` files for an
    * unpartitioned table) through the same crash-safe tmp/swap protocol as
    * [[upsertParquet]]. The maintenance pass for append-heavy tables —
    * per-micro-batch streaming appends otherwise grow an unbounded file
    * count (the classic small-files problem: at 100 TB, listing cost and
    * per-file open overhead dominate before data volume does). No-op if the
    * table does not exist. */
  def compactParquet(spark: org.apache.spark.sql.SparkSession, path: String,
                     partitionBy: Seq[String] = Nil, targetFiles: Int = 8): Unit = {
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + "__graft_tmp")
    val old = new org.apache.hadoop.fs.Path(path + "__graft_old")
    recoverInterruptedSwap(fs, dst, tmp, old)
    if (!fs.exists(dst)) return
    val cur = spark.read.parquet(path)
    // hash-repartition on the partition columns: each directory's rows land
    // in exactly one task, so each directory compacts to exactly one file
    val compacted =
      if (partitionBy.nonEmpty) cur.repartition(partitionBy.map(col): _*)
      else cur.repartition(math.max(targetFiles, 1))
    val w = compacted.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(tmp.toString)
    promoteSwap(fs, dst, tmp, old)
  }

  /** Batched upsert over JDBC — the reference's actual sink shape
    * (Postgres INSERT .. ON CONFLICT in 1000-row batches, load.py:18-22,
    * 113-125), generalized: Spark's own `df.write.jdbc` only appends or
    * overwrites, so merge-into-a-live-table needs a per-partition
    * executor-side protocol. Each partition opens one connection and runs
    * a portable two-phase batch: UPDATE the batch, then INSERT exactly the
    * rows the database reported as update-misses. No dialect-specific
    * upsert SQL → works against Postgres, Derby (the test harness), etc.
    *
    * Scale shape: work is distributed (one connection per partition, rows
    * stream through prepared-statement batches — nothing collects to the
    * driver); `repartition(n, keys)` upstream controls fan-in so the
    * database sees a bounded connection count, and key-hash partitioning
    * keeps concurrent writers on DISJOINT key sets (two partitions never
    * race on one key — the update-miss-then-insert window is single-writer
    * per key). Dedupe `df` by key first (Merge.upsert semantics assume one
    * row per key per run).
    *
    * A driver whose executeBatch returns SUCCESS_NO_INFO (-2) gives no
    * per-row miss signal; those rows fall back to per-row UPDATE probes.
    */
  def upsertJdbc(df: DataFrame, url: String, table: String, keys: Seq[String],
                 batchSize: Int = 1000,
                 properties: java.util.Properties = new java.util.Properties()): Unit = {
    val cols = df.columns.toSeq
    require(keys.nonEmpty && keys.forall(cols.contains),
      s"upsert keys $keys must be columns of the frame (${cols.mkString(", ")})")
    val nonKeys = cols.filterNot(keys.contains)
    require(nonKeys.nonEmpty, s"upsertJdbc needs at least one non-key column to update")
    val updateSql = s"UPDATE $table SET ${nonKeys.map(c => s"$c = ?").mkString(", ")} " +
      s"WHERE ${keys.map(c => s"$c = ?").mkString(" AND ")}"
    val insertSql = s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    val colIdx = cols.indices.toArray
    val updOrder = (nonKeys ++ keys).map(cols.indexOf).toArray
    df.foreachPartition { (rows: scala.collection.Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        val conn = java.sql.DriverManager.getConnection(url, properties)
        try {
          conn.setAutoCommit(false)
          val upd = conn.prepareStatement(updateSql)
          val ins = conn.prepareStatement(insertSql)
          def bind(st: java.sql.PreparedStatement, row: org.apache.spark.sql.Row,
                   order: Array[Int]): Unit = {
            var i = 0
            while (i < order.length) {
              st.setObject(i + 1, row.get(order(i))); i += 1
            }
          }
          rows.grouped(batchSize).foreach { batch =>
            batch.foreach { r => bind(upd, r, updOrder); upd.addBatch() }
            val counts = upd.executeBatch()
            var i = 0
            while (i < batch.length) {
              counts(i) match {
                case 0 => bind(ins, batch(i), colIdx); ins.addBatch()
                case java.sql.Statement.SUCCESS_NO_INFO =>
                  // driver gave no miss signal: probe this row individually
                  bind(upd, batch(i), updOrder)
                  if (upd.executeUpdate() == 0) { bind(ins, batch(i), colIdx); ins.addBatch() }
                case _ => ()
              }
              i += 1
            }
            ins.executeBatch()
            conn.commit() // reference commits per batch (load.py:125)
          }
        } catch {
          case e: Throwable => try conn.rollback() catch { case _: Throwable => () }; throw e
        } finally conn.close()
      }
    }
  }

  /** Range-clustered parquet layout: range-repartition on `layoutKeys`
    * then sort within partitions before writing. Every file (and row
    * group) covers a disjoint key range, so parquet min/max statistics
    * make point/range filters on the layout key skip whole files — the
    * single highest-leverage layout decision for a 100 TB table that is
    * filtered on one dominant key (date, tenant, doc range). `files`
    * controls target file count (≈ size/file-size-goal). */
  def clusteredParquet(df: DataFrame, path: String, layoutKeys: Seq[String],
                       files: Int): Unit =
    df.repartitionByRange(files, layoutKeys.map(col): _*)
      .sortWithinPartitions(layoutKeys.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Bucketed (and optionally bucket-sorted) persistent table — the
    * co-located-join layout: two tables bucketed on the SAME keys with
    * the SAME bucket count sort-merge-join with NO shuffle on either
    * side (Spark plans bucket i against bucket i directly), and a
    * groupBy on the bucket keys aggregates shuffle-free too. THE
    * standard answer for a 100 TB fact table repeatedly joined on one
    * key (orders ⋈ lineitem): pay the bucketed write once, skip the
    * dominant exchange on every subsequent join — where
    * [[clusteredParquet]]/[[zOrderedParquet]] optimize SCAN pruning,
    * bucketing optimizes JOIN placement; the same hash-layout idea the
    * engine's own stores use (SignatureStore / TextIndex token
    * buckets), surfaced for general tables.
    *
    * Bucketing metadata lives in the session catalog (`saveAsTable` —
    * plain `parquet(path)` cannot carry it); `path` makes the table
    * external so the data outlives the catalog entry. Read back with
    * `spark.table(table)`. `sortKeys` presorts each bucket file,
    * letting the join skip its Sort when they match the join keys and
    * each bucket holds one file (write with one task per bucket —
    * repartition on the bucket keys first — to guarantee that). */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketKeys: Seq[String], numBuckets: Int,
                    sortKeys: Seq[String] = Nil): Unit = {
    require(bucketKeys.nonEmpty, "bucketKeys must be non-empty")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val base = df.write.format("parquet").mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(numBuckets, bucketKeys.head, bucketKeys.tail: _*)
    val w = if (sortKeys.nonEmpty) base.sortBy(sortKeys.head, sortKeys.tail: _*)
            else base
    w.saveAsTable(table)
  }

  /** Z-value of numeric columns: each column quantizes to a 16-bit
    * ordinal on its OWN [min, max] (the bounds ride as literals —
    * compute them once with one tiny agg), and the ordinals' bits
    * interleave. Nearby z-values are nearby in EVERY dimension, which is
    * the whole point of [[zOrderedParquet]]. Codegen'd builtins only
    * (per-column affine map + a 16-step shift/or fold); nulls map to
    * ordinal 0. */
  def zValue(colsWithBounds: Seq[(org.apache.spark.sql.Column, Double, Double)]): org.apache.spark.sql.Column = {
    require(colsWithBounds.size >= 2, "z-ordering needs >= 2 columns")
    require(colsWithBounds.size <= 4, "16-bit ordinals × >4 dims overflow a long")
    val ordinals = colsWithBounds.map { case (c, lo, hi) =>
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      least(greatest(
        floor((coalesce(c.cast("double"), lit(lo)) - lit(lo)) / lit(span) * lit(65535.0))
          .cast("long"), lit(0L)), lit(65535L))
    }
    val d = ordinals.size
    // bit i of ordinal k lands at position i*d + k — the classic Morton
    // interleave, unrolled to a codegen'd shift/or chain
    (0 until 16).flatMap { i =>
      ordinals.zipWithIndex.map { case (o, k) =>
        shiftleft(o.bitwiseAND(lit(1L << i)).cast("long"), i * (d - 1) + k)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Morton/z-order-clustered parquet layout — the MULTI-key sibling of
    * [[clusteredParquet]]: range layout makes filters on the FIRST key
    * skip files but leaves every other key scattered across all files;
    * interleaving the keys' bits into one z-value and range-writing on
    * THAT gives every participating key locality, so parquet min/max
    * stats skip files for filters on ANY of them (at mildly reduced
    * per-key selectivity — the standard multi-dimensional trade,
    * Delta/Iceberg OPTIMIZE ZORDER semantics). Bounds per column come
    * from one tiny min/max agg; rows are range-partitioned and sorted by
    * z-value so each file covers a compact z-range = a small hyper-box.
    * ZOrderSpec measures the per-file min/max spread of BOTH columns
    * shrinking vs a single-key layout. */
  def zOrderedParquet(df: DataFrame, path: String, layoutKeys: Seq[String],
                      files: Int): Unit = {
    val aggCols = layoutKeys.flatMap(k => Seq(
      min(col(k).cast("double")).as(s"__min_$k"),
      max(col(k).cast("double")).as(s"__max_$k")))
    val boundsRow = df.agg(aggCols.head, aggCols.tail: _*).collect()(0)
    val bounds = layoutKeys.map { k =>
      (col(k),
        Option(boundsRow.getAs[java.lang.Double](s"__min_$k")).map(_.toDouble).getOrElse(0.0),
        Option(boundsRow.getAs[java.lang.Double](s"__max_$k")).map(_.toDouble).getOrElse(0.0))
    }
    df.withColumn("__zv", zValue(bounds))
      .repartitionByRange(files, col("__zv"))
      .sortWithinPartitions(col("__zv"))
      .drop("__zv")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
