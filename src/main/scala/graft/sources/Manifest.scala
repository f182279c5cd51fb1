package graft.sources

import org.apache.spark.sql.SparkSession

/** VERSIONED single-file manifest for persistent stores — the crash-safe
  * visibility protocol shared by the inverted index
  * ([[graft.operators.TextIndex]]) and the HLL sketch store
  * ([[graft.operators.Sketches]]): the manifest is the LAST write of
  * every ingest path (data without a manifest entry is invisible and
  * replay-convergent), and a swap writes version n+1 BEFORE deleting n,
  * so there is never an instant with zero visible manifests — readers
  * pick the highest version, and a crash between the two steps just
  * leaves a stale lower version for the next swap to sweep.
  */
private[graft] object Manifest {

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def hPath(s: String) = new org.apache.hadoop.fs.Path(s)

  /** Marker files `<dir>/<prefix>.<n>` as (version, path), ascending. */
  def versions(fs: org.apache.hadoop.fs.FileSystem, dir: String,
               prefix: String): Seq[(Long, org.apache.hadoop.fs.Path)] = {
    val d = hPath(dir)
    if (!fs.exists(d)) return Seq.empty
    val p = prefix + "."
    fs.listStatus(d).toSeq.flatMap { s =>
      val name = s.getPath.getName
      if (s.isFile && name.startsWith(p) && !name.endsWith("__tmp"))
        name.stripPrefix(p).toLongOption.map(_ -> s.getPath)
      else None
    }.sortBy(_._1)
  }

  def exists(spark: SparkSession, dir: String, prefix: String): Boolean =
    versions(fsOf(spark, dir), dir, prefix).nonEmpty

  /** Content of the HIGHEST manifest version; IllegalArgumentException
    * when none exists. */
  def read(spark: SparkSession, dir: String, prefix: String): String = {
    val fs = fsOf(spark, dir)
    val vs = versions(fs, dir, prefix)
    require(vs.nonEmpty, s"no manifest $prefix at $dir")
    val in = fs.open(vs.last._2)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Write version max+1 (tmp + rename), then delete older versions. */
  def write(spark: SparkSession, dir: String, prefix: String,
            content: String): Unit = {
    val fs = fsOf(spark, dir)
    val old = versions(fs, dir, prefix)
    val next = old.lastOption.map(_._1 + 1).getOrElse(1L)
    val dst = hPath(dir + "/" + prefix + "." + next)
    val tmp = hPath(dir + "/" + prefix + "." + next + "__tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(
        s"rename $tmp -> $dst failed; current manifest is intact")
    old.foreach { case (_, p) => fs.delete(p, false) } // new version durable
  }

  /** Drop every version — the store reads as absent afterwards. */
  def clear(spark: SparkSession, dir: String, prefix: String): Unit = {
    val fs = fsOf(spark, dir)
    versions(fs, dir, prefix).foreach { case (_, p) => fs.delete(p, false) }
  }

  /** One manifest line holding the VISIBLE batch ids plus the RETIRED
    * tombstones ("v1 v2 | r1 r2" — the [[graft.functions.IvfStore]]
    * convention): `retired` keeps batch ids superseded by a compaction
    * recognizable as completed replays, so a micro-batch replayed after
    * its partials were folded into a compaction generation stays a
    * no-op instead of double-counting (the streaming-sink idempotency
    * contract must survive [[compactStore]]). Old manifests without the
    * separator parse as (ids, empty). */
  def fmtBatchLine(batches: Seq[Long], retired: Seq[Long]): String =
    batches.mkString(" ") +
      (if (retired.isEmpty) "" else " | " + retired.mkString(" "))

  /** Inverse of [[fmtBatchLine]]: (visible, retired). */
  def parseBatchLine(line: String): (Seq[Long], Seq[Long]) = {
    val toks = line.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    val (vis, rest) = toks.span(_ != "|")
    (vis.map(_.toLong), rest.drop(1).map(_.toLong))
  }
}
