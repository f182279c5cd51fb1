package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data preparation: lay documents out on a
  * concatenated token stream and chunk it into fixed-capacity windows
  * (the "packed sequences" fed to an LLM trainer — maximizes tokens per
  * batch instead of padding each doc to max length).
  *
  * Scale shape: packing is inherently sequential WITHIN a stream, so the
  * stream is sharded first — `numShards` independent streams pack in
  * parallel (one hash shuffle), and the within-shard running offset is a
  * sort-based window (spillable). At 100 TB, numShards is thousands (one
  * stream per output shard file); the sequential dependency never exceeds
  * one shard's docs. Deterministic: shard assignment and within-shard
  * order derive from the id alone, so re-runs and incremental builds
  * place every doc identically.
  */
object Pack {

  /** Per-doc placement: shard, absolute token offset within the shard's
    * stream, packed-sequence index (`seq_id` = offset / capacity) and
    * position within that sequence. A doc whose span crosses a capacity
    * boundary starts in `seq_id` and continues into the next sequence
    * (concat-stream semantics — the trainer's attention mask handles doc
    * boundaries; no padding is inserted).
    *
    * `tokenCountCol` must be a non-null integral column (precompute with
    * e.g. `TextFunctions.tokenCount`). */
  def sequencePack(docs: DataFrame, idCol: String, tokenCountCol: String,
                   capacity: Int, numShards: Int,
                   shardExpr: Option[Column] = None): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val shard = shardExpr.getOrElse(pmod(col(idCol), lit(numShards.toLong)))
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("shard", shard.cast("long"))
      .withColumn("offset", coalesce(sum(col(tokenCountCol)).over(w), lit(0L)))
      .withColumn("seq_id", floor(col("offset") / capacity))
      .withColumn("pos_in_seq", col("offset") % capacity)
  }

  /** Sequence-level roll-up of [[sequencePack]] output: how full each
    * packed window is. `n_starting_docs` counts docs whose first token
    * lands in the window; `start_tokens` sums their lengths (tokens of a
    * straddling doc count toward the window it starts in — exact
    * window-fill accounting would split spans, which the trainer's
    * loader does; this is the planner's shard-balance view). */
  def packStats(packed: DataFrame, tokenCountCol: String): DataFrame =
    packed.groupBy(col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_starting_docs"),
        sum(col(tokenCountCol)).as("start_tokens"))

  /** Whole-document bin packing — first-fit decreasing into fixed
    * `capacity` windows: the NO-SPLIT complement of [[sequencePack]]'s
    * concat-stream (packing without cross-sequence contamination:
    * every doc lands entirely inside one window, the trainer pads the
    * slack instead of masking straddles). Docs sort (tokens desc, id
    * asc) per shard and each takes the FIRST bin it fits — the classic
    * FFD guarantee (≤ 11/9·OPT + 1 bins, every bin except at most one
    * more than half full).
    *
    * Execution shape: hash-sharded, then per-shard imperative FFD
    * inside tasks (`flatMapGroups` — the textRank/isotonic
    * per-key-imperative precedent; packing is inherently sequential
    * within a shard, and shards are the parallelism). Per-shard state
    * is one (tokens, id) pair per doc plus one long per open bin —
    * size `numShards` so a shard's docs fit executor memory. A doc
    * larger than `capacity` fails fast with the remedy (chunk it first
    * — [[chunkTokens]]); null/non-positive token counts fail the same
    * way. Deterministic: same input → same placement on any
    * partitioning.
    *
    * Output: (idCol, tokenCountCol, shard, bin_id, pos_in_bin) — bin
    * ids dense from 0 per shard, pos_in_bin the bin load before this
    * doc. */
  def binPackFFD(docs: DataFrame, idCol: String, tokenCountCol: String,
                 capacity: Int, numShards: Int,
                 shardExpr: Option[Column] = None): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val spark = docs.sparkSession
    import spark.implicits._
    val shard = shardExpr.getOrElse(pmod(col(idCol), lit(numShards.toLong)))
    docs
      .select(col(idCol).cast("long").as("__id"),
        col(tokenCountCol).cast("long").as("__t"),
        shard.cast("long").as("__shard"))
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapGroups { (sh, rows) =>
        val items = rows.map(r => (r._2, r._1)).toArray
        items.foreach { case (t, id) =>
          if (t <= 0 || t > capacity) throw new IllegalArgumentException(
            s"binPackFFD: doc $id has $t tokens, outside (0, $capacity] " +
              "— chunk oversized docs first (Pack.chunkTokens) and drop " +
              "empty ones")
        }
        // FFD: descending tokens, id tie-break; first bin that fits
        scala.util.Sorting.quickSort(items)(
          Ordering.Tuple2[Long, Long].on[(Long, Long)] {
            case (t, id) => (-t, id) })
        val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
        items.iterator.map { case (t, id) =>
          var b = 0
          while (b < loads.length && loads(b) + t > capacity) b += 1
          if (b == loads.length) loads += 0L
          val pos = loads(b)
          loads(b) = pos + t
          (id, t, sh, b.toLong, pos)
        }
      }
      .toDF("__id", "__t", "shard", "bin_id", "pos_in_bin")
      .withColumnRenamed("__id", idCol)
      .withColumnRenamed("__t", tokenCountCol)
  }

  /** Bin-level roll-up of [[binPackFFD]] output: docs, used tokens and
    * fill fraction per (shard, bin). */
  def binStats(packed: DataFrame, tokenCountCol: String,
               capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    packed.groupBy(col("shard"), col("bin_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCountCol)).as("used_tokens"))
      .withColumn("fill_frac",
        round(col("used_tokens").cast("double") / capacity, 6))
  }

  /** Context-window chunking (the RAG/embedding-prep shape): each
    * document's token sequence splits into windows of `size` tokens
    * starting every `stride` tokens — consecutive chunks overlap by
    * `size - stride`, every token lands in at least one chunk, the last
    * chunk of a doc may be shorter. Empty/whitespace-only docs produce
    * no chunks. Output: (idCol, chunk_id, n_tokens, chunk_text), one
    * deterministic row per window.
    *
    * Scale shape: a narrow per-row expansion — sequence + posexplode +
    * slice + concat_ws, all codegen'd builtins, no shuffle at all.
    * Fan-out is len/stride rows per doc; downstream writers repartition
    * as they see fit. */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  size: Int, stride: Int): DataFrame = {
    require(size > 0, s"size must be positive, got $size")
    require(stride > 0 && stride <= size,
      s"stride must be in [1, size], got $stride")
    docs
      .select(col(idCol),
        graft.functions.TextFunctions.tokens(col(textCol)).as("__tk"))
      .filter(size_(col("__tk")) > 0)
      .select(col(idCol), col("__tk"),
        posexplode(sequence(lit(0), size_(col("__tk")) - 1, lit(stride)))
          .as(Seq("chunk_id", "__start")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        slice(col("__tk"), col("__start") + 1, lit(size)).as("__chunk"))
      .select(col(idCol), col("chunk_id"),
        size_(col("__chunk")).cast("long").as("n_tokens"),
        concat_ws(" ", col("__chunk")).as("chunk_text"))
  }

  // `size` the parameter shadows functions.size inside chunkTokens
  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)
}
