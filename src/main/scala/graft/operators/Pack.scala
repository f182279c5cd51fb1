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
}
