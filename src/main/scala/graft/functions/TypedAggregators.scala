package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregators (`Aggregator[IN, BUF, OUT]`) — the engine's
  * UDAF surface (SURVEY.md §2.B). Registered per-use via
  * `functions.udaf(agg)`; all are commutative + associative so Catalyst
  * runs them partial→final with map-side combine.
  */
object TypedAggregators {

  /** Element-wise mean of float vectors (embedding centroid). Buffer is
    * (running sums, count); merge is element-wise — safe across any
    * partitioning. Empty group → empty vector. */
  class VectorMean(dim: Int)
      extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

    override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

    override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
      // skip nulls (builtin-aggregate convention) AND ragged vectors —
      // zero-padding a short vector would silently bias the centroid
      if (v == null || v.length != dim) return b
      val (acc, n) = b
      var i = 0
      while (i < dim) { acc(i) += v(i); i += 1 }
      (acc, n + 1)
    }

    override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
      var i = 0
      while (i < dim) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }

    override def finish(r: (Array[Double], Long)): Seq[Double] =
      if (r._2 == 0) Seq.empty
      else r._1.map(_ / r._2).toSeq

    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** MinHash signature union: element-wise min of signatures — merges
    * per-document signatures into a group-level signature (e.g. per
    * source/shard near-dup pre-screening). */
  class MinHashUnion(numHashes: Int)
      extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

    override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

    override def reduce(acc: Array[Long], sig: Seq[Long]): Array[Long] = {
      if (sig == null) return acc
      var i = 0
      val m = math.min(numHashes, sig.length)
      while (i < m) { if (sig(i) < acc(i)) acc(i) = sig(i); i += 1 }
      acc
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def finish(r: Array[Long]): Seq[Long] = r.toSeq

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
