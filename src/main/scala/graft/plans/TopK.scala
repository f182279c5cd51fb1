package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k-by-priority as a native aggregate — the mergeable
  * alternative to `row_number() OVER (PARTITION BY g ORDER BY p)` when a
  * partition may be corpus-sized. The window form sorts EVERY row of a
  * group in one task before discarding all but k; this aggregate keeps a
  * k-capped heap per group, partials combine map-side, and only k
  * (priority, id) pairs per group ever cross the shuffle — the
  * [[KllSketchAgg]]/[[FreqSketchAgg]] execution shape applied to exact
  * order statistics. Selection is EXACT and deterministic: the k
  * smallest (priority, id) pairs lexicographically (id is the
  * tie-break), identical to the window form's output.
  *
  * Used by `Splits.weightedSamplePerStratumAgg` (the documented
  * single-giant-stratum escape hatch for Efraimidis–Spirakis sampling);
  * reusable for any bounded per-group selection (cheapest-k candidates,
  * nearest-k by precomputed distance).
  */
case class TopKAgg(priority: Expression, id: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
    with BinaryLike[Expression] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def left: Expression = priority
  override def right: Expression = id

  override def checkInputDataTypes(): TypeCheckResult =
    if (priority.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (double priority, long id), got " +
        s"(${priority.dataType.catalogString}, ${id.dataType.catalogString})")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("priority", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  // max-heap on (priority, id): the head is the WORST of the kept k,
  // evicted whenever a better pair arrives
  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](
      Ordering.Tuple2[Double, Long])

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
                    pair: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(pair)
    else if (Ordering.Tuple2[Double, Long].lt(pair, buf.head)) {
      buf.dequeue(); buf.enqueue(pair)
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val p = priority.eval(input)
    val i = id.eval(input)
    if (p != null && i != null)
      offer(buf, (p.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any =
    new GenericArrayData(buf.toArray.sorted(Ordering.Tuple2[Double, Long])
      .map { case (p, i) =>
        new GenericInternalRow(Array[Any](p, i)): Any
      })

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (p, i) => bb.putDouble(p); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.enqueue((bb.getDouble, bb.getLong)); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): TopKAgg =
    copy(priority = newLeft, id = newRight)
  override def prettyName: String = "top_k_agg"
}

object TopK {
  /** k smallest (priority, id) pairs per group, ascending. */
  def topK(priority: Column, id: Column, k: Int): Column =
    GraftBridge.column(
      TopKAgg(GraftBridge.expression(priority),
        GraftBridge.expression(id), k).toAggregateExpression())
}
