package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: `minhash(text)` → array<bigint> of
  * `numHashes` minima over seeded xxhash64 of k-token shingles.
  *
  * Why native: a MinHash signature is per-row computable — the scale-
  * correct plan has NO shuffle until the (tiny) signature rows. The
  * higher-order-function formulation keeps that shape but evaluates
  * interpreted (HOFs are CodegenFallback), and the explode+aggregate
  * formulation is codegen'd but shuffles every shingle. This expression
  * gets both: one JIT'd loop per row inside whole-stage codegen, zero
  * shuffle. (SURVEY.md §4: custom Expression for hot-path north-star ops.)
  *
  * Hash family: shingle hash = chained XXH64.hashLong over the k token
  * hashes; h_j(s) = XXH64.hashLong(s, seed=j). Engine-internal values
  * (no cross-engine oracle — banding invariants are specced instead).
  */
case class MinHashSignature(child: Expression, shingleSize: Int, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash expects a string column, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[UTF8String], shingleSize, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.MinHashSignature.compute($c, $shingleSize, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {

  /** Static entry point shared by interpreted eval and generated code:
    * lowercase, whitespace-tokenize, hash tokens once, then one pass per
    * shingle updating all `numHashes` minima. */
  def compute(text: UTF8String, shingleSize: Int, numHashes: Int): ArrayData = {
    val toks = text.toString.toLowerCase(java.util.Locale.ROOT).trim.split("\\s+")
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      val b = toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      th(i) = XXH64.hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        b.length, 42L)
      i += 1
    }
    val nShingles = math.max(toks.length - shingleSize + 1, 1)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var s = 0
    while (s < nShingles) {
      // chained hash of the k token hashes in this window
      var h = 0L
      var k = 0
      val kMax = math.min(shingleSize, toks.length - s)
      while (k < kMax) {
        h = XXH64.hashLong(th(s + k), h)
        k += 1
      }
      var j = 0
      while (j < numHashes) {
        val hj = XXH64.hashLong(h, j.toLong)
        if (hj < mins(j)) mins(j) = hj
        j += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }

  def apply(text: Column, shingleSize: Int = 3, numHashes: Int = 32): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(text),
      shingleSize, numHashes))
}
