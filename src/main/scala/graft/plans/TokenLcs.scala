package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: token-level longest common subsequence
  * length — the DP primitive under ROUGE-L (generation eval) that no
  * built-in expresses (`levenshtein` is char-level and distance-shaped;
  * ROUGE needs the ORDER-PRESERVING shared token count).
  *
  * Tokenization is the engine's lowercase-whitespace contract, applied
  * INSIDE the expression so both sides see identical tokens regardless
  * of caller casing. The DP is the classic O(n·m) two-rolling-rows
  * recurrence — small integer arithmetic on interned token ids (each
  * side's tokens map to ints first, so the inner loop compares ints,
  * not strings). Designed for SHORT texts (sentences/documents up to a
  * few thousand tokens — the [[JaroWinkler]] scalar-gate envelope); a
  * guard caps n·m at 10^8 cells and fails fast with the chunk-first
  * remedy rather than letting one row burn a task for minutes.
  *
  * Execution shape: `doGenCode` fuses into whole-stage codegen as ONE
  * static call (the [[JaroWinkler]] trade — inlining the DP would
  * bloat generated methods past JIT limits). The rolling rows are
  * thread-local and grown geometrically: zero steady-state allocation.
  *
  * Null contract: null if either side is null (BinaryExpression
  * default); empty/whitespace-only text has zero tokens → LCS 0.
  */
case class TokenLcs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_lcs expects string inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(TokenLcs.lcs(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.TokenLcs.lcs($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TokenLcs {

  /** `token_lcs(a, b)` — LCS length over lowercase-whitespace tokens. */
  def tokenLcs(a: Column, b: Column): Column =
    GraftBridge.column(TokenLcs(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  private val MaxCells = 100000000L

  // per-thread rolling DP rows, grown geometrically
  private val scratch = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](512)
  }

  private def tokensOf(s: String): Array[String] =
    s.toLowerCase.split("\\s+").filter(_.nonEmpty)

  /** Static entry the generated code calls. */
  def lcs(ua: UTF8String, ub: UTF8String): Long = {
    val a = tokensOf(ua.toString)
    val b = tokensOf(ub.toString)
    if (a.length == 0 || b.length == 0) return 0L
    if (a.length.toLong * b.length > MaxCells)
      throw new IllegalArgumentException(
        s"token_lcs: ${a.length} x ${b.length} tokens exceeds the " +
          s"$MaxCells-cell DP envelope — ROUGE-L is a sentence/document " +
          "metric; chunk the texts first")
    // intern tokens of the shorter side, map the longer side to ids
    // (int compares in the hot loop); unseen tokens can never match
    val (sh, lo) = if (a.length <= b.length) (a, b) else (b, a)
    val dict = new java.util.HashMap[String, Integer](sh.length * 2)
    var i = 0
    while (i < sh.length) {
      if (!dict.containsKey(sh(i))) dict.put(sh(i), dict.size())
      i += 1
    }
    val shIds = sh.map(t => dict.get(t).intValue())
    val loIds = lo.map { t =>
      val v = dict.get(t); if (v == null) -1 else v.intValue()
    }
    val width = sh.length + 1
    var rows = scratch.get()
    if (rows.length < 2 * width) {
      rows = new Array[Int](Integer.highestOneBit(2 * width) * 2)
      scratch.set(rows)
    } else java.util.Arrays.fill(rows, 0, 2 * width, 0)
    // rows[0, width) = previous DP row; rows[width, 2*width) = current
    var r = 0
    while (r < loIds.length) {
      val cur = loIds(r)
      var c = 0
      while (c < sh.length) {
        rows(width + c + 1) =
          if (cur >= 0 && cur == shIds(c)) rows(c) + 1
          else math.max(rows(c + 1), rows(width + c))
        c += 1
      }
      System.arraycopy(rows, width, rows, 0, width)
      r += 1
    }
    rows(width - 1).toLong
  }
}
