package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline): the rows no other row strictly
  * dominates — dominate = ≥ in both dimensions and > in at least one
  * (both maximized; negate a column to minimize it).
  *
  * Distributed two-phase staircase:
  *  1. per-x reduction — only `max(y)` per distinct x can be
  *     non-dominated (exact-duplicate (x, ymax) rows all survive by the
  *     strict-dominance definition, so the dup count rides along);
  *  2. local staircase per hash bucket of x — a windowed running
  *     `max(y)` over `x desc` inside each bucket removes points some
  *     bucket-mate dominates (sound: dominance is global, so any local
  *     domination is real);
  *  3. global staircase over the survivors — each bucket contributes at
  *     most its own frontier (O(√n) expected for independent dims), so
  *     the final single-partition window sees a tiny input, the same
  *     shape as every TopK tail in this repo.
  *
  * Phase 2/3 windows use `orderBy(x desc, y desc)` with a
  * 1-PRECEDING running max, so equal-x points compare against the best
  * y of strictly-greater x (equal-x, lower-y points were already folded
  * by phase 1).
  */
object Skyline {

  def pareto(df: DataFrame, xCol: String, yCol: String,
             buckets: Int = 64): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val perX = df.groupBy(col(xCol))
      .agg(max(col(yCol)).as("__ymax"), count(lit(1)).as("__n"))
      // rows at (x, ymax) survive; lower-y rows at the same x are
      // dominated unless they tie ymax — count the ties for the caller
    val withTies = df.join(perX, xCol)
      .filter(col(yCol) === col("__ymax"))
      .groupBy(col(xCol), col(yCol))
      .agg(count(lit(1)).as("n_rows"))

    def staircase(in: DataFrame, w: org.apache.spark.sql.expressions.WindowSpec) =
      in.withColumn("__pm",
          max(col(yCol)).over(w.orderBy(col(xCol).desc, col(yCol).desc)
            .rowsBetween(Window.unboundedPreceding, -1)))
        .filter(col("__pm").isNull || col(yCol) > col("__pm"))
        .drop("__pm")

    val local = staircase(withTies,
      Window.partitionBy(pmod(hash(col(xCol)), lit(buckets))))
    staircase(local, Window.partitionBy())
  }
}
