package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the data-quality survey a pipeline runs before
  * trusting a new source: per-column null counts, exact distinct
  * cardinality, and the modal value. One operator, one pass, any
  * column mix (values profile through their STRING form, the
  * profiling convention — a profile compares shapes, not types).
  */
object Profile {

  /** Profile `cols` of `df` in one pass: (column, n_rows, n_null,
    * n_distinct, mode_value, mode_n) per column — exact distincts
    * (nulls excluded), mode with smallest-value tie-break (nulls never
    * the mode), `n_rows` repeated per column (it anchors null/distinct
    * ratios downstream). An all-null column profiles as n_distinct 0
    * with a null mode.
    *
    * Scale shape: one `stack` unpivot (narrow, |cols| rows per input
    * row) into a (column, value)-keyed count — map-side combined, so
    * the shuffle carries one row per DISTINCT (column, value), then a
    * |cols|-group rollup. Near-unique columns make that first shuffle
    * O(rows) — inherent to exact distinct counts; profile a sample or
    * switch to the HLL store ([[Sketches]]) when approximate
    * cardinality is enough. Beware profiling FLOAT columns across
    * engines: the string form is the engine's formatter, not a stable
    * contract. */
  def profileTable(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in the frame: $missing")
    val stacked = df.select(expr(
      s"stack(${cols.size}, " +
        cols.map(c => s"'$c', CAST(`$c` AS STRING)").mkString(", ") +
        ") AS (column, value)"))
    val counts = stacked.groupBy(col("column"), col("value"))
      .agg(count(lit(1)).as("__cnt"))
    val base = counts.groupBy(col("column"))
      .agg(sum(col("__cnt")).as("n_rows"),
        coalesce(sum(when(col("value").isNull, col("__cnt"))), lit(0L))
          .as("n_null"))
    val nonNull = counts.filter(col("value").isNotNull)
      .groupBy(col("column"))
      .agg(count(lit(1)).as("n_distinct"),
        min_by(struct(col("value"), col("__cnt")),
          struct((col("__cnt") * -1).as("nc"), col("value"))).as("__m"))
    base.join(nonNull, Seq("column"), "left")
      .select(col("column"), col("n_rows"), col("n_null"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("__m.value").as("mode_value"),
        col("__m.__cnt").as("mode_n"))
  }
}
