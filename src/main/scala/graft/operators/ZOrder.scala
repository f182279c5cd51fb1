package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional clustering for
  * scan pruning: interleave the bits of several columns' normalized
  * ranks into one sort key, so files/row-groups written in that order
  * are TIGHT in every participating dimension at once. A layout sorted
  * by one column prunes beautifully on it and not at all on the second;
  * a z-ordered layout prunes usefully on all of them — the difference
  * between reading 1% and 100% of 100 TB for a two-predicate query.
  * (The same idea behind Delta's OPTIMIZE ZORDER BY, built here from
  * plain Spark: a codegen'd bit-interleave expression +
  * repartitionByRange + sortWithinPartitions.)
  *
  * Pruning reality check: Spark prunes parquet at ROW-GROUP level from
  * footer min/max stats when predicates push down (file-level pruning
  * is for partition columns). Z-order's job is exactly to make those
  * min/max windows narrow in every dimension; ZOrderSpec measures
  * per-file bounding boxes directly.
  */
object ZOrder {

  /** Interleave the low `bits` bits of already-normalized non-negative
    * integer columns (each in [0, 2^bits)) into the Morton code: bit i
    * of column j lands at position i·k + j (k = number of columns).
    * Pure builtin shift/mask arithmetic — codegen'd, exact, and
    * SQL-expressible (the q204 oracle replays it in DuckDB). */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 2, s"z-order needs >= 2 columns, got $k")
    require(bits >= 1 && k * bits <= 63,
      s"need 1 <= bits and cols*bits <= 63, got $k x $bits")
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
      i * k + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Append `__zrank_<col>` (the min-max-normalized 2^bits-grid rank of
    * each column) and `__z` (their Morton code). Normalization bounds
    * come from ONE agg pass, broadcast; a constant column ranks 0
    * everywhere. Equal values always get equal ranks (ties cannot
    * straddle a z-value), and the mapping is monotone per column. */
  def withZValue(df: DataFrame, colNames: Seq[String],
                 bits: Int = 16): DataFrame = {
    val aggs = colNames.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__lo_$c"),
      max(col(c).cast("double")).as(s"__hi_$c")))
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    val top = (1L << bits) - 1
    val ranked = colNames.foldLeft(df.crossJoin(broadcast(bounds))) {
      (acc, c) =>
        acc.withColumn(s"__zrank_$c",
          when(col(s"__hi_$c") > col(s"__lo_$c"),
            floor((col(c).cast("double") - col(s"__lo_$c")) /
              (col(s"__hi_$c") - col(s"__lo_$c")) * top).cast("long"))
            .otherwise(lit(0L)))
    }
    ranked
      .withColumn("__z",
        zValue(colNames.map(c => col(s"__zrank_$c")), bits))
      .drop(colNames.flatMap(c => Seq(s"__lo_$c", s"__hi_$c")): _*)
  }

  /** Write `df` parquet z-ordered on `colNames`: range-partition by the
    * Morton code into `numFiles` output slices, sort within each, drop
    * the helper columns, write. Range partitioning keeps slices
    * contiguous on the curve (a hash repartition would scatter it), so
    * every file's bounding box is a compact curve segment.
    *
    * Scale shape: ONE bounds agg + one range-exchange of the fact (any
    * clustering rewrite pays that shuffle — it IS the layout change);
    * the sort is per-partition, spillable. Rewrite cadence and file
    * sizing are the caller's compaction policy. */
  def writeZOrdered(df: DataFrame, colNames: Seq[String], path: String,
                    numFiles: Int, bits: Int = 16): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val helper = colNames.map(c => s"__zrank_$c")
    withZValue(df, colNames, bits)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop(helper: _*)
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
