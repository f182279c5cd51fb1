package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-prior-event) join.
  *
  * Spark has no built-in as-of join. A naive range join + row_number
  * explodes candidate pairs; the scalable rewrite is union + ordered
  * window: tag both sides, union on (key, time), and carry the latest
  * right-side payload forward with `last(..., ignoreNulls)` over an
  * unbounded-preceding frame. One shuffle on (key), no pair explosion —
  * this survives 100 TB where the range-join form does not.
  */
object AsOfJoin {

  /** For each left row, attach the payload columns of the latest right row
    * with `right.timeCol <= left.timeCol` and equal `keys` (left-outer:
    * null payload when no prior right row exists).
    *
    * `payload` = right columns to carry (must not collide with left
    * names). The whole payload is carried as ONE struct, so the output is
    * always a genuine right row (never a column-wise mix of different
    * rows), null payload values inside the as-of row are preserved, and
    * ties on (key, time) resolve deterministically to the greatest
    * payload tuple.
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(payload.map(col): _*)
    val nullStruct = lit(null).cast(
      org.apache.spark.sql.types.StructType(payload.map(c =>
        org.apache.spark.sql.types.StructField(c, right.schema(c).dataType,
          nullable = true))))
    // side = 1 for right so that at equal timestamps the right row sorts
    // first and is visible to the left row (<= semantics).
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(0))
      .select((keys.map(col) ++ Seq(col("__t"), col("__side")) ++
        leftCols.filterNot(keys.contains).map(col) :+
        nullStruct.as("__payload")).toIndexedSeq: _*)
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(1))
      .select((keys.map(col) ++ Seq(col("__t"), col("__side")) ++
        leftCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) :+
        payloadStruct.as("__payload")).toIndexedSeq: _*)
    // payload struct joins the ordering so right rows sharing (key, time)
    // resolve deterministically (greatest payload tuple wins)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").desc, col("__payload").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__payload", last(col("__payload"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 0)
      .select((leftCols.map(col) ++
        payload.map(c => col("__payload").getField(c).as(c))).toIndexedSeq: _*)
  }

  /** Forward as-of: earliest right row with `right.timeCol >= left.timeCol`
    * per key. Same union+window shape with the ordering reversed. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTime: String, rightTime: String,
              payload: Seq[String]): DataFrame = {
    val negL = left.withColumn("__negt", -unix_micros(col(leftTime).cast("timestamp")))
    val negR = right.withColumn("__negt", -unix_micros(col(rightTime).cast("timestamp")))
    backward(
      negL, negR, keys, leftTime = "__negt", rightTime = "__negt",
      payload = payload)
      .drop("__negt")
  }
}
