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

  /** Nearest as-of: the right row minimizing |right.time - left.time| per
    * key; BACKWARD WINS TIES (an equidistant prior row beats the later
    * one — the convention matching sensor-alignment usage).
    *
    * Shape: the same union as [[backward]], carrying BOTH the
    * latest-prior payload (backward window) and the earliest-later
    * payload (forward window) in one pass — two sorts over ONE hash
    * shuffle on the keys (the exchange is reused; no pair explosion, no
    * second shuffle). The right timestamp rides inside the payload struct
    * (as double — exact to the microsecond within IEEE-754's 2^53, i.e.
    * until year ~2255) so the distance compare is a per-row projection.
    *
    * Times must be numeric or castable to double (timestamps cast to
    * fractional epoch seconds). */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTime: String, rightTime: String,
              payload: Seq[String]): DataFrame = {
    require(!payload.contains("__rt"), "payload name __rt is reserved by nearest()")
    val leftCols = left.columns.toSeq
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val pType = StructType(payload.map(c =>
      StructField(c, right.schema(c).dataType, nullable = true)) :+
      StructField("__rt", DoubleType, nullable = true))
    val nullStruct = lit(null).cast(pType)
    val pStruct = struct((payload.map(col) :+
      col(rightTime).cast("double").as("__rt")).toIndexedSeq: _*)
    val l = left
      .withColumn("__t", col(leftTime).cast("double"))
      .withColumn("__side", lit(0))
      .select((keys.map(col) ++ Seq(col("__t"), col("__side")) ++
        leftCols.filterNot(keys.contains).map(col) :+
        nullStruct.as("__payload")).toIndexedSeq: _*)
    val r = right
      .withColumn("__t", col(rightTime).cast("double"))
      .withColumn("__side", lit(1))
      .select((keys.map(col) ++ Seq(col("__t"), col("__side")) ++
        leftCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) :+
        pStruct.as("__payload")).toIndexedSeq: _*)
    // backward: right-before-left at equal t (<= visible); forward:
    // left-before-right at equal t (>= visible). Ties among right rows
    // sharing a timestamp resolve deterministically via the payload tuple
    // (greatest backward, least forward).
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").desc, col("__payload").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__payload").asc_nulls_first)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = l.unionByName(r)
      .withColumn("__pb", last(col("__payload"), ignoreNulls = true).over(wB))
      .withColumn("__pf", first(col("__payload"), ignoreNulls = true).over(wF))
    val distB = abs(col("__t") - col("__pb").getField("__rt"))
    val distF = abs(col("__pf").getField("__rt") - col("__t"))
    val pick = when(col("__pb").isNull, col("__pf"))
      .when(col("__pf").isNull, col("__pb"))
      .when(distB <= distF, col("__pb"))
      .otherwise(col("__pf"))
    carried.filter(col("__side") === 0)
      .withColumn("__pick", pick)
      .select((leftCols.map(col) ++
        payload.map(c => col("__pick").getField(c).as(c))).toIndexedSeq: _*)
  }

  /** General interval-overlap join WITHOUT an equi key — the binned
    * interval join: two large interval sets joined on the overlap
    * predicate alone would fall back to a nested-loop plan (every
    * range join elsewhere in the catalog carries an equi key or a
    * broadcast band table); here each interval explodes to its
    * fixed-width time bins, pairs meet through a bin EQUI-join, and
    * the exact overlap predicate gates.
    *
    * Exactly-once without a distinct: a pair is emitted only from the
    * bin containing the overlap's START (max of the two starts) — any
    * overlapping pair shares that bin by construction, any shared bin
    * without overlap fails the gate, and no pair is ever produced
    * twice, so there is NO pair-level dedup shuffle. Overlap is
    * INCLUSIVE at the endpoints (touching intervals pair — the
    * [[graft.operators.TimeSeries.mergeIntervals]] touch convention).
    *
    * Endpoints are numeric (cast to long — convert timestamps to
    * epoch units explicitly); rows with null endpoints or start > end
    * drop. Optional `keys` equality pairs restrict matches (null-safe,
    * folded into the join as one hash with an exact null-safe recheck
    * at the gate). `maxBinsPerInterval` is the fail-fast envelope (the
    * corruptSpans discipline): an interval spanning more bins than the
    * cap aborts with a remedy (raise `binWidth` or split giant
    * intervals) instead of exploding one row into millions.
    *
    * Scale shape: work = Σ bins-per-interval rows through ONE
    * bin-keyed equi-join (shuffle partitioned by bin — time-adjacent
    * intervals co-locate), never |A|·|B|. Pick `binWidth` near the
    * median interval length: a few bins per interval, a few intervals
    * per bin. Output: (id_a, id_b, overlap_start, overlap_end). */
  def intervalOverlapJoin(left: DataFrame, leftIdCol: String,
                          leftStartCol: String, leftEndCol: String,
                          right: DataFrame, rightIdCol: String,
                          rightStartCol: String, rightEndCol: String,
                          binWidth: Long,
                          keys: Seq[(String, String)] = Nil,
                          maxBinsPerInterval: Int = 10000): DataFrame = {
    require(binWidth > 0, s"binWidth must be > 0, got $binWidth")
    require(maxBinsPerInterval >= 1,
      s"maxBinsPerInterval must be >= 1, got $maxBinsPerInterval")
    // floor division exact for negative endpoints too (long division
    // truncates toward zero; pmod is always non-negative). The
    // division runs in DECIMAL so full-range long endpoints (e.g. raw
    // nanos > 2^53) never round through a double.
    def fdiv(c: org.apache.spark.sql.Column) =
      ((c - pmod(c, lit(binWidth))).cast("decimal(38,0)") / binWidth)
        .cast("long")
    def side(df: DataFrame, idCol: String, startCol: String,
             endCol: String, keyCols: Seq[String], tag: String) = {
      val s0 = col(startCol).cast("long")
      val e0 = col(endCol).cast("long")
      val bk =
        if (keyCols.isEmpty) struct(lit(0).as("__z"))
        else struct(keyCols.map(col): _*)
      df.filter(s0.isNotNull && e0.isNotNull && s0 <= e0)
        .select(col(idCol).as("__id" + tag), s0.as("__s" + tag),
          e0.as("__e" + tag), bk.as("__bk" + tag),
          xxhash64(bk).as("__kh"), fdiv(s0).as("__b0"),
          fdiv(e0).as("__b1"))
        .filter(assert_true(col("__b1") - col("__b0") < maxBinsPerInterval,
          concat(lit("intervalOverlapJoin: interval "),
            col("__id" + tag).cast("string"),
            lit(s" spans more than $maxBinsPerInterval bins — raise" +
              " binWidth or split giant intervals upstream"))).isNull)
        .select(col("__id" + tag), col("__s" + tag), col("__e" + tag),
          col("__bk" + tag), col("__kh"),
          explode(sequence(col("__b0"), col("__b1"))).as("__bin"))
    }
    val a = side(left, leftIdCol, leftStartCol, leftEndCol,
      keys.map(_._1), "a")
    val b = side(right, rightIdCol, rightStartCol, rightEndCol,
      keys.map(_._2), "b")
    val oS = greatest(col("__sa"), col("__sb"))
    a.join(b, Seq("__kh", "__bin"))
      // exact overlap + the responsibility bin (the overlap start's):
      // emits each true pair exactly once, no distinct needed
      .filter(col("__sa") <= col("__eb") && col("__sb") <= col("__ea") &&
        col("__bin") === fdiv(oS) &&
        (col("__bka") <=> col("__bkb")))
      .select(col("__ida").as("id_a"), col("__idb").as("id_b"),
        oS.as("overlap_start"),
        least(col("__ea"), col("__eb")).as("overlap_end"))
  }
}
