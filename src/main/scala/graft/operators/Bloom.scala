package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

/** Bloom-filter prefilters for big-against-small membership tests — the
  * narrow-scan form of decontamination and reference-set pruning.
  *
  * [[Dedup.crossCorpusOverlap]] (q87) is the exact path: hash both
  * sides, shuffle, join. At 100 TB the candidate side's shuffle IS the
  * cost — a bloom filter of the (dim-sized) reference set turns the
  * membership test into a NARROW codegen'd probe over the candidate
  * scan: rows the filter rejects are DEFINITELY absent from the
  * reference (bloom has no false negatives) and never shuffle at all;
  * only the tiny flagged fraction (true hits + the fpp) goes through an
  * exact verification join. The composed result is EXACT — identical to
  * a plain anti-join — which is why q135 carries a real SQL oracle.
  *
  * Build is driver-side-once (the IvfIndex / dim-cache
  * build-once-probe-many pattern): one aggregation pass over the
  * reference produces Spark's own `BloomFilterImpl` binary
  * (`BloomFilterAggregate`, the engine's internal runtime-filter
  * machinery), which then rides every probe plan as a CONSTANT —
  * `BloomFilterMightContain` requires a constant or scalar subquery, so
  * the filter participates in whole-stage codegen rather than a join.
  * Size the filter by `expectedItems`/`fpp` (bits via the standard
  * m = -n·ln(p)/ln²2); a reference too large to sit in a broadcast-
  * sized filter belongs on the exact path instead.
  */
object Bloom {

  /** Serialized bloom filter of `xxhash64(keyCol)` over `ref` — ONE
    * aggregation job at call time (build-once; reuse the bytes across
    * probes). `expectedItems <= 0` counts the reference first (a second
    * tiny job — pass the known size to skip it). Returns null for an
    * EMPTY reference (the aggregate has nothing to serialize) —
    * [[decontaminate]] treats that as "nothing to remove". */
  def build(ref: DataFrame, keyCol: String, expectedItems: Long = 0L,
            fpp: Double = 0.01): Array[Byte] = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val n = if (expectedItems > 0) expectedItems
            else math.max(ref.count(), 1L)
    val numBits = math.max(64L,
      math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    ref.agg(GraftBridge.column(
        new BloomFilterAggregate(
          GraftBridge.expression(xxhash64(col(keyCol))),
          Literal(n), Literal(numBits)).toAggregateExpression()).as("b"))
      .collect()(0).getAs[Array[Byte]](0)
  }

  /** Codegen'd membership probe against a built filter: true = POSSIBLY
    * present (false positives at the build fpp), false = definitely
    * absent. */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    GraftBridge.column(BloomFilterMightContain(
      Literal(bloomBytes), GraftBridge.expression(xxhash64(key))))
  }

  /** EXACT decontamination with a bloom fast path: returns the
    * candidate rows whose `keyCol` does NOT appear in
    * `reference.refKeyCol` — row-for-row identical to a plain anti-join
    * (spec + q135 oracle), but only the bloom-flagged fraction of
    * candidates (true contaminated + ~fpp of the rest) ever reaches the
    * verification join; everything else passes through the narrow scan
    * untouched. */
  def decontaminate(candidates: DataFrame, keyCol: String,
                    reference: DataFrame, refKeyCol: String,
                    expectedItems: Long = 0L,
                    fpp: Double = 0.01): DataFrame = {
    val bytes = build(reference.select(col(refKeyCol)), refKeyCol,
      expectedItems, fpp)
    if (bytes == null) return candidates // empty reference: nothing to remove
    val flagged = candidates.withColumn("__hit",
      mightContain(bytes, col(keyCol)))
    val clean = flagged.filter(!col("__hit"))
    val verified = flagged.filter(col("__hit"))
      .join(reference.select(col(refKeyCol).as(keyCol)),
        Seq(keyCol), "left_anti")
    clean.unionByName(verified).drop("__hit")
  }
}
