package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot comparison: classify every key of two table versions as
  * added / removed / changed / unchanged — the drift report a pipeline
  * runs between yesterday's and today's extraction before promoting a
  * load (the reference re-extracts whole years and upserts blindly,
  * load.py:71; a diff makes the blind upsert auditable).
  */
object Diff {

  /** Row-level diff of two snapshots sharing a key.
    *
    * One full-outer shuffle join on `keys`; the change test is a
    * codegen'd null-safe column comparison (`<=>` per compared column,
    * no hashing — cross-engine-stable and null-correct). Compared
    * columns default to all common non-key columns.
    *
    * At scale this is exactly one co-partitioned join of the two
    * snapshots; if both sides are written bucketed by the key
    * ([[graft.sources.Sinks.writeBucketed]]) it runs with zero
    * exchanges. Output: keys…, `change_type` plus each compared
    * column's old/new pair (`<c>_old`, `<c>_new`) for downstream
    * audit queries.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, keys: Seq[String],
                   compareCols: Seq[String] = Seq.empty): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    val common = a.columns.toSet.intersect(b.columns.toSet) -- keys
    val cmp = if (compareCols.nonEmpty) compareCols else common.toSeq.sorted
    require(cmp.nonEmpty, "no columns to compare")
    require(cmp.forall(common.contains),
      s"compare columns must exist in both snapshots: $cmp vs $common")

    val left  = a.select((keys ++ cmp).map(col): _*)
      .withColumn("__a", lit(1))
    val right = b.select(keys.map(col) ++
      cmp.map(c => col(c).as(s"__b_$c")): _*).withColumn("__b", lit(1))
    val joined = left.join(right, keys, "full_outer")
    val differs = cmp.map(c => !(col(c) <=> col(s"__b_$c")))
      .reduce(_ || _)
    joined.select(
      keys.map(col) ++
        cmp.flatMap(c => Seq(col(c).as(s"${c}_old"),
          col(s"__b_$c").as(s"${c}_new"))) :+
        when(col("__a").isNull, "added")
          .when(col("__b").isNull, "removed")
          .when(differs, "changed")
          .otherwise("unchanged").as("change_type"): _*)
  }
}
