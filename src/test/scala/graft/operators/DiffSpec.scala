package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DiffSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff: added/removed/changed/unchanged, null-safe compare") {
    val a = Seq((1L, "x", 10.0), (2L, "y", 20.0), (3L, "z", 30.0),
      (4L, null.asInstanceOf[String], 40.0))
      .toDF("k", "s", "v")
    val b = Seq((2L, "y", 20.0),   // unchanged
      (3L, "z2", 30.0),            // changed (s)
      (4L, null.asInstanceOf[String], 40.0), // unchanged (null <=> null)
      (5L, "w", 50.0))             // added
      .toDF("k", "s", "v")
    val out = Diff.snapshotDiff(a, b, Seq("k"))
      .select($"k", $"change_type").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "unchanged", 5L -> "added"))
  }

  test("snapshotDiff: null -> value flips count as changed; old/new pairs surface") {
    val a = Seq((1L, null.asInstanceOf[java.lang.Double])).toDF("k", "v")
    val b = Seq((1L, java.lang.Double.valueOf(7.0))).toDF("k", "v")
    val row = Diff.snapshotDiff(a, b, Seq("k")).collect().head
    assert(row.getAs[String]("change_type") == "changed")
    assert(row.isNullAt(row.fieldIndex("v_old")))
    assert(row.getAs[Double]("v_new") == 7.0)
  }

  test("snapshotDiff: explicit compareCols ignores other drift") {
    val a = Seq((1L, "keep", "noise1")).toDF("k", "c1", "c2")
    val b = Seq((1L, "keep", "noise2")).toDF("k", "c1", "c2")
    val out = Diff.snapshotDiff(a, b, Seq("k"), compareCols = Seq("c1"))
    assert(out.select("change_type").as[String].collect().head == "unchanged")
    intercept[IllegalArgumentException](
      Diff.snapshotDiff(a, b, Seq("k"), compareCols = Seq("nope")))
    intercept[IllegalArgumentException](Diff.snapshotDiff(a, b, Seq.empty))
  }
}
