package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq((1L, "a", 1), (2L, "b", 1), (0L, "zero", 1))
    .toDF("k", "v", "ver")

  test("upsert replaces matched keys, inserts new ones, keeps the rest") {
    val updates = Seq((2L, "B", 2), (3L, "C", 2)).toDF("k", "v", "ver")
    val out = Merge.upsert(target, updates, Seq("k"), Seq(col("ver")))
      .orderBy("k").select("k", "v").as[(Long, String)].collect().toSeq
    assert(out == Seq((0L, "zero"), (1L, "a"), (2L, "B"), (3L, "C")))
  }

  test("upsert: last-wins among intra-batch duplicate keys") {
    val updates = Seq((3L, "first", 1), (3L, "last", 9)).toDF("k", "v", "ver")
    val out = Merge.upsert(target, updates, Seq("k"), Seq(col("ver")))
      .filter($"k" === 3L).select("v").as[String].collect().toSeq
    assert(out == Seq("last"))
  }

  test("upsert is idempotent (ON CONFLICT semantics)") {
    val updates = Seq((2L, "B", 2), (3L, "C", 2)).toDF("k", "v", "ver")
    val once = Merge.upsert(target, updates, Seq("k"), Seq(col("ver")))
    val twice = Merge.upsert(once, updates, Seq("k"), Seq(col("ver")))
    assert(once.orderBy("k").collect().toSeq == twice.orderBy("k").collect().toSeq)
  }

  test("insertIfAbsent inserts only unmatched keys; key 0 is a real key") {
    val inserts = Seq((0L, "SHOULD NOT WIN", 2), (4L, "d", 2), (4L, "dup", 3))
      .toDF("k", "v", "ver")
    val out = Merge.insertIfAbsent(target, inserts, Seq("k"), Seq(col("ver")))
      .orderBy("k").select("k", "v").as[(Long, String)].collect().toSeq
    assert(out == Seq((0L, "zero"), (1L, "a"), (2L, "b"), (4L, "d")))
  }

  test("updateColumns overwrites only set columns on matched keys") {
    val updates = Seq((1L, "A2")).toDF("k", "v")
    val out = Merge.updateColumns(target, updates, Seq("k"), Seq("v"))
      .orderBy("k").select("k", "v", "ver").as[(Long, String, Int)].collect().toSeq
    assert(out == Seq((0L, "zero", 1), (1L, "A2", 1), (2L, "b", 1)))
  }

  test("updateColumns can set a matched column to NULL (join marker, not coalesce)") {
    val updates = Seq((1L, None: Option[String])).toDF("k", "v")
    val out = Merge.updateColumns(target, updates, Seq("k"), Seq("v"))
      .orderBy("k").select("k", "v").as[(Long, Option[String])].collect().toSeq
    assert(out == Seq((0L, Some("zero")), (1L, None), (2L, Some("b"))))
  }

  test("updateMisses finds update keys with no target row") {
    val updates = Seq((1L, "x"), (9L, "y")).toDF("k", "v")
    val out = Merge.updateMisses(target, updates, Seq("k"))
      .select("k").as[Long].collect().toSeq
    assert(out == Seq(9L))
  }
}
