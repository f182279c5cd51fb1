package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._
  import Expectations._

  test("check: every rule kind, hand-counted violations") {
    val df = Seq(
      (Some(1L), Some(5.0), "a"),
      (Some(1L), Some(50.0), "b"),  // dup key 1; out of range
      (None, Some(5.0), "c"),       // null key
      (Some(2L), None, "d"),        // null value violates range
      (Some(9L), Some(10.0), "e"))  // key 9 not in dim
      .toDF("k", "v", "s")
    val dim = Seq(1L, 2L, 3L).toDF("id")
    val out = check(df, Seq(
      NotNull("k"),
      InRange("v", 0.0, 10.0),
      Satisfies("s_short", length(col("s")) <= 1),
      Unique(Seq("k")),
      RefIntegrity("k", dim, "id")))
      .as[(String, Long, Long)].collect().map(t => t._1 -> t._2).toMap
    assert(out("not_null(k)") == 1L)
    assert(out("in_range(v,0.0,10.0)") == 2L)  // 50.0 and the null
    assert(out("satisfies(s_short)") == 0L)
    assert(out("unique(k)") == 1L)             // two rows share k=1
    assert(out("ref_integrity(k)") == 1L)      // k=9 orphan; null k skipped
  }

  test("check: satisfies treats null predicate as violation; n_rows rides every row") {
    val df = Seq((Some(1.0)), (None)).toDF("v")
    val out = check(df, Seq(Satisfies("pos", col("v") > 0)))
      .as[(String, Long, Long)].collect().head
    assert(out == (("satisfies(pos)", 1L, 2L)))
    intercept[IllegalArgumentException](check(df, Seq.empty))
  }
}
