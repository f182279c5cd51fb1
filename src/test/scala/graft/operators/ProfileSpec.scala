package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profileTable: nulls, exact distincts, mode with tie-break, all-null column") {
    val df = Seq(
      (1L, Some("x"), Option.empty[String]),
      (2L, Some("y"), None),
      (3L, Some("x"), None),
      (4L, None, None))
      .toDF("id", "cat", "dead")
    val out = Profile.profileTable(df, Seq("id", "cat", "dead"))
      .as[(String, Long, Long, Long, Option[String], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    // id: unique longs -> 4 distinct, mode ties broken by min string "1"
    assert(out("id") == ("id", 4L, 0L, 4L, Some("1"), Some(1L)), s"$out")
    // cat: x beats y on count; one null
    assert(out("cat") == ("cat", 4L, 1L, 2L, Some("x"), Some(2L)))
    // dead: all null -> zero distinct, null mode
    assert(out("dead") == ("dead", 4L, 4L, 0L, None, None))
    intercept[IllegalArgumentException](Profile.profileTable(df, Nil))
    intercept[IllegalArgumentException](
      Profile.profileTable(df, Seq("nope")))
  }
}
