package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward: latest right row at or before each left row, per key") {
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")),
      (1L, 101L, ts("2024-01-01 12:00:00")),
      (2L, 200L, ts("2024-01-01 11:00:00")))
      .toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00")),
      (1L, ts("2024-01-01 11:30:00")),
      (2L, ts("2024-01-01 12:00:00"))) // after left -> no match
      .toDF("user_id", "signup_ts")
    val out = AsOfJoin.backward(left, right, Seq("user_id"), "ts", "signup_ts",
      Seq("signup_ts"))
      .select("event_id", "signup_ts").as[(Long, Option[Timestamp])]
      .collect().toMap
    assert(out(100L).contains(ts("2024-01-01 09:00:00")))
    assert(out(101L).contains(ts("2024-01-01 11:30:00")))
    assert(out(200L).isEmpty)
  }

  test("backward: right row at exactly the left timestamp matches (<=)") {
    val left = Seq((1L, 100L, ts("2024-01-01 10:00:00"))).toDF("user_id", "event_id", "ts")
    val right = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("user_id", "signup_ts")
    val out = AsOfJoin.backward(left, right, Seq("user_id"), "ts", "signup_ts",
      Seq("signup_ts")).select("signup_ts").as[Option[Timestamp]].collect()
    assert(out.head.contains(ts("2024-01-01 10:00:00")))
  }

  test("backward carries whole rows: null payload fields stay null, no cross-row mixing") {
    val left = Seq((1L, 100L, ts("2024-01-01 12:00:00"))).toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(5L), None: Option[Long]),
      (1L, ts("2024-01-01 11:00:00"), None: Option[Long], Some(7L)))
      .toDF("user_id", "r_ts", "a", "b")
    val out = AsOfJoin.backward(left, right, Seq("user_id"), "ts", "r_ts",
      Seq("a", "b")).select("a", "b")
      .as[(Option[Long], Option[Long])].collect().head
    // nearest prior row is (a=null, b=7): a must be null, not resurrect 5
    assert(out == ((None, Some(7L))))
  }

  test("nearest picks minimal |Δt|; backward wins exact ties; one-sided keys fall back") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // prior 09:59, later 10:02 -> prior
      (1L, 11L, ts("2024-01-01 10:01:30")), // prior 09:59 (2.5 min), later 10:02 (0.5 min) -> later
      (2L, 20L, ts("2024-01-01 10:00:00")), // equidistant 09:59 / 10:01 -> BACKWARD wins
      (3L, 30L, ts("2024-01-01 10:00:00")), // only a later right row exists
      (4L, 40L, ts("2024-01-01 10:00:00"))) // key absent from right -> null
      .toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:59:00")), (1L, ts("2024-01-01 10:02:00")),
      (2L, ts("2024-01-01 09:59:00")), (2L, ts("2024-01-01 10:01:00")),
      (3L, ts("2024-01-01 10:30:00")))
      .toDF("user_id", "r_ts")
    val out = AsOfJoin.nearest(left, right, Seq("user_id"), "ts", "r_ts", Seq("r_ts"))
      .selectExpr("event_id", "CAST(r_ts AS STRING)")
      .as[(Long, Option[String])].collect().toMap
    assert(out(10L).contains("2024-01-01 09:59:00"), s"prior is closer: $out")
    assert(out(11L).contains("2024-01-01 10:02:00"), s"later is closer: $out")
    assert(out(20L).contains("2024-01-01 09:59:00"),
      s"equidistant -> backward wins: $out")
    assert(out(30L).contains("2024-01-01 10:30:00"), s"forward-only fallback: $out")
    assert(out(40L).isEmpty, s"no right rows -> null payload: $out")
  }

  test("backward preserves every left row (left-outer semantics)") {
    val left = Seq(
      (1L, 1L, ts("2024-01-01 01:00:00")),
      (3L, 2L, ts("2024-01-01 02:00:00"))) // key absent from right
      .toDF("user_id", "event_id", "ts")
    val right = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("user_id", "signup_ts")
    val n = AsOfJoin.backward(left, right, Seq("user_id"), "ts", "signup_ts",
      Seq("signup_ts")).count()
    assert(n == 2)
  }
}
