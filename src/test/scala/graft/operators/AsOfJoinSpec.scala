package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

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

  // ---- binned interval-overlap join ------------------------------------

  private def intervalsA = Seq(
    (1L, Some(0L), Some(10L)),   // overlaps b1, touches b2 at 10
    (2L, Some(20L), Some(30L)),  // contains b3
    (3L, Some(50L), Some(50L)),  // point interval
    (4L, Some(100L), Some(90L)), // negative length -> dropped
    (5L, None: Option[Long], Some(5L)), // null -> dropped
    (6L, Some(200L), Some(230L)) // disjoint from every b
  ).toDF("id", "s", "e")

  private def intervalsB = Seq(
    (11L, 5L, 8L),      // inside a1
    (12L, 10L, 15L),    // touches a1 at exactly 10
    (13L, 22L, 25L),    // inside a2
    (14L, 60L, 70L),    // no partner
    (15L, 49L, 50L)     // touches a3's point
  ).toDF("id", "s", "e")

  private def bruteOverlap(a: org.apache.spark.sql.DataFrame,
                           b: org.apache.spark.sql.DataFrame) =
    a.filter(col("s").isNotNull && col("e").isNotNull && col("s") <= col("e"))
      .select(col("id").as("id_a"), col("s").as("sa"), col("e").as("ea"))
      .crossJoin(b.filter(col("s").isNotNull && col("e").isNotNull &&
          col("s") <= col("e"))
        .select(col("id").as("id_b"), col("s").as("sb"), col("e").as("eb")))
      .filter(col("sa") <= col("eb") && col("sb") <= col("ea"))
      .select(col("id_a"), col("id_b"),
        greatest(col("sa"), col("sb")).as("overlap_start"),
        least(col("ea"), col("eb")).as("overlap_end"))
      .as[(Long, Long, Long, Long)].collect().toSet

  test("intervalOverlapJoin ≡ the naive range join at several bin " +
    "widths — touch pairs, containment, point intervals, negative and " +
    "null intervals dropped; every pair emitted exactly once") {
    val want = bruteOverlap(intervalsA, intervalsB)
    assert(want.exists(r => r._1 == 1L && r._2 == 12L), "touch pair present")
    assert(want.exists(r => r._1 == 3L && r._2 == 15L), "point touch present")
    for (bw <- Seq(1L, 7L, 100L, 1000L)) {
      val rows = AsOfJoin.intervalOverlapJoin(
          intervalsA, "id", "s", "e", intervalsB, "id", "s", "e", bw)
        .as[(Long, Long, Long, Long)].collect()
      assert(rows.toSet == want, s"binWidth $bw")
      assert(rows.length == want.size, s"binWidth $bw exactly-once")
    }
  }

  test("intervalOverlapJoin: keys restrict pairs (null-safe — null " +
    "keys pair with null)") {
    val a = Seq((1L, 0L, 100L, "x"), (2L, 0L, 100L, "y"),
        (3L, 0L, 100L, null.asInstanceOf[String]))
      .toDF("id", "s", "e", "k")
    val b = Seq((11L, 50L, 60L, "x"),
        (12L, 50L, 60L, null.asInstanceOf[String]))
      .toDF("id", "s", "e", "k")
    val out = AsOfJoin.intervalOverlapJoin(a, "id", "s", "e",
        b, "id", "s", "e", binWidth = 10L, keys = Seq(("k", "k")))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out.map(r => (r._1, r._2)) == Set((1L, 11L), (3L, 12L)))
  }

  test("intervalOverlapJoin: the bins-per-interval envelope fails " +
    "fast with the remedy; guards reject bad parameters") {
    val a = Seq((1L, 0L, 1000000L)).toDF("id", "s", "e")
    val b = Seq((2L, 5L, 6L)).toDF("id", "s", "e")
    val e = intercept[Exception] {
      AsOfJoin.intervalOverlapJoin(a, "id", "s", "e", b, "id", "s", "e",
        binWidth = 1L, maxBinsPerInterval = 1000).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("binWidth")), messages(e))
    intercept[IllegalArgumentException] {
      AsOfJoin.intervalOverlapJoin(a, "id", "s", "e", b, "id", "s", "e",
        binWidth = 0L)
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.intervalOverlapJoin(a, "id", "s", "e", b, "id", "s", "e",
        binWidth = 10L, maxBinsPerInterval = 0)
    }
  }

  test("intervalOverlapJoin: the large-large plan is an equi-join on " +
    "the bin — no cartesian, no nested loop") {
    val a = spark.range(2000).select(col("id"),
      (col("id") * 10).as("s"), (col("id") * 10 + 15).as("e"))
    val b = spark.range(2000).select(col("id"),
      (col("id") * 11).as("s"), (col("id") * 11 + 7).as("e"))
    val out = AsOfJoin.intervalOverlapJoin(a, "id", "s", "e",
      b, "id", "s", "e", binWidth = 100L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    // sanity: it actually finds overlaps
    assert(out.count() > 0)
  }
}
