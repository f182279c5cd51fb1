package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel: in-order progression, strict-after, conversion window") {
    // u1 completes A->B->C in order; u2 does B before A (B must not
    // count); u3 has A and B at the SAME timestamp (tie is not
    // progression); u4 converts but only outside a 1-hour window
    val e = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")),
      (1L, "B", ts("2024-01-01 10:10:00")),
      (1L, "C", ts("2024-01-01 10:20:00")),
      (2L, "B", ts("2024-01-01 09:00:00")),
      (2L, "A", ts("2024-01-01 09:30:00")),
      (3L, "A", ts("2024-01-01 08:00:00")),
      (3L, "B", ts("2024-01-01 08:00:00")),
      (4L, "A", ts("2024-01-01 00:00:00")),
      (4L, "B", ts("2024-01-01 05:00:00")),
      (4L, "C", ts("2024-01-01 23:00:00")))
      .toDF("user_id", "event_type", "ts")
    val out = Funnel.funnel(e, "user_id", "event_type", "ts",
        Seq("A", "B", "C"))
      .as[(Long, String, Long)].collect().toList.sortBy(_._1)
    // unbounded: u1 and u4 reach C; u2 stops at A; u3 stops at A (tie)
    assert(out == List((1L, "A", 4L), (2L, "B", 2L), (3L, "C", 2L)), s"$out")

    val windowed = Funnel.funnel(e, "user_id", "event_type", "ts",
        Seq("A", "B", "C"), maxGapUs = Some(3600L * 1000000L))
      .as[(Long, String, Long)].collect().toList.sortBy(_._1)
    // 1-hour window: u4's B (5 h after A) falls out -> only u1 converts
    assert(windowed == List((1L, "A", 4L), (2L, "B", 1L), (3L, "C", 1L)),
      s"$windowed")
  }

  test("funnel: repeated step types advance through duplicates; guards") {
    // A->A funnel: needs two As strictly ordered
    val e = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")),
      (1L, "A", ts("2024-01-01 11:00:00")),
      (2L, "A", ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    val out = Funnel.funnel(e, "user_id", "event_type", "ts", Seq("A", "A"))
      .as[(Long, String, Long)].collect().toList.sortBy(_._1)
    assert(out == List((1L, "A", 2L), (2L, "A", 1L)), s"$out")
    intercept[IllegalArgumentException](
      Funnel.funnel(e, "user_id", "event_type", "ts", Nil))
    intercept[IllegalArgumentException](
      Funnel.funnel(e, "user_id", "event_type", "ts", Seq("A"),
        maxGapUs = Some(0L)))
  }

  test("cohortRetention: weekly cohorts, offsets, distinct users per cell") {
    // u1 first active week of Jan 1 (Mon), returns week of Jan 8;
    // u2 first active week of Jan 8 only (two events, one cell);
    // u3 active weeks 0 and 2 of its cohort
    val e = Seq(
      (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-09 10:00:00")),
      (2L, ts("2024-01-10 10:00:00")),
      (2L, ts("2024-01-11 11:00:00")),
      (3L, ts("2024-01-03 10:00:00")),
      (3L, ts("2024-01-16 10:00:00")))
      .toDF("user_id", "ts")
    val out = Funnel.cohortRetention(e, "user_id", "ts", "week")
      .select(col("cohort").cast("string"), col("period_offset"),
        col("users"))
      .as[(String, Long, Long)].collect().toSet
    assert(out == Set(
      ("2024-01-01", 0L, 2L),  // u1 + u3 cohort week
      ("2024-01-01", 1L, 1L),  // u1 returns
      ("2024-01-01", 2L, 1L),  // u3 returns
      ("2024-01-08", 0L, 1L)), // u2, single cell despite two events
      s"$out")
    intercept[IllegalArgumentException](
      Funnel.cohortRetention(e, "user_id", "ts", "quarter"))
  }

  test("transitionMatrix: ordered pairs per user, tie-break determinism, row-normalized p") {
    // u1: A -> B -> A; u2: A -> C. Transitions: A->B, B->A, A->C.
    // u3 has two events at the SAME ts — the tie column (event id)
    // orders them X(1) -> Y(2) deterministically.
    val e = Seq(
      (1L, 10L, "A", ts("2024-01-01 10:00:00")),
      (1L, 11L, "B", ts("2024-01-01 11:00:00")),
      (1L, 12L, "A", ts("2024-01-01 12:00:00")),
      (2L, 20L, "A", ts("2024-01-01 10:00:00")),
      (2L, 21L, "C", ts("2024-01-01 11:00:00")),
      (3L, 1L, "X", ts("2024-01-01 09:00:00")),
      (3L, 2L, "Y", ts("2024-01-01 09:00:00")))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = Funnel.transitionMatrix(e, "user_id", "event_type", "ts",
        "event_id")
      .as[(String, String, Long, Double)].collect()
      .map { case (f, t, n, p) => (f, t) -> ((n, p)) }.toMap
    assert(out == Map(
      ("A", "B") -> ((1L, 0.5)), ("A", "C") -> ((1L, 0.5)),
      ("B", "A") -> ((1L, 1.0)), ("X", "Y") -> ((1L, 1.0))), s"$out")
    // single-event users contribute no pair; sequences never cross users
    assert(!out.contains(("C", "X")) && !out.contains(("A", "X")))
  }

  test("topPaths: consecutive windows per user, rank and tie-break, no cross-user path") {
    // u1: A B A B -> paths A>B>A, B>A>B; u2: A B C -> A>B>C;
    // u3: single event, no path
    val e = Seq(
      (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"), (1L, 4L, "B"),
      (2L, 5L, "A"), (2L, 6L, "B"), (2L, 7L, "C"),
      (3L, 8L, "Z"))
      .map { case (u, id, t) => (u, id, t, ts("2024-01-01 10:00:00")) }
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = Funnel.topPaths(e, "user_id", "event_type", "ts",
        "event_id", len = 3, k = 10)
      .as[(String, Long)].collect().toList
    // all counts 1 -> path ASC tie-break ordering
    assert(out == List(("A>B>A", 1L), ("A>B>C", 1L), ("B>A>B", 1L)), s"$out")

    // len = 2 aggregates pairs; k caps
    val pairs = Funnel.topPaths(e, "user_id", "event_type", "ts",
        "event_id", len = 2, k = 2)
      .as[(String, Long)].collect().toList
    assert(pairs == List(("A>B", 3L), ("B>A", 1L)), s"$pairs")
    intercept[IllegalArgumentException](
      Funnel.topPaths(e, "user_id", "event_type", "ts", "event_id", len = 1))
  }

  test("cohortRetention: day and month periods") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-03 10:00:00")),
      (1L, ts("2024-03-15 10:00:00")))
      .toDF("user_id", "ts")
    val day = Funnel.cohortRetention(e, "user_id", "ts", "day")
      .select(col("period_offset")).as[Long].collect().toSet
    assert(day == Set(0L, 2L, 74L), s"$day")
    val month = Funnel.cohortRetention(e, "user_id", "ts", "month")
      .select(col("period_offset")).as[Long].collect().toSet
    assert(month == Set(0L, 2L), s"$month")
  }

  // --- sequentialSupport ---------------------------------------------------

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("sequentialSupport: ordered pairs count users with a strictly before b") {
    val e = Seq(
      (1L, "a", ts(1)), (1L, "b", ts(5)),   // a→b for u1
      (2L, "b", ts(1)), (2L, "a", ts(5)),   // b→a for u2
      (3L, "a", ts(1)))                     // a only
      .toDF("u", "t", "ts")
    val out = Funnel.sequentialSupport(e, "u", "t", "ts").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out((("a", "b"))) == ((1L, 0.333333)))
    assert(out((("b", "a"))) == ((1L, 0.333333)))
    assert(!out.contains(("a", "a"))) // nobody did a twice
  }

  test("sequentialSupport: same-type repeats count; simultaneous is not before") {
    val e = Seq(
      (1L, "a", ts(1)), (1L, "a", ts(9)),   // a→a for u1
      (2L, "a", ts(4)), (2L, "b", ts(4)))   // tie: unordered
      .toDF("u", "t", "ts")
    val out = Funnel.sequentialSupport(e, "u", "t", "ts").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("a", "a") -> 1L))
  }

  // --- cohortLtv -----------------------------------------------------------

  test("cohortLtv: hand curves — cohorting by first week, cumulative " +
    "per-user value by age") {
    def day(d: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(d).atStartOfDay())
    val e = Seq(
      (1L, day(0), 10.0),   // user 1: cohort week 0
      (1L, day(8), 5.0),    //   age 1
      (2L, day(2), 4.0),    // user 2: cohort week 0, age 0
      (3L, day(9), 20.0))   // user 3: cohort week 1, age 0
      .toDF("u", "ts", "v")
    val out = Funnel.cohortLtv(e, "u", "ts", "v", "2024-01-01")
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // cohort 0: 2 users; age 0 rev 14 → ltv 7; age 1 rev 5 → ltv 9.5
    assert(out((0, 0)) == ((2L, 14.0, 7.0)))
    assert(out((0, 1)) == ((2L, 5.0, 9.5)))
    assert(out((1, 0)) == ((1L, 20.0, 20.0)))
    // partitioning invariance
    val out2 = Funnel.cohortLtv(e.repartition(5), "u", "ts", "v",
        "2024-01-01")
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out2 == out)
  }

  // --- conversionLag -------------------------------------------------------

  test("conversionLag: hand case — first-from to first-at-or-after-to, " +
    "floor-to-unit, exact order stats") {
    val e = Seq(
      // u1: signup at 100s, purchases at 50s (before — ignored) and 400s
      // → lag = floor(300/60) = 5
      (1L, "signup", ts(100L)), (1L, "purchase", ts(50L)),
      (1L, "purchase", ts(400L)),
      // u2: signup 0s, purchase 0s (simultaneous counts) → lag 0
      (2L, "signup", ts(0L)), (2L, "purchase", ts(0L)),
      // u3: signup, never purchases
      (3L, "signup", ts(10L)),
      // u4: purchase only — not started
      (4L, "purchase", ts(5L)))
      .toDF("u", "t", "ts")
    val r = Funnel.conversionLag(e, "u", "ts", "t", "signup", "purchase")
      .collect().head
    assert(r.getLong(0) == 3L) // u1, u2, u3 started
    assert(r.getLong(1) == 2L) // u1, u2 converted
    assert(r.getLong(2) == 0L) // min
    assert(r.getLong(3) == 0L) // p50: ceil(2·0.5)=1st of [0,5]
    assert(r.getLong(4) == 5L) // p90: ceil(2·0.9)=2nd
    assert(r.getLong(5) == 5L) // max
  }

  test("conversionLag: nobody converts → counts with null order stats; " +
    "partitioning-invariant on a spread case") {
    val none = Seq((1L, "signup", ts(0L)), (2L, "signup", ts(5L)))
      .toDF("u", "t", "ts")
    val r0 = Funnel.conversionLag(none, "u", "ts", "t", "signup",
      "purchase").collect().head
    assert(r0.getLong(0) == 2L && r0.getLong(1) == 0L)
    assert(r0.isNullAt(2) && r0.isNullAt(3) && r0.isNullAt(4) &&
      r0.isNullAt(5))
    val many = (1 to 50).flatMap(i => Seq(
      (i.toLong, "signup", ts(i * 10L)),
      (i.toLong, "purchase", ts(i * 10L + i * 60L))))
      .toDF("u", "t", "ts")
    val a = Funnel.conversionLag(many, "u", "ts", "t", "signup",
      "purchase").collect().head
    val b = Funnel.conversionLag(many.repartition(9), "u", "ts", "t",
      "signup", "purchase").collect().head
    assert(a.toSeq == b.toSeq)
    // lags are exactly 1..50 minutes → floor = i; p50 = 25th, p90 = 45th
    assert(a.getLong(3) == 25L && a.getLong(4) == 45L)
  }

  test("positionAttribution: U-shaped hand case — 40/20/40 over a " +
    "3-touch journey, 1.0 singles, 0.5/0.5 pairs, cold-start to " +
    "'none'; post-conversion touches ignored") {
    val ev = Seq(
      // user A: x, y, z then buy → x 0.4, y 0.2, z 0.4
      ("a", "x", "2024-01-01 10:00:00", 1L),
      ("a", "y", "2024-01-01 11:00:00", 2L),
      ("a", "z", "2024-01-01 12:00:00", 3L),
      ("a", "purchase", "2024-01-01 13:00:00", 4L),
      ("a", "x", "2024-01-01 14:00:00", 5L),   // after conv: ignored
      // user B: single touch → 1.0
      ("b", "y", "2024-01-01 10:00:00", 6L),
      ("b", "purchase", "2024-01-01 11:00:00", 7L),
      // user C: cold start → none 1.0
      ("c", "purchase", "2024-01-01 10:00:00", 8L),
      // user D: two touches → 0.5 each
      ("d", "x", "2024-01-01 10:00:00", 9L),
      ("d", "z", "2024-01-01 11:00:00", 10L),
      ("d", "purchase", "2024-01-01 12:00:00", 11L),
      // user E: never converts → contributes nothing
      ("e", "x", "2024-01-01 10:00:00", 12L))
      .map { case (u, t, s, i) => (u, t, ts(s), i) }
      .toDF("u", "ty", "ts", "i")
    val out = Funnel.positionAttribution(ev, "u", "ts", "i", "ty",
        "purchase")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out == Map(
      "x" -> ((2L, 0.9)),      // 0.4 + 0.5
      "y" -> ((2L, 1.2)),      // 0.2 + 1.0
      "z" -> ((2L, 0.9)),      // 0.4 + 0.5
      "none" -> ((1L, 1.0))))
  }

  test("timeDecayAttribution: reciprocal weights on exact second " +
    "deltas, one unit of credit per converting user") {
    // one user, touches 1 day and 2 days before conversion with
    // half-life 1 day: w = 1/2 and 1/3 → credits 0.6 / 0.4
    val ev = Seq(
      ("a", "x", "2024-01-01 00:00:00", 1L),
      ("a", "y", "2024-01-02 00:00:00", 2L),
      ("a", "purchase", "2024-01-03 00:00:00", 3L),
      ("c", "purchase", "2024-01-01 10:00:00", 8L))
      .map { case (u, t, s, i) => (u, t, ts(s), i) }
      .toDF("u", "ty", "ts", "i")
    val out = Funnel.timeDecayAttribution(ev, "u", "ts", "i", "ty",
        "purchase", halfLifeSec = 86400.0)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out == Map(
      "x" -> ((1L, 0.4)), "y" -> ((1L, 0.6)), "none" -> ((1L, 1.0))))
    intercept[IllegalArgumentException] {
      Funnel.timeDecayAttribution(ev, "u", "ts", "i", "ty", "purchase",
        halfLifeSec = 0.0)
    }
  }
}
