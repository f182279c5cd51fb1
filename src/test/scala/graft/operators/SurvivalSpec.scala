package graft.operators

import graft.SparkSpec

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private def curve(rows: Seq[(String, Double, Int)]) =
    Survival.kaplanMeier(rows.toDF("g", "dur", "ev"), "g", "dur", "ev")
      .orderBy("g", "duration")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))

  test("kaplanMeier: textbook 3-subject curve with a censored middle") {
    // event@1, censored@2, event@3: S = 2/3 at t=1, unchanged at the
    // censoring level (risk set shrinks 2→1), 0 at t=3 (d = n)
    val out = curve(Seq(("g", 1.0, 1), ("g", 2.0, 0), ("g", 3.0, 1)))
    val s23 = math.rint(math.exp(
      math.rint(math.log(1.0 - 1.0 / 3.0) * 1e9) / 1e9) * 1e6) / 1e6
    assert(out.toSeq == Seq(
      ("g", 1.0, 3L, 1L, 0L, s23),
      ("g", 2.0, 2L, 0L, 1L, s23),
      ("g", 3.0, 1L, 1L, 0L, 0.0)))
  }

  test("kaplanMeier: no censoring → S(t_k) = remaining fraction") {
    val out = curve(Seq(("g", 1.0, 1), ("g", 2.0, 1),
      ("g", 3.0, 1), ("g", 4.0, 1)))
    assert(out.map(_._6).toSeq == Seq(0.75, 0.5, 0.25, 0.0))
    assert(out.map(_._3).toSeq == Seq(4L, 3L, 2L, 1L)) // at-risk walk
  }

  test("kaplanMeier: censoring shrinks the risk set, raising later hazards") {
    // without the censored subject: S(3) = 1/2 · (1 − 1/1)... make it
    // comparable: {e@1, c@2, e@3} vs {e@1, e@3}: first gives S(3)=0
    // via d=n at level 3 either way, but S just before differs through
    // n_risk — assert the at-risk columns directly
    val withC = curve(Seq(("g", 1.0, 1), ("g", 2.0, 0), ("g", 3.0, 1)))
    val noC = curve(Seq(("g", 1.0, 1), ("g", 3.0, 1)))
    assert(withC.find(_._2 == 3.0).get._3 == 1L)
    assert(noC.find(_._2 == 3.0).get._3 == 1L)
    assert(withC.find(_._2 == 1.0).get._3 == 3L)
    assert(noC.find(_._2 == 1.0).get._3 == 2L)
  }

  test("kaplanMeier: all-censored group stays at survival 1.0") {
    val out = curve(Seq(("g", 1.0, 0), ("g", 2.0, 0), ("g", 5.0, 0)))
    assert(out.map(_._6).toSeq == Seq(1.0, 1.0, 1.0))
    assert(out.map(_._5).toSeq == Seq(1L, 1L, 1L))
  }

  test("kaplanMeier: groups are independent — two cohorts ≡ separate runs") {
    val a = Seq(("a", 1.0, 1), ("a", 2.0, 0), ("a", 4.0, 1))
    val b = Seq(("b", 1.0, 0), ("b", 3.0, 1), ("b", 3.0, 1), ("b", 9.0, 0))
    val together = curve(a ++ b)
    assert(together.filter(_._1 == "a").toSeq == curve(a).toSeq)
    assert(together.filter(_._1 == "b").toSeq == curve(b).toSeq)
  }

  test("kaplanMeier: simultaneous events collapse into one level; nulls drop") {
    val df = Seq(
      (Some("g"), Some(2.0), Some(1)), (Some("g"), Some(2.0), Some(1)),
      (Some("g"), Some(2.0), Some(0)), (Some("g"), Some(5.0), Some(0)),
      (Some("g"), None, Some(1)), (Some("g"), Some(3.0), None))
      .toDF("g", "dur", "ev")
    val out = Survival.kaplanMeier(df, "g", "dur", "ev")
      .orderBy("duration").collect()
    assert(out.length == 2)
    val l2 = out.head
    assert(l2.getLong(2) == 4L && l2.getLong(3) == 2L && l2.getLong(4) == 1L)
    val s = math.rint(math.exp(
      math.rint(math.log(0.5) * 1e9) / 1e9) * 1e6) / 1e6
    assert(l2.getDouble(5) == s)
    assert(out(1).getDouble(5) == s) // censor-only level: unchanged
  }

  private def g6(x: Double): Double = math.rint(x * 1e6) / 1e6
  private def g9(x: Double): Double = math.rint(x * 1e9) / 1e9

  /** Independent imperative reference: walk the distinct duration
    * levels, accumulate O/E/V on the 9-grid exactly as documented. */
  private def refLogRank(rows: Seq[(String, Double, Int)])
      : (Long, Double, Double, Long) = {
    var oa = 0L; var ea = 0.0; var v = 0.0; var dd = 0L
    for (t <- rows.map(_._2).distinct.sorted) {
      val atRisk = rows.filter(_._2 >= t)
      val n = atRisk.size.toDouble
      val na = atRisk.count(_._1 == "A").toDouble
      val d = rows.count(r => r._2 == t && r._3 != 0)
      val da = rows.count(r => r._2 == t && r._3 != 0 && r._1 == "A")
      if (d > 0) {
        oa += da; dd += d
        ea += g9(d * na / n)
        if (n > 1) v += g9(d * (na / n) * (1.0 - na / n) *
          (n - d) / (n - 1.0))
      }
    }
    (oa, ea, v, dd)
  }

  test("logRank: hand case — O/E/V fold, z, chi2, group ordering") {
    // A = 3+,5+,7c,9+  B = 1+,4c,8+,10c (+ event, c censored):
    // Oa = 3, Ea = 2.504761904, V = 1.207120181 (9-grid terms),
    // z = 0.450753, chi2 = 0.203178
    val rows = Seq(("A", 3.0, 1), ("A", 5.0, 1), ("A", 7.0, 0),
      ("A", 9.0, 1), ("B", 1.0, 1), ("B", 4.0, 0), ("B", 8.0, 1),
      ("B", 10.0, 0))
    val out = Survival.logRank(rows.toDF("g", "dur", "ev"),
      "g", "dur", "ev").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "A" && r.getString(1) == "B")
    assert(r.getLong(2) == 4L && r.getLong(3) == 4L)
    assert(r.getLong(4) == 3L && r.getLong(6) == 2L)
    val (oa, ea, v, dd) = refLogRank(rows)
    assert(oa == 3L && dd == 5L)
    assert(r.getDouble(5) == g6(ea) && r.getDouble(7) == g6(dd - ea))
    val z = (oa - ea) / math.sqrt(v)
    assert(r.getDouble(8) == g6(z * z) && r.getDouble(9) == g6(z))
    assert(g6(z) == 0.450753 && g6(z * z) == 0.203178)
  }

  test("logRank: identical cohorts → z = 0 exactly; all-censored → " +
    "null; nulls drop; k != 2 fails fast") {
    val base = Seq(("A", 1.0, 1), ("A", 2.0, 0), ("A", 4.0, 1))
    val twin = base ++ base.map { case (_, d, e) => ("B", d, e) }
    val r0 = Survival.logRank(twin.toDF("g", "dur", "ev"),
      "g", "dur", "ev").collect().head
    assert(r0.getDouble(9) == 0.0 && r0.getDouble(8) == 0.0)
    // no events at all → V = 0 → null z/chi2, zero observed/expected
    val cen = Seq(("A", 1.0, 0), ("A", 2.0, 0), ("B", 3.0, 0))
    val r1 = Survival.logRank(cen.toDF("g", "dur", "ev"),
      "g", "dur", "ev").collect().head
    assert(r1.getLong(4) == 0L && r1.getDouble(5) == 0.0 &&
      r1.isNullAt(8) && r1.isNullAt(9))
    // null duration/event/group rows drop before everything
    val withNulls = Seq(
      (Some("A"), Some(3.0), Some(1)), (Some("A"), Some(5.0), Some(1)),
      (Some("A"), Some(7.0), Some(0)), (Some("A"), Some(9.0), Some(1)),
      (Some("B"), Some(1.0), Some(1)), (Some("B"), Some(4.0), Some(0)),
      (Some("B"), Some(8.0), Some(1)), (Some("B"), Some(10.0), Some(0)),
      (None, Some(1.0), Some(1)), (Some("A"), None, Some(1)),
      (Some("B"), Some(2.0), None))
      .toDF("g", "dur", "ev")
    val r2 = Survival.logRank(withNulls, "g", "dur", "ev").collect().head
    assert(r2.getDouble(9) == 0.450753)
    // one group / three groups → explicit rejection
    val one = Seq(("A", 1.0, 1)).toDF("g", "dur", "ev")
    assertThrows[IllegalArgumentException](
      Survival.logRank(one, "g", "dur", "ev"))
    val three = (base ++ Seq(("B", 1.0, 1), ("C", 2.0, 0)))
      .toDF("g", "dur", "ev")
    assertThrows[IllegalArgumentException](
      Survival.logRank(three, "g", "dur", "ev"))
  }

  test("logRank: equals the independent level-walk reference on " +
    "pseudo-random tied data with heavy censoring") {
    val rows = (1 to 80).map { i =>
      (if (i % 3 == 0) "A" else "B",
        ((i * 13) % 11).toDouble, if ((i * 7) % 5 < 3) 1 else 0)
    }
    val out = Survival.logRank(rows.toDF("g", "dur", "ev"),
      "g", "dur", "ev").collect().head
    val (oa, ea, v, dd) = refLogRank(rows)
    val na = rows.count(_._1 == "A").toLong
    assert(out.getLong(2) == na && out.getLong(3) == rows.size - na)
    assert(out.getLong(4) == oa && out.getLong(6) == dd - oa)
    assert(math.abs(out.getDouble(5) - ea) < 1e-6)
    val z = (oa - ea) / math.sqrt(v)
    assert(math.abs(out.getDouble(9) - z) < 1e-6,
      s"${out.getDouble(9)} vs $z")
    assert(math.abs(out.getDouble(8) - z * z) < 1e-6)
  }
}
