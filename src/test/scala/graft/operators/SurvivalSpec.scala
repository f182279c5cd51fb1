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
}
