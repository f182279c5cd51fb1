package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** changePoint + seasonalDecompose (TimeSeriesSpec covers the earlier
  * resample/outlier/islands/ewma surface). */
class TimeSeriesSpec2 extends SparkSpec {
  import spark.implicits._

  // --- changePoint ---------------------------------------------------------

  test("changePoint finds a planted level shift at its boundary") {
    // level 10 for keys 1..20, level 30 for 21..40 → |cusum| peaks at 20
    val df = (1 to 40).map(i => (i, if (i <= 20) 10.0 else 30.0)).toDF("k", "v")
    val r = TimeSeries.changePoint(df, "k", "v").collect().head
    assert(r.getInt(0) == 20)
    // mean = 20; cusum at 20 = 20·(10−20) = −200
    assert(r.getDouble(1) == 200.0)
    assert(r.getDouble(2) == 20.0)
    assert(r.getLong(3) == 40L)
  }

  test("changePoint: flat series → zero strength, earliest-key tie-break") {
    val df = (1 to 10).map(i => (i, 5.0)).toDF("k", "v")
    val r = TimeSeries.changePoint(df, "k", "v").collect().head
    assert(r.getDouble(1) == 0.0)
    assert(r.getInt(0) == 1) // every key ties at 0 → earliest wins
  }

  // --- holtForecast --------------------------------------------------------

  private def refHolt(xs: Seq[Double], a: Double, b: Double,
                      horizon: Int): Seq[Double] = {
    val g9 = (x: Double) => math.rint(x * 1e9) / 1e9
    var l = xs.head
    var t = 0.0
    var first = true
    for (x <- xs.tail) {
      val b0 = if (first) x - l else t
      first = false
      val nl = g9(a * x + (1.0 - a) * (l + b0))
      t = g9(b * (a * (x - l) + (1.0 - a) * b0) + (1.0 - b) * b0)
      l = nl
    }
    (1 to horizon).map(h => math.rint((l + h * t) * 1e6) / 1e6)
  }

  test("holtForecast matches the reference recursion bit-for-bit; linear series extrapolates") {
    val xs = Seq(10.0, 13.0, 11.5, 15.0, 14.0, 18.0, 17.5, 21.0)
    val df = xs.zipWithIndex.map { case (v, i) => ("g", i, v) }
      .toDF("grp", "t", "v")
    val out = TimeSeries.holtForecast(df, "grp", "t", "v",
        alpha = 0.5, beta = 0.3, horizon = 3)
      .orderBy("h").collect().map(_.getDouble(2))
    assert(out.toSeq == refHolt(xs, 0.5, 0.3, 3))
    // pure linear input: forecasts continue the line exactly
    val lin = (0 until 10).map(i => ("g", i, 5.0 + 2.0 * i)).toDF("grp", "t", "v")
    val fc = TimeSeries.holtForecast(lin, "grp", "t", "v", 0.5, 0.3, 2)
      .orderBy("h").collect().map(_.getDouble(2))
    assert(fc.toSeq == Seq(25.0, 27.0))
  }

  test("holtForecast: single-point series forecasts flat; keys stay independent") {
    val df = Seq(("solo", 0, 42.0), ("pair", 0, 1.0), ("pair", 1, 3.0))
      .toDF("grp", "t", "v")
    val out = TimeSeries.holtForecast(df, "grp", "t", "v", 0.5, 0.3, 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out(("solo", 1)) == 42.0 && out(("solo", 2)) == 42.0)
    // pair: l1=1, b1=2; fold x2: b0=2, l=.5*3+.5*3=3, b=.3*2+.7*2=2
    assert(out(("pair", 1)) == 5.0 && out(("pair", 2)) == 7.0)
  }

  // --- seasonalDecompose ---------------------------------------------------

  test("seasonalDecompose recovers a planted trend + weekly seasonality exactly") {
    val period = 7
    val seasonal = Array(3.0, -1.0, 0.0, 2.0, -2.0, 1.0, -3.0) // sums to 0
    // linear trend + seasonal, NO noise → centered MA of a linear trend
    // is the trend itself and residuals vanish where trend exists
    val df = (0 until 42).map { t =>
      (t, 100.0 + 2.0 * t + seasonal(t % period))
    }.toDF("k", "v")
    val out = TimeSeries.seasonalDecompose(df, "k", "v", period)
      .orderBy("k").collect()
    assert(out.length == 42)
    for (r <- out) {
      val t = r.getInt(0)
      if (t < 3 || t >= 39) {
        assert(r.isNullAt(2), s"edge trend at $t")
        assert(r.isNullAt(4), s"edge residual at $t")
      } else {
        assert(r.getDouble(2) == 100.0 + 2.0 * t, s"trend at $t")
        assert(r.getDouble(4) == 0.0, s"residual at $t")
      }
      assert(r.getDouble(3) == seasonal(t % period), s"seasonal at $t")
    }
    // seasonal components re-center to zero over one period
    val s = out.take(7).map(_.getDouble(3)).sum
    assert(math.abs(s) < 1e-9)
  }

  test("seasonalDecompose: even periods are rejected, short series all-null trend") {
    intercept[IllegalArgumentException] {
      TimeSeries.seasonalDecompose(Seq((1, 1.0)).toDF("k", "v"), "k", "v", 4)
    }
    val short = (0 until 3).map(t => (t, t.toDouble)).toDF("k", "v")
    val out = TimeSeries.seasonalDecompose(short, "k", "v", 5)
      .orderBy("k").collect()
    assert(out.forall(_.isNullAt(2)))
    assert(out.forall(_.isNullAt(3))) // no phase ever had a trend row
  }

  // --- holtWintersForecast -------------------------------------------------

  test("holtWinters: pure constant+seasonal input extrapolates exactly") {
    // c ± d alternating, period 2: init gives l=c, b=0, s=(+d,−d) and
    // every update is a fixpoint — forecasts read the seasonal slots
    val c = 10.0; val d = 3.0
    val rows = (1 to 6).map(t =>
      ("k", t, if (t % 2 == 1) c + d else c - d))
    val out = TimeSeries.holtWintersForecast(rows.toDF("g", "t", "v"),
        "g", "t", "v", period = 2, alpha = 0.5, beta = 0.3,
        gamma = 0.4, horizon = 4)
      .orderBy("h").collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    // 6 observations: fold consumed t=3..6, head = season of t=7 (odd)
    assert(out == Map(1 -> (c + d), 2 -> (c - d), 3 -> (c + d),
      4 -> (c - d)))
  }

  test("holtWinters ≡ independent driver-side recursion; keys independent") {
    def r9(x: Double) = math.rint(x * 1e9) / 1e9
    val m = 3; val (al, be, ga) = (0.5, 0.3, 0.4)
    def reference(raw: Seq[Double], horizon: Int): Seq[Double] = {
      // the operator 9-grids inputs through a decimal cast first
      val vs = raw.map(x =>
        BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
      val l0 = r9(vs.take(m).foldLeft(0.0)(_ + _) / m)
      val m2 = r9(vs.slice(m, 2 * m).foldLeft(0.0)(_ + _) / m)
      var l = l0; var b = r9((m2 - l0) / m)
      var s = vs.take(m).map(x => r9(x - l0)).toVector
      for (x <- vs.drop(m)) {
        val lN = r9(al * (x - s.head) + (1.0 - al) * (l + b))
        val bN = r9(be * (lN - l) + (1.0 - be) * b)
        val sN = r9(ga * (x - lN) + (1.0 - ga) * s.head)
        l = lN; b = bN; s = s.tail :+ sN
      }
      (1 to horizon).map(h =>
        math.rint((l + h * b + s((h - 1) % m)) * 1e6) / 1e6)
    }
    val vsA = (1 to 11).map(t =>
      20.0 + 0.7 * t + Seq(2.0, -1.0, -1.5)(t % 3))
    val vsB = (1 to 9).map(t => ((t * 17) % 7).toDouble)
    val rows = vsA.zipWithIndex.map { case (v, i) => ("A", i, v) } ++
      vsB.zipWithIndex.map { case (v, i) => ("B", i, v) }
    val out = TimeSeries.holtWintersForecast(rows.toDF("g", "t", "v"),
        "g", "t", "v", m, al, be, ga, horizon = 3)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val expA = reference(vsA, 3); val expB = reference(vsB, 3)
    (1 to 3).foreach { h =>
      assert(out(("A", h)) == expA(h - 1), s"A h=$h")
      assert(out(("B", h)) == expB(h - 1), s"B h=$h")
    }
  }

  test("holtWinters: keys below 2·period drop; guards reject bad params") {
    val rows = (1 to 5).map(t => ("short", t, t.toDouble)) ++
      (1 to 6).map(t => ("ok", t, t.toDouble))
    val df = rows.toDF("g", "t", "v")
    val out = TimeSeries.holtWintersForecast(df, "g", "t", "v",
      period = 3, alpha = 0.5, beta = 0.5, gamma = 0.5, horizon = 2)
    assert(out.select("g").distinct().as[String].collect().toSeq ==
      Seq("ok"))
    intercept[IllegalArgumentException] {
      TimeSeries.holtWintersForecast(df, "g", "t", "v", 1, 0.5, 0.5, 0.5, 1)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.holtWintersForecast(df, "g", "t", "v", 3, 0.5, 0.5, 1.5, 1)
    }
  }
}
