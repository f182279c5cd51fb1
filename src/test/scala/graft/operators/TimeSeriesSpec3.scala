package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** forecastAccuracy + theilSen (TimeSeriesSpec/2 cover the earlier
  * surface). */
class TimeSeriesSpec3 extends SparkSpec {
  import spark.implicits._

  // --- forecastAccuracy ----------------------------------------------------

  test("forecastAccuracy: perfect forecast → zero errors, mase 0") {
    val df = Seq(("k", 1, 1.0, 1.0), ("k", 2, 2.0, 2.0), ("k", 3, 3.0, 3.0))
      .toDF("g", "t", "y", "f")
    val r = TimeSeries.forecastAccuracy(df, "g", "t", "y", "f")
      .collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 0.0) // mae
    assert(r.getDouble(4) == 0.0) // rmse
    assert(r.getDouble(5) == 0.0) // smape
    assert(r.getDouble(6) == 0.0) // mase: naive errs 1,1 > 0
  }

  test("forecastAccuracy: hand case — lag-1 as the forecast scores mase 1") {
    // y = 1,2,3,4; f = lag-1 → scored rows err 1 each; naive = same lag
    val df = Seq(
      ("k", 1, 1.0, None: Option[Double]), ("k", 2, 2.0, Some(1.0)),
      ("k", 3, 3.0, Some(2.0)), ("k", 4, 4.0, Some(3.0)))
      .toDF("g", "t", "y", "f")
    val r = TimeSeries.forecastAccuracy(df, "g", "t", "y", "f")
      .collect().head
    assert(r.getLong(1) == 4L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 1.0) // mae
    assert(r.getDouble(4) == 1.0) // rmse
    // smape terms: 2/3, 2/5, 2/7 → mean = (0.666666667+0.4+0.285714286)/3
    assert(math.abs(r.getDouble(5) - 0.450794) < 1e-6)
    assert(r.getDouble(6) == 1.0) // mase: naive mae = 1
  }

  test("forecastAccuracy: constant series → null mase; 0/0 smape rows drop") {
    val const = Seq(("k", 1, 5.0, 4.0), ("k", 2, 5.0, 4.0),
      ("k", 3, 5.0, 4.0)).toDF("g", "t", "y", "f")
    val r1 = TimeSeries.forecastAccuracy(const, "g", "t", "y", "f")
      .collect().head
    assert(r1.isNullAt(6)) // naive denominator 0
    assert(r1.getDouble(3) == 1.0)
    // a (y=0, f=0) row: drops from smape's own count, not from mae's
    val zeros = Seq(("k", 1, 0.0, 0.0), ("k", 2, 2.0, 1.0),
      ("k", 3, 4.0, 3.0)).toDF("g", "t", "y", "f")
    val r2 = TimeSeries.forecastAccuracy(zeros, "g", "t", "y", "f")
      .collect().head
    assert(math.abs(r2.getDouble(3) - 2.0 / 3) < 1e-6) // mae over 3
    // smape over the 2 nonzero rows: (2·1/3 + 2·1/7)/2
    assert(math.abs(r2.getDouble(5) -
      (2.0 / 3 + 2.0 / 7) / 2) < 1e-6)
  }

  test("forecastAccuracy: null-forecast warm-up feeds the naive " +
    "denominator; groups are independent") {
    val df = Seq(
      ("a", 1, 10.0, None: Option[Double]), ("a", 2, 20.0, None),
      ("a", 3, 30.0, Some(40.0)),
      ("b", 1, 1.0, Some(1.0)), ("b", 2, 3.0, Some(2.0)))
      .toDF("g", "t", "y", "f")
    val out = TimeSeries.forecastAccuracy(df, "g", "t", "y", "f")
      .collect().map(r => r.getString(0) -> r).toMap
    // a: scored err = 10, naive mae = 10 (two diffs of 10) → mase 1
    assert(out("a").getLong(2) == 1L)
    assert(out("a").getDouble(6) == 1.0)
    // b: mae = 0.5, naive mae = 2 → mase 0.25
    assert(out("b").getDouble(6) == 0.25)
  }

  test("forecastAccuracy ≡ window-built seasonal-naive backtest " +
    "(the q241 shape) and is partitioning-invariant") {
    val rows = (1 to 60).map { i =>
      val g = if (i % 2 == 0) "x" else "y"
      (g, i / 2, 10.0 + (i % 7) + (i % 3) * 0.5)
    }
    val df = rows.toDF("g", "t", "y")
    val w = Window.partitionBy(col("g")).orderBy(col("t"))
    val withF = df.withColumn("f", lag(col("y"), 7).over(w))
    val a = TimeSeries.forecastAccuracy(withF, "g", "t", "y", "f")
      .orderBy("g").collect().toSeq
    val b = TimeSeries.forecastAccuracy(withF.repartition(13), "g", "t",
      "y", "f").orderBy("g").collect().toSeq
    assert(a == b)
  }

  // --- theilSen ------------------------------------------------------------

  test("theilSen: hand case — lower-median slope and intercept") {
    // points (0,0),(1,1),(2,4): slopes {1,2,3} → median 2;
    // intercepts at slope 2: {0,−1,0} → lower median 0
    val df = Seq(("k", 0.0, 0.0), ("k", 1.0, 1.0), ("k", 2.0, 4.0))
      .toDF("g", "t", "v")
    val r = TimeSeries.theilSen(df, "g", "t", "v").collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 2.0)
    assert(r.getDouble(4) == 0.0)
  }

  test("rollingRegression: exact line recovers the slope at every " +
    "full window; warm-up rows report their partial n; zero-variance " +
    "frames and guards") {
    val pts = (1 to 20).map(i => ("k", i.toDouble, 3.0 * i - 5))
    val out = TimeSeries.rollingRegression(pts.toDF("g", "t", "v"),
        "g", "t", "v", window = 5)
      .collect()
      .map(r => r.getDouble(1) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(out(1.0)._1 == 1L, "first row sees only itself")
    assert(out(3.0)._1 == 3L && out(20.0)._1 == 5L)
    assert((2 to 20).forall(i => out(i.toDouble)._2.contains(3.0)),
      "every >= 2-point frame of an exact line gives the exact slope")
    val single = TimeSeries.rollingRegression(pts.toDF("g", "t", "v"),
      "g", "t", "v", window = 5).filter(col("n") === 1).collect()
    assert(single.forall(_.isNullAt(3)), "1-point frames have no slope")
    intercept[IllegalArgumentException] {
      TimeSeries.rollingRegression(pts.toDF("g", "t", "v"), "g", "t",
        "v", window = 1)
    }
  }

  test("seasonalDecompose: constant + pure period-7 pattern splits " +
    "exactly — flat trend, the centered pattern as seasonal, zero " +
    "residual; even period refused") {
    val pat = Seq(3.0, -1.0, 0.0, 2.0, -2.0, 1.0, -3.0) // sums to 0
    val pts = (0 until 35).map(i => ("k", i, 10.0 + pat(i % 7)))
    val df = pts.toDF("g", "t", "v").withColumn("dow", pmod(col("t"), lit(7)))
    val out = TimeSeries.seasonalDecompose(df, "g", "t", "v", "dow", 7)
      .collect().map(r => r.getInt(1) -> r).toMap
    // interior rows: trend = 10, seasonal = pattern, residual = 0
    for (i <- 3 until 32) {
      assert(out(i).getDouble(3) == 10.0, s"trend at $i")
      assert(out(i).getDouble(4) == pat(i % 7), s"seasonal at $i")
      assert(out(i).getDouble(5) == 0.0, s"residual at $i")
    }
    // edges: no full centered window → null trend/residual
    assert(out(0).isNullAt(3) && out(34).isNullAt(3))
    assert(out(0).isNullAt(5))
    intercept[IllegalArgumentException] {
      TimeSeries.seasonalDecompose(df, "g", "t", "v", "dow", 6)
    }
  }

  test("pacf: Durbin-Levinson closed forms agree with a hand " +
    "computation from the series' own ACF; a constant series yields " +
    "nulls throughout") {
    def u(i: Int): Double = ((i * 2654435761L) % 997) / 100.0
    val rows = (1 to 60).map(i => ("k", i, 0.6 * u(i - 1) + u(i)))
    val df = rows.toDF("g", "t", "v")
    val acf = TimeSeries.autocorrelation(df, "g", "t", "v", maxLag = 3)
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    val (r1, r2, r3) = (acf(1), acf(2), acf(3))
    def r9(x: Double) = math.rint(x * 1e9) / 1e9
    val p22 = r9((r2 - r1 * r1) / (1.0 - r1 * r1))
    val p21 = r9(r1 * (1.0 - p22))
    val p33 = r9((r3 - p21 * r2 - p22 * r1) / (1.0 - p21 * r1 - p22 * r2))
    val out = TimeSeries.pacf(df, "g", "t", "v").collect().head
    assert(out.getDouble(1) == math.rint(r1 * 1e6) / 1e6)
    assert(out.getDouble(2) == math.rint(p22 * 1e6) / 1e6)
    assert(out.getDouble(3) == math.rint(p33 * 1e6) / 1e6)
    // constant series: zero denominator ACF → null r → null pacf chain
    val const = (1 to 20).map(i => ("c", i, 5.0)).toDF("g", "t", "v")
    val c = TimeSeries.pacf(const, "g", "t", "v").collect().head
    assert(c.isNullAt(1) && c.isNullAt(2) && c.isNullAt(3))
  }

  test("theilSen: keys over maxPointsPerKey thin deterministically — " +
    "n stays true, n_pairs drops to the sampled count, repeat runs " +
    "identical; cap below 2 fails fast") {
    val pts = (1 to 12).map(t => ("k", t.toDouble, 2.0 * t + 1))
    val df = pts.toDF("g", "t", "v")
    def run() = TimeSeries.theilSen(df, "g", "t", "v",
      maxPointsPerKey = 5).collect().head
    val r = run()
    assert(r.getLong(1) == 12L, "n must report the TRUE point count")
    assert(r.getLong(2) == 10L, "n_pairs must be C(5,2) of the sample")
    assert(r.getDouble(3) == 2.0, "exact-line sample keeps the slope")
    val r2 = run()
    assert(r.toSeq == r2.toSeq, "md5 thinning must be deterministic")
    // default cap leaves small keys untouched
    val full = TimeSeries.theilSen(df, "g", "t", "v").collect().head
    assert(full.getLong(2) == 66L)
    intercept[IllegalArgumentException] {
      TimeSeries.theilSen(df, "g", "t", "v", maxPointsPerKey = 1)
    }
  }

  test("theilSen shrugs off a 30%-contamination outlier where OLS cannot") {
    // exact line v = 2t + 1 on t = 1..7 plus two wild outliers
    val pts = (1 to 7).map(t => ("k", t.toDouble, 2.0 * t + 1)) ++
      Seq(("k", 8.0, 1000.0), ("k", 9.0, -500.0))
    val r = TimeSeries.theilSen(pts.toDF("g", "t", "v"), "g", "t", "v")
      .collect().head
    assert(r.getDouble(3) == 2.0)
    assert(r.getDouble(4) == 1.0)
  }

  test("theilSen: equal-timestamp pairs are skipped; single-point and " +
    "vertical keys emit null slope") {
    val df = Seq(
      ("dup", 1.0, 1.0), ("dup", 1.0, 9.0), ("dup", 2.0, 3.0),
      ("one", 5.0, 5.0),
      ("vert", 3.0, 1.0), ("vert", 3.0, 2.0))
      .toDF("g", "t", "v")
    val out = TimeSeries.theilSen(df, "g", "t", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    // dup: pairs (1,1)→(2,3) slope 2 and (1,9)→(2,3) slope −6 → m=2,
    // lower median = −6
    assert(out("dup").getLong(2) == 2L)
    assert(out("dup").getDouble(3) == -6.0)
    assert(out("one").getLong(2) == 0L && out("one").isNullAt(3))
    assert(out("vert").getLong(2) == 0L && out("vert").isNullAt(3))
  }

  test("theilSen ≡ brute-force median-of-slopes on pseudo-random series " +
    "per key; partitioning-invariant") {
    def u(i: Int, j: Int): Double =
      ((i * 2654435761L + j * 40503L) % 1000) / 100.0
    val rows = for (g <- Seq("a", "b", "c"); t <- 1 to 25)
      yield (g, t.toDouble, 0.7 * t + u(g.hashCode.abs % 97, t))
    val df = rows.toDF("g", "t", "v")
    val out = TimeSeries.theilSen(df, "g", "t", "v")
      .collect().map(r => (r.getString(0), r.getDouble(3), r.getDouble(4)))
      .toList.sortBy(_._1)
    val exp = rows.groupBy(_._1).map { case (g, pts) =>
      val slopes = (for {
        (_, t1, v1) <- pts; (_, t2, v2) <- pts if t1 < t2
      } yield math.rint((v2 - v1) / (t2 - t1) * 1e9) / 1e9).sorted
      val slope = slopes((slopes.size + 1) / 2 - 1)
      val iceps = pts.map { case (_, t, v) =>
        math.rint((v - slope * t) * 1e9) / 1e9 }.sorted
      val icept = iceps((iceps.size + 1) / 2 - 1)
      (g, math.rint(slope * 1e6) / 1e6, math.rint(icept * 1e6) / 1e6)
    }.toList.sortBy(_._1)
    assert(out == exp)
    val out2 = TimeSeries.theilSen(df.repartition(17), "g", "t", "v")
      .collect().map(r => (r.getString(0), r.getDouble(3), r.getDouble(4)))
      .toList.sortBy(_._1)
    assert(out2 == exp)
  }

  // --- changePoints2 -------------------------------------------------------

  test("changePoints2: a two-step series yields the root boundary and " +
    "the second step inside one side") {
    // 10 (k 1-10), 30 (k 11-20), 50 (k 21-30): root peak ties along
    // k 10..20 → earliest 10; le side is constant (strength 0);
    // gt side (mean 40) peaks at k 20
    val df = (1 to 30).map(k =>
      (k, if (k <= 10) 10.0 else if (k <= 20) 30.0 else 50.0))
      .toDF("k", "v")
    val out = TimeSeries.changePoints2(df, "k", "v")
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    assert(out("root") == ((10, 200.0, 30.0, 30L)))
    assert(out("le")._2 == 0.0 && out("le")._4 == 10L)
    assert(out("gt") == ((20, 100.0, 40.0, 20L)))
  }

  test("changePoints2 ≡ changePoint recursed by hand; empty side " +
    "emits no row") {
    val df = (1 to 50).map(k => (k, (k % 13).toDouble + k / 10.0))
      .toDF("k", "v")
    val tree = TimeSeries.changePoints2(df, "k", "v")
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val root = TimeSeries.changePoint(df, "k", "v").collect().head
    assert(tree("root") == root.toSeq)
    val cp = root.getInt(0)
    val le = TimeSeries.changePoint(df.filter(col("k") <= cp), "k", "v")
      .collect().head
    val gt = TimeSeries.changePoint(df.filter(col("k") > cp), "k", "v")
      .collect().head
    assert(tree("le") == le.toSeq && tree("gt") == gt.toSeq)
    // root at the maximum key → empty gt side → 2 rows only
    val upOnly = (1 to 10).map(k => (k, k.toDouble)).toDF("k", "v")
    val rows = TimeSeries.changePoints2(upOnly, "k", "v").collect()
    assert(rows.length >= 2 && rows.length <= 3)
  }

  // --- peaks ---------------------------------------------------------------

  test("peaks: local maxima with prominence; edges never qualify; " +
    "partitioning-invariant") {
    val vals = Seq(5.0, 1.0, 8.0, 2.0, 3.0, 2.5, 9.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("k", i, v) }
      .toDF("g", "t", "v")
    val out = TimeSeries.peaks(df, "g", "t", "v")
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    // peaks at t=2 (8 over 1/2 → prom 6) and t=4 (3 over 2/2.5 →
    // prom 0.5); edges t=0 (5) and t=6 (9) excluded
    assert(out == Map(2 -> 6.0, 4 -> 0.5))
    val strict = TimeSeries.peaks(df, "g", "t", "v", minProminence = 1.0)
      .collect().map(_.getInt(1)).toSeq
    assert(strict == Seq(2))
    val rep = TimeSeries.peaks(df.repartition(5), "g", "t", "v")
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(rep == out)
    intercept[IllegalArgumentException] {
      TimeSeries.peaks(df, "g", "t", "v", minProminence = -1.0)
    }
  }

  // --- timeWeightedAverage -------------------------------------------------

  test("timeWeightedAverage: hand integral; last point holds zero time") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // v=10 holds 10s, v=20 holds 5s, v=30 holds 0 → (100+100)/15
    val df = Seq(("k", ts(0), 10.0), ("k", ts(10), 20.0),
      ("k", ts(15), 30.0)).toDF("g", "ts", "v")
    val r = TimeSeries.timeWeightedAverage(df, "g", "ts", "v")
      .collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 15L)
    assert(r.getDouble(3) == math.rint(200.0 / 15 * 1e6) / 1e6)
    // oversampled regime does NOT dominate: many samples of v=0 in one
    // second, then v=6 held 9s → twa = 5.4, arithmetic mean ≈ 1
    val burst = (0 to 4).map(i => ("b", ts(0), 0.0)) ++
      Seq(("b", ts(1), 6.0), ("b", ts(10), 0.0))
    val rb = TimeSeries.timeWeightedAverage(burst.toDF("g", "ts", "v"),
      "g", "ts", "v").collect().head
    assert(rb.getDouble(3) == 5.4)
  }

  test("timeWeightedAverage: single point → null; same-second ties " +
    "deterministic under repartition") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val one = Seq(("x", ts(5), 7.0)).toDF("g", "ts", "v")
    val r1 = TimeSeries.timeWeightedAverage(one, "g", "ts", "v")
      .collect().head
    assert(r1.getLong(2) == 0L && r1.isNullAt(3))
    val ties = Seq(("t", ts(0), 3.0), ("t", ts(0), 9.0),
      ("t", ts(4), 1.0)).toDF("g", "ts", "v")
    val a = TimeSeries.timeWeightedAverage(ties, "g", "ts", "v")
      .collect().head
    val b = TimeSeries.timeWeightedAverage(ties.repartition(7), "g",
      "ts", "v").collect().head
    assert(a.toSeq == b.toSeq)
    // (t,v) order: 3 holds 0s, 9 holds 4s → 36/4 = 9
    assert(a.getDouble(3) == 9.0)
  }

  // --- mergeIntervals ------------------------------------------------------

  test("mergeIntervals: overlap, touch, nest merge; gaps split; " +
    "degenerate rows drop") {
    val df = Seq(
      ("k", 1, 5), ("k", 4, 8),     // overlap → [1,8]
      ("k", 8, 10),                 // touch → [1,10]
      ("k", 2, 3),                  // nested
      ("k", 12, 14),                // gap → own island
      ("k", 20, 15),                // start > end → dropped
      ("z", 6, 7))                  // other key untouched
      .toDF("g", "s", "e")
    val out = TimeSeries.mergeIntervals(df, "g", "s", "e")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2),
        r.getLong(3))).toSet
    assert(out == Set(("k", 1, 10, 4L), ("k", 12, 14, 1L),
      ("z", 6, 7, 1L)))
  }

  test("mergeIntervals: duplicate intervals and partitioning do not " +
    "change the sweep") {
    val rows = (1 to 200).map { i =>
      val s = (i * 37) % 500
      ((i % 4).toString, s, s + (i % 25))
    } ++ Seq.fill(10)(("0", 100, 120))
    val df = rows.toDF("g", "s", "e")
    val a = TimeSeries.mergeIntervals(df, "g", "s", "e")
      .collect().map(_.toSeq).toSet
    val b = TimeSeries.mergeIntervals(df.repartition(13), "g", "s", "e")
      .collect().map(_.toSeq).toSet
    assert(a == b)
    // invariant: merged intervals per key are disjoint with gaps
    a.groupBy(_.head).foreach { case (_, ivs) =>
      val sorted = ivs.toSeq.map(r => (r(1).asInstanceOf[Int],
        r(2).asInstanceOf[Int])).sortBy(_._1)
      sorted.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(s2 > e1)
        case _ =>
      }
    }
    // conservation: every input interval lies inside some output
    rows.filter(r => r._2 <= r._3).foreach { case (g, s, e) =>
      assert(a.exists(r => r.head == g &&
        r(1).asInstanceOf[Int] <= s && e <= r(2).asInstanceOf[Int]))
    }
  }

  // --- autocorrelation -----------------------------------------------------

  test("autocorrelation ≡ textbook estimator on a hand series; " +
    "period spike detected") {
    def g9(x: Double): Double = math.rint(x * 1e9) / 1e9
    val vals = Seq(2.0, 4.0, 2.0, 4.0, 2.0, 4.0, 2.0, 4.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("k", i, v) }
      .toDF("g", "t", "v")
    val out = TimeSeries.autocorrelation(df, "g", "t", "v", maxLag = 3)
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val mu = vals.sum / vals.size
    def ref(l: Int): Double = {
      val num = (l until vals.size)
        .map(t => BigDecimal(g9((vals(t) - mu) * (vals(t - l) - mu)))).sum
      val den = vals.map(v => BigDecimal(g9((v - mu) * (v - mu)))).sum
      math.rint((num / den).toDouble * 1e6) / 1e6
    }
    (1 to 3).foreach { l =>
      assert(out(l)._1 == (vals.size - l).toLong)
      assert(out(l)._2 == ref(l), s"lag $l")
    }
    // the alternating series has r1 < 0 < r2 (period-2 cycle)
    assert(out(1)._2 < 0 && out(2)._2 > 0)
  }

  test("autocorrelation: constant series → null r; short keys emit no " +
    "row past their length; groups independent") {
    val df = (Seq.tabulate(6)(i => ("const", i, 5.0)) ++
      Seq(("short", 0, 1.0), ("short", 1, 2.0)))
      .toDF("g", "t", "v")
    val out = TimeSeries.autocorrelation(df, "g", "t", "v", maxLag = 4)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r).toMap
    (1 to 4).foreach(l => assert(out(("const", l)).isNullAt(3)))
    assert(out.contains(("short", 1)) && !out.contains(("short", 2)))
    val out2 = TimeSeries.autocorrelation(df.repartition(7), "g", "t",
        "v", maxLag = 4)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.toSeq).toMap
    assert(out2 == out.map { case (k, r) => k -> r.toSeq })
  }

  // --- seasonalOutliers ----------------------------------------------------

  test("seasonalOutliers flags a planted spike but not the seasonal peak") {
    // 8 weeks of a strong weekly pattern (phase 0 peaks at +30), one
    // corrupted mid-series day (+25 off its pattern)
    val pattern = Array(30.0, 0.0, 2.0, 4.0, 1.0, 3.0, 5.0)
    val rows = (1 to 56).map { d =>
      val base = 100.0 + pattern((d - 1) % 7)
      (d, if (d == 25) base + 25.0 else base)
    }
    val out = TimeSeries.seasonalOutliers(rows.toDF("day", "v"),
        "day", "v", period = 7, k = 3.0)
      .collect().map(r => r.getInt(0) -> r).toMap
    // edge days (first/last 3) have no trend → null flag
    assert(out(1).isNullAt(5) && out(56).isNullAt(5))
    // the corrupted day is flagged
    assert(out(25).getInt(5) == 1)
    // the seasonal peaks near it are NOT (pattern is modeled away);
    // exclude the spike's own MA window (22..28), which it contaminates
    val peaks = Seq(8, 15, 36, 43, 50)
    peaks.foreach(d => assert(out(d).getInt(5) == 0, s"day $d"))
  }

  test("seasonalOutliers ≡ seasonalDecompose + median/MAD fence by hand") {
    val rows = (1 to 35).map(d =>
      (d, 50.0 + (d % 7) * 2.5 + (d % 4) * 1.25))
    val df = rows.toDF("day", "v")
    val out = TimeSeries.seasonalOutliers(df, "day", "v", 7, 3.0)
      .collect().map(r => r.getInt(0) -> r).toMap
    val dec = TimeSeries.seasonalDecompose(df, "day", "v", 7)
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    val resid = dec.values.flatten.toSeq.sorted
    def median(xs: Seq[Double]): Double = {
      val n = xs.size
      if (n % 2 == 1) xs(n / 2) else (xs(n / 2 - 1) + xs(n / 2)) / 2
    }
    val med = median(resid)
    val mad = median(resid.map(x => math.abs(x - med)).sorted)
    out.foreach { case (d, r) =>
      dec(d) match {
        case None => assert(r.isNullAt(5))
        case Some(res) =>
          val expect = math.rint(math.abs(res - med) * 1e9) / 1e9 >
            math.rint(3.0 * mad * 1e9) / 1e9
          assert(r.getInt(5) == (if (expect) 1 else 0), s"day $d")
          assert(r.getDouble(3) == math.rint(med * 1e4) / 1e4)
      }
    }
  }

  test("crossCorrelation: ≡ independent reference on a hand series, " +
    "x=y at lag>=1 ≡ autocorrelation, planted 2-step lead peaks at " +
    "lag 2, constant side null, guards") {
    import org.apache.spark.sql.functions._
    def refCcf(xs: Seq[Double], ys: Seq[Double], lag: Int): Double = {
      def r9(v: Double) = math.rint(v * 1e9) / 1e9
      val mx = r9(xs.map(r9).sum / xs.length)
      val my = r9(ys.map(r9).sum / ys.length)
      val dx = xs.map(v => r9((v - mx) * (v - mx))).sum
      val dy = ys.map(v => r9((v - my) * (v - my))).sum
      val num = (0 until xs.length - lag)
        .map(t => r9((xs(t) - mx) * (ys(t + lag) - my))).sum
      math.rint(num / math.sqrt(dx * dy) * 1e6) / 1e6
    }
    val xs = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0)
    val ys = Seq(2.0, 7.0, 1.0, 8.0, 2.0, 8.0, 1.0, 8.0)
    val df = xs.indices.map(i => ("k", i, xs(i), ys(i)))
      .toDF("g", "t", "x", "y")
    val out = TimeSeries.crossCorrelation(df, "g", "t", "x", "y", 3)
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    for (l <- 0 to 3)
      assert(out(l) == refCcf(xs, ys, l), s"lag $l: ${out(l)}")

    // x = y reduces to the ACF at lags >= 1
    val same = xs.indices.map(i => ("k", i, xs(i), xs(i)))
      .toDF("g", "t", "x", "y")
    val ccf = TimeSeries.crossCorrelation(same, "g", "t", "x", "y", 3)
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    val acf = TimeSeries.autocorrelation(
        xs.indices.map(i => ("k", i, xs(i))).toDF("g", "t", "v"),
        "g", "t", "v", 3)
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    for (l <- 1 to 3) assert(ccf(l) == acf(l), s"lag $l")

    // planted lead: y is x delayed by 2 over a periodic pattern
    val px = (0 until 40).map(i => Seq(1.0, 5.0, 2.0, 8.0)(i % 4))
    val py = (0 until 40).map(i => Seq(1.0, 5.0, 2.0, 8.0)(((i - 2) % 4 + 4) % 4))
    val lead = px.indices.map(i => ("k", i, px(i), py(i)))
      .toDF("g", "t", "x", "y")
    val lr = TimeSeries.crossCorrelation(lead, "g", "t", "x", "y", 3)
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(lr.maxBy(_._2)._1 == 2 && lr(2) > 0.9, lr)

    // constant y → null r at every lag
    val const = xs.indices.map(i => ("k", i, xs(i), 4.0))
      .toDF("g", "t", "x", "y")
    assert(TimeSeries.crossCorrelation(const, "g", "t", "x", "y", 2)
      .collect().forall(_.isNullAt(3)))
    intercept[IllegalArgumentException] {
      TimeSeries.crossCorrelation(df, "g", "t", "x", "y", -1)
    }
  }

test("gapFillInterpolate: hand interior gap, multi-key isolation, " +
    "same-day rows sum first, observed flags") {
    val rows = Seq(
      ("k", "2020-01-01 00:00:00", 3.0),
      ("k", "2020-01-04 00:00:00", 9.0),
      ("k2", "2020-01-02 00:00:00", 1.0),
      ("k2", "2020-01-02 06:00:00", 2.0))
      .toDF("key", "ts", "v")
      .withColumn("ts", to_timestamp($"ts"))
    val out = TimeSeries.gapFillInterpolate(rows, "key", "ts", "v")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getDecimal(2).doubleValue(), r.getInt(3))).toMap
    assert(out(("k", "2020-01-01")) == ((3.0, 1)))
    // 3 + 6*(1/3) = 5, 3 + 6*(2/3) = 7
    assert(out(("k", "2020-01-02")) == ((5.0, 0)))
    assert(out(("k", "2020-01-03")) == ((7.0, 0)))
    assert(out(("k", "2020-01-04")) == ((9.0, 1)))
    // k2: a single day (two rows summed), no synthesized rows
    assert(out(("k2", "2020-01-02")) == ((3.0, 1)))
    assert(out.size == 5)
    // filled is never null (interior gaps only by construction)
    assert(TimeSeries.gapFillInterpolate(rows, "key", "ts", "v")
      .filter($"filled".isNull).count() == 0)
  }

  test("arForecast: hand AR(2) case, p=1 reduction, degenerate nulls, " +
    "guards") {
    // series 1,2,3: mu=2, r1=0, r2=-0.5 -> phi1=0, phi2=-0.5;
    // forecasts: 2.0, 1.5, 2.0, 2.25
    val df = Seq(("k", 1, 1.0), ("k", 2, 2.0), ("k", 3, 3.0))
      .toDF("g", "t", "v")
    val out = TimeSeries.arForecast(df, "g", "t", "v", horizon = 4)
      .orderBy($"step").collect()
      .map(r => r.getInt(1) -> r.getDouble(2)).toMap
    assert(out == Map(1 -> 2.0, 2 -> 1.5, 3 -> 2.0, 4 -> 2.25), out)
    // p = 1: phi1 = r1 = 0 -> every forecast is the mean
    val p1 = TimeSeries.arForecast(df, "g", "t", "v", horizon = 3, p = 1)
      .collect().map(_.getDouble(2))
    assert(p1.forall(_ == 2.0))
    // constant series: zero denominator -> null r -> null forecasts
    val const = Seq(("k", 1, 5.0), ("k", 2, 5.0), ("k", 3, 5.0))
      .toDF("g", "t", "v")
    assert(TimeSeries.arForecast(const, "g", "t", "v", horizon = 2)
      .collect().forall(_.isNullAt(2)))
    intercept[IllegalArgumentException](
      TimeSeries.arForecast(df, "g", "t", "v", horizon = 0))
    intercept[IllegalArgumentException](
      TimeSeries.arForecast(df, "g", "t", "v", horizon = 2, p = 3))
  }

  test("arForecast ≡ an independent driver-side recursion on a " +
    "pseudo-random series; key independence") {
    val vals = (1 to 24).map(i => ((i * 13) % 7).toDouble)
    val df = vals.indices.map(i => ("a", i + 1, vals(i)))
      .toDF("g", "t", "v")
      .unionByName(Seq(("b", 1, 1.0), ("b", 2, 2.0), ("b", 3, 3.0))
        .toDF("g", "t", "v"))
    val out = TimeSeries.arForecast(df, "g", "t", "v", horizon = 3)
      .filter($"g" === "a").orderBy($"step")
      .collect().map(_.getDouble(2)).toSeq
    // reference: the same biased-ACF + Durbin-Levinson closed forms,
    // recomputed from scratch with the 9-grid at every pinned point
    def g9(x: Double) = math.rint(x * 1e9) / 1e9
    def g6(x: Double) = math.rint(x * 1e6) / 1e6
    val n = vals.size
    val mu = g9(vals.map(g9).sum / n)
    val e = vals.map(_ - mu)
    val den = e.map(x => g9(x * x)).sum
    def r(lag: Int) =
      g6((lag until n).map(i => g9(e(i) * e(i - lag))).sum / den)
    val (r1, r2) = (r(1), r(2))
    val phi2 = g9((r2 - r1 * r1) / (1.0 - r1 * r1))
    val phi1 = g9(r1 * (1.0 - phi2))
    var (p1v, p2v) = (g9(vals.last - mu), g9(vals(n - 2) - mu))
    val want = (1 to 3).map { _ =>
      val f = g9(phi1 * p1v + phi2 * p2v)
      p2v = p1v; p1v = f
      g6(mu + f)
    }
    assert(out == want, s"$out vs $want")
    // key b is the hand case, unchanged by a's presence
    val b = TimeSeries.arForecast(df, "g", "t", "v", horizon = 2)
      .filter($"g" === "b").orderBy($"step")
      .collect().map(_.getDouble(2)).toSeq
    assert(b == Seq(2.0, 1.5))
  }

  // --- mannKendall ---------------------------------------------------------

  test("mannKendall: hand cases — mixed, tied, monotone down, S = 0, " +
    "all-tied null, key independence") {
    // (1,3,2,4): S = 4, var = 156/18 → z = 1.019049
    // (1,2,2,3): S = 5, tie t=2 → var = (70-18)/18 → z = 1.44463
    // (5..1): S = -10 → z = -2.204541; (1,2,1): S = 0 → z = 0
    // (7,7,7): var 0 → null z
    val rows =
      Seq(1.0, 3.0, 2.0, 4.0).zipWithIndex.map { case (v, t) => ("a", t.toDouble, v) } ++
      Seq(1.0, 2.0, 2.0, 3.0).zipWithIndex.map { case (v, t) => ("b", t.toDouble, v) } ++
      Seq(5.0, 4.0, 3.0, 2.0, 1.0).zipWithIndex.map { case (v, t) => ("c", t.toDouble, v) } ++
      Seq(1.0, 2.0, 1.0).zipWithIndex.map { case (v, t) => ("d", t.toDouble, v) } ++
      Seq(7.0, 7.0, 7.0).zipWithIndex.map { case (v, t) => ("e", t.toDouble, v) }
    val out = TimeSeries.mannKendall(rows.toDF("k", "t", "v"),
      "k", "t", "v").orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq == Seq(("a", 4L, 4L, 4L), ("b", 4L, 4L, 5L),
      ("c", 5L, 5L, -10L), ("d", 3L, 3L, 0L), ("e", 3L, 3L, 0L)))
    assert(out(0).getDouble(4) == 1.019049)
    assert(out(1).getDouble(4) == 1.44463)
    assert(out(2).getDouble(4) == -2.204541)
    assert(out(3).getDouble(4) == 0.0)
    assert(out(4).isNullAt(4))
  }

  test("mannKendall: duplicate (key, time) fails fast; thinning keeps " +
    "n true and tests the n_used subsample; single point null") {
    intercept[IllegalArgumentException] {
      TimeSeries.mannKendall(
        Seq(("a", 1.0, 1.0), ("a", 1.0, 2.0)).toDF("k", "t", "v"),
        "k", "t", "v").collect()
    }
    val long = (1 to 50).map(i => ("a", i.toDouble, i.toDouble))
    val thin = TimeSeries.mannKendall(long.toDF("k", "t", "v"),
      "k", "t", "v", maxPointsPerKey = 10).collect().head
    assert(thin.getLong(1) == 50L && thin.getLong(2) == 10L)
    // a strictly increasing series stays perfectly concordant on any
    // subset: S = 10*9/2, z from n_used = 10
    assert(thin.getLong(3) == 45L)
    val varS = (10.0 * 9.0 * 25.0) / 18.0
    assert(thin.getDouble(4) ==
      math.rint(44.0 / math.sqrt(varS) * 1e6) / 1e6)
    val one = TimeSeries.mannKendall(
      Seq(("a", 1.0, 5.0)).toDF("k", "t", "v"), "k", "t", "v")
      .collect().head
    assert(one.getLong(3) == 0L && one.isNullAt(4))
  }

  // --- durbinWatson --------------------------------------------------------

  test("durbinWatson: hand case off the published olsFit residuals; " +
    "alternating residuals push toward 4; key independence") {
    // t=1..5, y=(1,2,3,5,4): slope 0.9, intercept 0.3 (4-grid),
    // e=(-.2,-.1,0,1.1,-.8) -> DW = 2.547368
    val a = Seq(1.0, 2.0, 3.0, 5.0, 4.0).zipWithIndex
      .map { case (v, i) => ("a", (i + 1).toDouble, v) }
    // y = 2 + t + alternating ±1 -> refit residuals alternate,
    // DW = 3.547631
    val b = Seq(1.0, -1.0, 1.0, -1.0, 1.0, -1.0).zipWithIndex
      .map { case (e, i) => ("b", (i + 1).toDouble, 2.0 + (i + 1) + e) }
    val out = TimeSeries.durbinWatson((a ++ b).toDF("k", "t", "v"),
      "k", "t", "v").orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 5L), ("b", 6L)))
    assert(out(0).getDouble(2) == 2.547368)
    assert(out(1).getDouble(2) == 3.547631)
  }

  test("durbinWatson: perfect fit → null, single point → null, " +
    "duplicate time fails fast, equals an independent residual fold") {
    val perfect = (1 to 6).map(i => ("p", i.toDouble, 2.0 * i + 1.0))
    val o1 = TimeSeries.durbinWatson(perfect.toDF("k", "t", "v"),
      "k", "t", "v").collect().head
    assert(o1.isNullAt(2))
    val o2 = TimeSeries.durbinWatson(
      Seq(("s", 1.0, 3.0)).toDF("k", "t", "v"), "k", "t", "v")
      .collect().head
    assert(o2.isNullAt(2))
    intercept[IllegalArgumentException] {
      TimeSeries.durbinWatson(
        Seq(("d", 1.0, 1.0), ("d", 1.0, 2.0)).toDF("k", "t", "v"),
        "k", "t", "v").collect()
    }
    // independent fold on pseudo-random data
    val vals = (1 to 40).map(i =>
      ("r", i.toDouble, ((i * 17) % 7).toDouble + 0.3 * i))
    val out = TimeSeries.durbinWatson(vals.toDF("k", "t", "v"),
      "k", "t", "v").collect().head
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    def r9(x: Double) = math.rint(x * 1e9) / 1e9
    val g = vals.map(v => (r4(v._2), r4(v._3)))
    val n = g.size.toDouble
    val sx = g.map(_._1).sum; val sy = g.map(_._2).sum
    val sxy = g.map(v => v._1 * v._2).sum
    val sxx = g.map(v => v._1 * v._1).sum
    // olsFit derives the intercept from the UNROUNDED slope, then
    // rounds both to the 4-grid
    val slopeU = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val slope = r4(slopeU)
    val icept = r4((sy - slopeU * sx) / n)
    val e = g.map(v => r9(v._2 - (icept + slope * v._1)))
    val num = e.sliding(2).map(p => r9((p(1) - p(0)) * (p(1) - p(0)))).sum
    val den = e.map(x => r9(x * x)).sum
    assert(math.abs(out.getDouble(2) - num / den) < 1e-6,
      s"${out.getDouble(2)} vs ${num / den}")
  }
}
