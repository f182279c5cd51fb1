package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** kendallTau + cramersV (FeaturesSpec covers the earlier surface). */
class FeaturesSpec2 extends SparkSpec {
  import spark.implicits._

  // --- kendallTau ----------------------------------------------------------

  private def refTauB(xs: Seq[(Double, Double)]): Option[Double] = {
    var c = 0L; var d = 0L; var tx = 0L; var ty = 0L
    for (i <- xs.indices; j <- (i + 1) until xs.size) {
      val ((x1, y1), (x2, y2)) = (xs(i), xs(j))
      if (x1 == x2 && y1 == y2) { tx += 1; ty += 1 }
      else if (x1 == x2) tx += 1
      else if (y1 == y2) ty += 1
      else if ((x1 < x2) == (y1 < y2)) c += 1
      else d += 1
    }
    val n0 = xs.size.toLong * (xs.size - 1) / 2
    val den = math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble)
    if (den > 0) Some(math.rint((c - d) / den * 1e6) / 1e6) else None
  }

  test("kendallTau: perfect monotone → ±1; matches brute force with heavy ties") {
    val up = (1 to 20).map(i => (i.toDouble, i * 2.0)).toDF("x", "y")
    assert(Features.kendallTau(up, "x", "y").collect().head.getDouble(3) == 1.0)
    val down = (1 to 20).map(i => (i.toDouble, -i * 2.0)).toDF("x", "y")
    assert(Features.kendallTau(down, "x", "y")
      .collect().head.getDouble(3) == -1.0)

    val data = (1 to 150).map(i => ((i * 31 % 6).toDouble, (i * 17 % 5).toDouble))
    val r = Features.kendallTau(data.toDF("x", "y"), "x", "y").collect().head
    assert(r.getLong(0) == 150L)
    assert(r.getDouble(3) == refTauB(data).get)
    // pair identity: C + D + mixed ties = n0 is implied by brute equality;
    // still sanity-check C/D against the reference counters
    var c = 0L; var d = 0L
    for (i <- data.indices; j <- (i + 1) until data.size) {
      val ((x1, y1), (x2, y2)) = (data(i), data(j))
      if (x1 != x2 && y1 != y2) {
        if ((x1 < x2) == (y1 < y2)) c += 1 else d += 1
      }
    }
    assert(r.getLong(1) == c && r.getLong(2) == d)
  }

  test("kendallTau: constant column → null; nulls drop") {
    val const = Seq((1.0, Some(5.0)), (2.0, Some(5.0)), (3.0, None))
      .toDF("x", "y")
    val r = Features.kendallTau(const, "x", "y").collect().head
    assert(r.getLong(0) == 2L)
    assert(r.isNullAt(3))
  }

  // --- theilU --------------------------------------------------------------

  test("theilU: asymmetric many-to-one mapping — a determines b, not vice versa") {
    // a ∈ {1..4} uniform; b = a mod 2: knowing a fixes b (U(b|a) = 1),
    // knowing b halves a's uncertainty (U(a|b) = 1/2 for uniform a)
    val df = (1 to 80).map(i => ((i % 4).toString, (i % 2).toString))
      .toDF("a", "b")
    val r = Features.theilU(df, "a", "b").collect().head
    assert(r.getDouble(3) == 1.0)   // u_b_given_a
    assert(r.getDouble(2) == 0.5)   // u_a_given_b
  }

  test("theilU: independence → 0 both ways; constant column → null that direction") {
    val indep = (for (a <- Seq("x", "y"); b <- Seq("p", "q"); _ <- 1 to 5)
      yield (a, b)).toDF("a", "b")
    val ri = Features.theilU(indep, "a", "b").collect().head
    assert(ri.getDouble(2) == 0.0 && ri.getDouble(3) == 0.0)
    val const = Seq(("k", "p"), ("k", "q")).toDF("a", "b")
    val rc = Features.theilU(const, "a", "b").collect().head
    assert(rc.isNullAt(2))          // H(a) = 0
    assert(rc.getDouble(3) == 0.0)  // mi = 0, H(b) > 0
  }

  // --- cramersV ------------------------------------------------------------

  test("cramersV: perfect association → 1, independence → 0, textbook value") {
    val perfect = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("u", "w")
    val rp = Features.cramersV(perfect, "u", "w").collect().head
    assert(rp.getDouble(4) == 1.0)
    val indep = (for (a <- Seq("a", "b"); b <- Seq("x", "y"); _ <- 1 to 5)
      yield (a, b)).toDF("u", "w")
    assert(Features.cramersV(indep, "u", "w").collect().head.getDouble(4) == 0.0)
    // hand 2x2: [[10, 20], [30, 40]] → chi2 = 100/21·... compute directly
    val counts = Seq(("a", "x", 10), ("a", "y", 20), ("b", "x", 30), ("b", "y", 40))
    val df = counts.flatMap { case (a, b, k) => Seq.fill(k)((a, b)) }.toDF("u", "w")
    val r = Features.cramersV(df, "u", "w").collect().head
    val n = 100.0
    val g9 = (x: Double) => math.rint(x * 1e9) / 1e9
    val chi = Seq((10.0, 30 * 40 / n), (20.0, 30 * 60 / n),
      (30.0, 70 * 40 / n), (40.0, 70 * 60 / n))
      .map { case (o, e) => BigDecimal(g9((o - e) * (o - e) / e)) }.sum.toDouble
    assert(r.getDouble(3) == math.rint(chi * 1e4) / 1e4)
    assert(r.getDouble(4) == math.rint(math.sqrt(chi / n) * 1e6) / 1e6)
  }

  test("cramersV: degenerate 1xk table → null V") {
    val df = Seq(("only", "x"), ("only", "y")).toDF("u", "w")
    val r = Features.cramersV(df, "u", "w").collect().head
    assert(r.getLong(1) == 1L && r.isNullAt(4))
  }

  // --- gTest ---------------------------------------------------------------

  test("gTest: exact independence → every cell contributes 0") {
    val indep = (for (a <- Seq("a", "b"); b <- Seq("x", "y"); _ <- 1 to 5)
      yield (a, b)).toDF("u", "w")
    val out = Features.gTest(indep, "u", "w").collect()
    assert(out.length == 4)
    assert(out.forall(_.getDouble(4) == 0.0))
    assert(out.forall(_.getDouble(3) == 5.0))
  }

  test("gTest: hand 2x2 — cells match 2·o·ln(o/e); total = 2N·MI(nats)") {
    // [[30, 10], [10, 30]]: every expected count is 20
    val counts = Seq(("a", "x", 30), ("a", "y", 10),
      ("b", "x", 10), ("b", "y", 30))
    val df = counts.flatMap { case (a, b, k) => Seq.fill(k)((a, b)) }
      .toDF("u", "w")
    val out = Features.gTest(df, "u", "w")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val g6 = (x: Double) => math.rint(x * 1e6) / 1e6
    assert(out(("a", "x")) == ((30L, 20.0, g6(60.0 * math.log(1.5)))))
    assert(out(("a", "y")) == ((10L, 20.0, g6(20.0 * math.log(0.5)))))
    // G total ≡ 2N·Σ p·ln(p/(pa·pb)) — the mutual-information bridge
    val g = out.values.map(v => BigDecimal(v._3)).sum.toDouble
    val mi = Seq(30, 10, 10, 30).map(_ / 80.0)
      .zip(Seq((0.5, 0.5), (0.5, 0.5), (0.5, 0.5), (0.5, 0.5)))
      .map { case (p, (pa, pb)) => p * math.log(p / (pa * pb)) }.sum
    assert(math.abs(g - 2 * 80 * mi) < 1e-4)
  }

  // --- weightedMedian ------------------------------------------------------

  test("weightedMedian: hand case, unit weights ≡ lower median, a " +
    "dominant weight wins outright") {
    // values 1(w1), 2(w1), 3(w5): half of 7 is 3.5 → first cum ≥ 3.5 is 3
    val df = Seq(("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 5.0))
      .toDF("grp", "v", "w")
    val r = Features.weightedMedian(df, "grp", "v", "w").collect().head
    assert(r.getLong(1) == 3L && r.getDouble(3) == 3.0)
    // unit weights: lower median of {1,2,2,4} = 2
    val unit = Seq(("u", 1.0), ("u", 2.0), ("u", 2.0), ("u", 4.0))
      .toDF("grp", "v").withColumn("w", lit(1.0))
    assert(Features.weightedMedian(unit, "grp", "v", "w")
      .collect().head.getDouble(3) == 2.0)
    // one heavy row dominates regardless of the crowd
    val dom = ((1 to 50).map(i => ("d", i.toDouble, 0.1)) :+
      (("d", 99.0, 1000.0))).toDF("grp", "v", "w")
    assert(Features.weightedMedian(dom, "grp", "v", "w")
      .collect().head.getDouble(3) == 99.0)
  }

  test("weightedMedian: exact half-boundary takes the LOWER value; " +
    "non-positive/null weights drop; partitioning-invariant") {
    // weights 1,1 over values 1,2: cum(1)*2 = 2 = tot → v=1 qualifies
    val half = Seq(("h", 1.0, 1.0), ("h", 2.0, 1.0)).toDF("grp", "v", "w")
    assert(Features.weightedMedian(half, "grp", "v", "w")
      .collect().head.getDouble(3) == 1.0)
    val messy = Seq(("m", 5.0, Some(0.0)), ("m", 6.0, Some(-1.0)),
      ("m", 7.0, None), ("m", 8.0, Some(2.0))).toDF("grp", "v", "w")
    val rm = Features.weightedMedian(messy, "grp", "v", "w")
      .collect().head
    assert(rm.getLong(1) == 1L && rm.getDouble(3) == 8.0)
    val big = (1 to 300).map(i =>
      ((i % 3).toString, (i % 19).toDouble, (i % 7 + 1).toDouble))
      .toDF("grp", "v", "w")
    val a = Features.weightedMedian(big, "grp", "v", "w")
      .collect().map(_.toSeq).toSet
    val b = Features.weightedMedian(big.repartition(11), "grp", "v", "w")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  // --- quantileTransform ---------------------------------------------------

  test("quantileTransform: midrank positions — hand case, symmetry, " +
    "ties share one row") {
    // g: values 1,2,2,4 → levels (1,c1,u=0.125) (2,c2,u=0.5) (4,c1,u=0.875)
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 2.0), ("g", 4.0))
      .toDF("grp", "v")
    val out = Features.quantileTransform(df, "grp", "v")
      .collect().map(r => r.getDouble(1) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out == Map(1.0 -> ((1L, 0.125)), 2.0 -> ((2L, 0.5)),
      4.0 -> ((1L, 0.875))))
    // symmetry: u(v) + u(-v reversed) = 1
    val neg = Features.quantileTransform(
        df.select(col("grp"), (-col("v")).as("v")), "grp", "v")
      .collect().map(r => r.getDouble(1) -> r.getDouble(3)).toMap
    out.foreach { case (v, (_, u)) => assert(neg(-v) + u == 1.0) }
  }

  test("quantileTransform: groups independent; u strictly increasing " +
    "in value; partitioning-invariant") {
    val df = (1 to 100).map(i =>
      ((i % 3).toString, (i % 13).toDouble)).toDF("grp", "v")
    val rows = Features.quantileTransform(df, "grp", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2).map(_._3).toSeq
      assert(sorted == sorted.sorted && sorted.distinct == sorted)
    }
    val again = Features.quantileTransform(df.repartition(11), "grp", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(3)))
      .sortBy(r => (r._1, r._2))
    assert(again.toSeq == rows.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("gTest matches chiSquare's margins and beats it on a sparse cell") {
    val df = Seq.fill(50)(("a", "x")) ++ Seq.fill(1)(("a", "y")) ++
      Seq.fill(40)(("b", "x")) ++ Seq.fill(9)(("b", "y"))
    val gt = Features.gTest(df.toDF("u", "w"), "u", "w")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ch = Features.chiSquare(df.toDF("u", "w"), "u", "w")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // identical cell universe, identical obs and expected
    assert(gt.keySet == ch.keySet)
    gt.foreach { case (k, r) =>
      assert(r.getLong(2) == ch(k).getLong(2))
      assert(r.getDouble(3) == ch(k).getDouble(3))
    }
  }

  test("trimmedMean: ties across the cut trim by exact level-grid " +
    "mass; frac 0 = plain mean; over-trimmed group nulls") {
    import spark.implicits._
    // 10 values with ties straddling the 20% cut: sorted
    // [1,1,1,2,3,4,5,6,9,9], k = 2 → keep [1,2,3,4,5,6] → mean 3.5
    val vals = Seq(1.0, 1.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 9.0, 9.0)
    val df = vals.map(("g", _)).toDF("g", "v")
    val r = Features.trimmedMean(df, "g", "v", frac = 0.2).collect().head
    assert(r.getLong(1) == 10L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 3.5)
    val plain = Features.trimmedMean(df, "g", "v", frac = 0.0)
      .collect().head
    assert(plain.getDouble(3) == math.rint(vals.sum / 10 * 1e6) / 1e6)
    // 2 values at frac 0.49 → k = 0 keeps both; 1 value trims nothing
    val tiny = Seq(("h", 5.0), ("h", 7.0)).toDF("g", "v")
    assert(Features.trimmedMean(tiny, "g", "v", 0.49)
      .collect().head.getDouble(3) == 6.0)
    intercept[IllegalArgumentException] {
      Features.trimmedMean(df, "g", "v", 0.5)
    }
  }

  test("huberRegression ≡ an independent driver-side IRLS on the same " +
    "9-grid; a wild outlier barely moves the robust slope where it " +
    "drags OLS; huge delta reduces to OLS") {
    import spark.implicits._
    val pts = (1 to 20).map(i => ("k", i.toDouble, 2.0 * i + 1)) :+
      (("k", 21.0, 500.0)) // wild outlier
    val df = pts.toDF("g", "x", "y")
    def r9(v: Double) = math.rint(v * 1e9) / 1e9
    // independent IRLS mirror
    def irls(delta: Double, iters: Int): (Double, Double, Long) = {
      val data = pts.map(p => (p._2, p._3))
      var (b0, b1) = (0.0, 0.0)
      var ndw = 0L
      def w(x: Double, y: Double, first: Boolean): Double =
        if (first) 1.0
        else {
          val r = math.abs(y - (b0 + b1 * x))
          if (r <= delta) 1.0 else delta / r
        }
      for (it <- 0 to iters) {
        val ws = data.map { case (x, y) => r9(w(x, y, it == 0)) }
        ndw = ws.count(_ < 1.0)
        val sw = ws.map(r9).map(BigDecimal(_)).sum
        val swx = data.zip(ws).map { case ((x, _), wv) => BigDecimal(r9(wv * x)) }.sum
        val swy = data.zip(ws).map { case ((_, y), wv) => BigDecimal(r9(wv * y)) }.sum
        val swxx = data.zip(ws).map { case ((x, _), wv) => BigDecimal(r9(wv * x * x)) }.sum
        val swxy = data.zip(ws).map { case ((x, y), wv) => BigDecimal(r9(wv * x * y)) }.sum
        val (dsw, dswx, dswy, dswxx, dswxy) =
          (sw.toDouble, swx.toDouble, swy.toDouble, swxx.toDouble,
            swxy.toDouble)
        b1 = r9((dsw * dswxy - dswx * dswy) / (dsw * dswxx - dswx * dswx))
        b0 = r9((dswy - b1 * dswx) / dsw)
      }
      (b1, b0, ndw)
    }
    val (eb1, eb0, endw) = irls(delta = 5.0, iters = 2)
    val out = Features.huberRegression(df, "g", "x", "y", delta = 5.0,
      iters = 2).collect().head
    assert(out.getLong(1) == 21L)
    assert(out.getLong(2) == endw)
    assert(out.getDouble(3) == math.rint(eb1 * 1e6) / 1e6)
    assert(out.getDouble(4) == math.rint(eb0 * 1e6) / 1e6)
    // robustness: the OLS slope is dragged far above 2 by the outlier;
    // the Huber slope stays near 2
    val ols = Features.huberRegression(df, "g", "x", "y",
      delta = 1e9, iters = 2).collect().head
    assert(ols.getDouble(3) > 4.0, s"OLS-equivalent dragged: $ols")
    assert(math.abs(out.getDouble(3) - 2.0) < 0.5,
      s"Huber resists the outlier: ${out.getDouble(3)}")
    intercept[IllegalArgumentException] {
      Features.huberRegression(df, "g", "x", "y", delta = 0.0)
    }
  }

  // --- oneHot --------------------------------------------------------------

  test("oneHot: indicator columns in sorted vocabulary order, " +
    "multi-column, null → all zeros, name sanitization") {
    val df = Seq(
      (1L, Some("1-URGENT"), Some("x")),
      (2L, Some("5-LOW"), Some("y")),
      (3L, Some("1-URGENT"), None),
      (4L, None, Some("x"))).toDF("id", "prio", "tag")
    val out = Features.oneHot(df, Seq("prio", "tag"))
    assert(out.columns.toSeq == Seq("id", "prio", "tag",
      "prio_1_URGENT", "prio_5_LOW", "tag_x", "tag_y"))
    val rows = out.orderBy("id").collect()
    assert(rows.map(r => (r.getInt(3), r.getInt(4), r.getInt(5),
      r.getInt(6))).toSeq == Seq(
      (1, 0, 1, 0), (0, 1, 0, 1), (1, 0, 0, 0), (0, 0, 1, 0)))
    // schema is deterministic across reruns
    assert(Features.oneHot(df, Seq("prio", "tag")).columns.toSeq ==
      out.columns.toSeq)
  }

  test("oneHot: cardinality valve, name collisions, int categories " +
    "via stringification") {
    val wide = (1 to 20).map(i => (i.toLong, s"c$i"))
      .toDF("id", "c")
    intercept[IllegalArgumentException] {
      Features.oneHot(wide, Seq("c"), maxCategories = 10)
    }
    val clash = Seq((1L, "a b"), (2L, "a_b")).toDF("id", "c")
    intercept[IllegalArgumentException] {
      Features.oneHot(clash, Seq("c"))
    }
    val ints = Seq((1L, 7), (2L, 9), (3L, 7)).toDF("id", "k")
    val out = Features.oneHot(ints, Seq("k")).orderBy("id").collect()
    assert(out.map(r => (r.getInt(2), r.getInt(3))).toSeq ==
      Seq((1, 0), (0, 1), (1, 0)))
    // CROSS-column collision: col 'x' value 'y_z' and col 'x_y' value
    // 'z' both sanitize to x_y_z — must fail fast, not emit a
    // duplicate-named schema
    val cross = Seq((1L, "y_z", "z")).toDF("id", "x", "x_y")
    intercept[IllegalArgumentException] {
      Features.oneHot(cross, Seq("x", "x_y"))
    }
    // collision with a PRE-EXISTING dataframe column
    val pre = Seq((1L, "b", 9)).toDF("id", "a", "a_b")
    intercept[IllegalArgumentException] {
      Features.oneHot(pre, Seq("a"))
    }
  }

  test("woeEncode: hand-checked smoothed shares, IV signs, null " +
    "handling, non-binary target fails the job") {
    // cat a: 3 pos / 1 neg; cat b: 1 pos / 3 neg; k = 2, alpha = 0.5
    // p_a = 3.5/5, q_a = 1.5/5; p_b = 1.5/5, q_b = 3.5/5 (mirrored)
    val df = Seq(
      ("a", 1), ("a", 1), ("a", 1), ("a", 0),
      ("b", 1), ("b", 0), ("b", 0), ("b", 0))
      .toDF("c", "y")
    val out = Features.woeEncode(df, "c", "y")
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    val woeA = math.rint(math.log((3.5 / 5.0) / (1.5 / 5.0)) * 1e6) / 1e6
    val ivA = math.rint((3.5 / 5.0 - 1.5 / 5.0) *
      math.log((3.5 / 5.0) / (1.5 / 5.0)) * 1e6) / 1e6
    assert(out("a") == ((4L, 3L, 1L, woeA, ivA)))
    // mirrored counts: woe negates exactly, iv_term is identical
    assert(out("b")._4 == -woeA && out("b")._5 == ivA)

    // null target drops; null CATEGORY is a real level
    val nulls = Seq((Some("a"), Some(1)), (Some("a"), None),
      (None, Some(0))).toDF("c", "y")
    val served = Features.woeEncode(nulls, "c", "y").collect()
    assert(served.length == 2 &&
      served.exists(r => r.isNullAt(0) && r.getLong(1) == 1L))

    // single-class category stays finite under smoothing
    val oneClass = Seq(("a", 1), ("a", 1), ("b", 0)).toDF("c", "y")
    val fin = Features.woeEncode(oneClass, "c", "y")
      .select("woe").as[Double].collect()
    assert(fin.forall(w => !w.isInfinite && !w.isNaN))

    // non-0/1 target is corrupt input, not a skippable row
    val bad = Seq(("a", 2)).toDF("c", "y")
    intercept[Exception] {
      Features.woeEncode(bad, "c", "y").collect()
    }
    // a FRACTIONAL double target must also fail — the valve checks the
    // original value, not the long-truncated one (0.7 → 0 would
    // otherwise silently pass)
    val frac = Seq(("a", 0.7), ("a", 1.0)).toDF("c", "y")
    intercept[Exception] {
      Features.woeEncode(frac, "c", "y").collect()
    }
    intercept[IllegalArgumentException](
      Features.woeEncode(df, "c", "y", alpha = -1.0))
  }

  test("tukeyFences: hand case, outlier counts against unrounded " +
    "fences, no-outlier group, k = 0 degenerates to the IQR box") {
    // group a: 1..8 plus outliers -100 and 100; n = 10
    // percentile interpolation on sorted [-100,1..8,100]:
    //   q1 = v[2.25] = 2 + 0.25 = 2.25; q3 = v[6.75] = 6.75
    //   iqr = 4.5 -> lo = -4.5, hi = 13.5 -> one low, one high
    val a = (1 to 8).map(v => ("a", v.toDouble)) ++
      Seq(("a", -100.0), ("a", 100.0))
    val b = (1 to 5).map(v => ("b", v.toDouble)) // tight: no outliers
    val df = (a ++ b).toDF("g", "v")
    val out = Features.tukeyFences(df, "g", "v")
      .as[(String, Long, Double, Double, Double, Double, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(out("a") == (("a", 10L, 2.25, 6.75, -4.5, 13.5, 1L, 1L)))
    assert(out("b")._7 == 0L && out("b")._8 == 0L)
    // k = 0: fences collapse to the box; everything outside Q1..Q3
    val zero = Features.tukeyFences(df.filter($"g" === "b"), "g", "v",
        k = 0.0)
      .as[(String, Long, Double, Double, Double, Double, Long, Long)]
      .collect().head
    assert(zero._5 == zero._3 && zero._6 == zero._4)
    assert(zero._7 == 1L && zero._8 == 1L) // 1 and 5 outside [2, 4]
    // nulls drop; invalid k refuses
    val withNull = Seq(("a", Some(1.0)), ("a", None)).toDF("g", "v")
    assert(Features.tukeyFences(withNull, "g", "v")
      .select("n").as[Long].collect().head == 1L)
    intercept[IllegalArgumentException](
      Features.tukeyFences(df, "g", "v", k = -0.1))
  }
}
