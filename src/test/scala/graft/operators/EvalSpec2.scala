package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** bootstrapCi + randomizationTest (EvalSpec covers the earlier
  * eval/drift surface). */
class EvalSpec2 extends SparkSpec {
  import spark.implicits._

  // independent reference for the md5 uniform + pinned Poisson(1)
  // inverse CDF (the bootstrapCi definition, recomputed from scratch)
  private def refUniform(salt: String, id: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((salt + id).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 13), 16) + 1.0) /
      4503599627370496.0
  }
  private val cdf = Array(0.36787944117144233, 0.7357588823428847,
    0.9196986029286058, 0.9810118431238463, 0.9963401531726563,
    0.9994058151824183, 0.999916758850712, 0.9999897508033253,
    0.999998874797402)
  private def refPoisson(u: Double): Int = {
    val i = cdf.indexWhere(u <= _); if (i < 0) 9 else i
  }
  private def g9(x: Double): Double = math.rint(x * 1e9) / 1e9
  private def g6(x: Double): Double = math.rint(x * 1e6) / 1e6

  // --- bootstrapCi ---------------------------------------------------------

  test("bootstrapCi ≡ independent driver-side Poisson bootstrap") {
    val vals = (1 to 40).map(i => ("g", i.toString, (i % 7) * 1.5 + 2.0))
    val df = vals.toDF("g", "id", "v")
    val r = Eval.bootstrapCi(df, "g", "id", "v", b = 50, alpha = 0.1,
      salt = "tb").collect().head
    // reference replicate means
    val reps = (1 to 50).flatMap { rr =>
      val ws = vals.map { case (_, id, v) =>
        (refPoisson(refUniform("tb", s"$id#$rr")), v) }
      val wsum = ws.map(_._1).sum
      if (wsum == 0) None
      else Some(g9(ws.map { case (w, v) =>
        BigDecimal(g9(w * v)) }.sum.toDouble / wsum))
    }.sorted
    val bEff = reps.size
    val lo = reps(math.ceil(bEff * 0.05).toInt - 1)
    val hi = reps(math.ceil(bEff * 0.95).toInt - 1)
    assert(r.getLong(1) == 40L)
    assert(r.getLong(3) == bEff.toLong)
    assert(r.getDouble(4) == g6(lo))
    assert(r.getDouble(5) == g6(hi))
    assert(r.getDouble(2) ==
      g6(vals.map(v => BigDecimal(g9(v._3))).sum.toDouble / 40))
  }

  test("bootstrapCi: CI brackets the mean and is partitioning-invariant") {
    val df = (1 to 200).map(i => (if (i % 2 == 0) "a" else "b",
      i.toString, 10.0 + (i % 13))).toDF("g", "id", "v")
    val a = Eval.bootstrapCi(df, "g", "id", "v", b = 80)
      .orderBy("g").collect().toSeq
    a.foreach { r =>
      assert(r.getDouble(4) <= r.getDouble(2) &&
        r.getDouble(2) <= r.getDouble(5))
    }
    val b = Eval.bootstrapCi(df.repartition(17), "g", "id", "v", b = 80)
      .orderBy("g").collect().toSeq
    assert(a == b)
    intercept[IllegalArgumentException] {
      Eval.bootstrapCi(df, "g", "id", "v", b = 5)
    }
    intercept[IllegalArgumentException] {
      Eval.bootstrapCi(df, "g", "id", "v", alpha = 1.5)
    }
  }

  test("bootstrapCi: degenerate constant column → zero-width CI at the mean") {
    val df = (1 to 30).map(i => ("g", i.toString, 7.0)).toDF("g", "id", "v")
    val r = Eval.bootstrapCi(df, "g", "id", "v", b = 40).collect().head
    assert(r.getDouble(2) == 7.0)
    assert(r.getDouble(4) == 7.0 && r.getDouble(5) == 7.0)
  }

  // --- laplaceNoisyCounts --------------------------------------------------

  test("laplaceNoisyCounts ≡ the inverse-CDF replay; noisy − true = " +
    "noise; guards") {
    val df = (1 to 100).map(i => ((i % 4).toString)).toDF("g")
    val out = Eval.laplaceNoisyCounts(df, "g", epsilon = 0.5,
        salt = "td")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    out.foreach { case (g, (n, noise, noisy)) =>
      val u = refUniform("td", g)
      val c = u - 0.5
      val expect = g9(-(1.0 / 0.5) * math.signum(c) *
        math.log(1.0 - 2.0 * math.abs(c)))
      assert(noise == g6(expect), g)
      assert(noisy == g6(n + expect), g)
      assert(n == 25L)
    }
    intercept[IllegalArgumentException] {
      Eval.laplaceNoisyCounts(df, "g", epsilon = 0.0)
    }
  }

  // --- poissonRateTest -----------------------------------------------------

  test("poissonRateTest: equal rates → ratio 1 and z 0; hand case; " +
    "zero side → nulls") {
    val df = (Seq.fill(10)("a") ++ Seq.fill(5)("b") ++ Seq.fill(3)("c"))
      .toDF("v")
    val eq = Eval.poissonRateTest(df, "v", "a", "b", 2.0, 1.0)
      .collect().head
    assert(eq.getLong(0) == 10L && eq.getLong(1) == 5L)
    assert(eq.getDouble(2) == 5.0 && eq.getDouble(3) == 5.0)
    assert(eq.getDouble(4) == 1.0 && eq.getDouble(5) == 0.0)
    // 10 vs 5 at equal exposure: ratio 2, z = ln 2 / sqrt(0.1 + 0.2)
    val r = Eval.poissonRateTest(df, "v", "a", "b", 1.0, 1.0)
      .collect().head
    assert(r.getDouble(4) == 2.0)
    assert(r.getDouble(5) ==
      g6(math.log(2.0) / math.sqrt(1.0 / 10 + 1.0 / 5)))
    val z0 = Eval.poissonRateTest(df, "v", "a", "missing", 1.0, 1.0)
      .collect().head
    assert(z0.getLong(1) == 0L && z0.isNullAt(4) && z0.isNullAt(5))
    intercept[IllegalArgumentException] {
      Eval.poissonRateTest(df, "v", "a", "b", 0.0, 1.0)
    }
  }

  // --- psiOverTime ---------------------------------------------------------

  test("psiOverTime ≡ per-period psi against the fixed reference; " +
    "a period missing bins still scores (dense zeros)") {
    val ref = (1 to 300).map(i => ((i % 31).toDouble)).toDF("v")
    val cur = ((1 to 200).map(i => (1, (i % 29).toDouble)) ++
      (1 to 150).map(i => (2, 25.0 + (i % 6)))) // period 2: top bins only
      .toDF("p", "v")
    val out = Eval.psiOverTime(ref, cur, "v", "p")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    Seq(1, 2).foreach { per =>
      val terms = Eval.psi(ref, cur.filter(col("p") === per), "v")
        .collect().map(r => BigDecimal(r.getDouble(5)))
      assert(out(per)._3 == math.rint(terms.sum.toDouble * 1e6) / 1e6,
        s"period $per")
      assert(out(per)._1 == 300L)
    }
    // the concentrated period drifts far more than the matched one
    assert(out(2)._3 > out(1)._3 + 1.0)
  }

  // --- lorenzCurve ---------------------------------------------------------

  test("lorenzCurve: equality → diagonal; total concentration → step; " +
    "tie-cut takes the exact partial share") {
    val equal = (1 to 10).map(_ => ("e", 2.0)).toDF("g", "v")
    val re = Eval.lorenzCurve(equal, "g", "v")
      .collect().map(r => r.getInt(1) -> (r.getDouble(3), r.getDouble(4)))
      .toMap
    (1 to 10).foreach(k => assert(re(k)._1 == re(k)._2, s"decile $k"))
    val conc = ((1 to 9).map(_ => ("c", 0.0)) :+ (("c", 100.0)))
      .toDF("g", "v")
    val rc = Eval.lorenzCurve(conc, "g", "v")
      .collect().map(r => r.getInt(1) -> r.getDouble(4)).toMap
    (1 to 9).foreach(k => assert(rc(k) == 0.0))
    assert(rc(10) == 1.0)
    // [1,1,1,3], 2 deciles: rank 2 cuts inside the 1-level → 2/6
    val cut = Seq(("t", 1.0), ("t", 1.0), ("t", 1.0), ("t", 3.0))
      .toDF("g", "v")
    val rt = Eval.lorenzCurve(cut, "g", "v", deciles = 2)
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getDouble(4)))
      .toMap
    assert(rt(1) == ((2L, math.rint(2.0 / 6 * 1e6) / 1e6)))
    assert(rt(2) == ((4L, 1.0)))
  }

  test("lorenzCurve: groups independent, exactly deciles rows each, " +
    "monotone shares below the diagonal; partitioning-invariant") {
    val df = (1 to 300).map(i =>
      ((i % 3).toString, ((i * 17) % 41).toDouble)).toDF("g", "v")
    val rows = Eval.lorenzCurve(df, "g", "v").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(3),
        r.getDouble(4)))
    rows.groupBy(_._1).foreach { case (g, rs) =>
      assert(rs.length == 10, g)
      val shares = rs.sortBy(_._2).map(_._4).toSeq
      assert(shares == shares.sorted)
      rs.foreach { case (_, _, pf, vs) => assert(vs <= pf + 1e-9) }
      assert(shares.last == 1.0)
    }
    val again = Eval.lorenzCurve(df.repartition(13), "g", "v").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(3),
        r.getDouble(4))).sortBy(r => (r._1, r._2))
    assert(again.toSeq == rows.sortBy(r => (r._1, r._2)).toSeq)
  }

  // --- psiSweep ------------------------------------------------------------

  test("psiSweep ≡ per-column psi; identical frames → 0; constant " +
    "column → 0") {
    val ref = (1 to 200).map(i =>
      ((i % 29).toDouble, (i % 7).toDouble, 5.0)).toDF("a", "b", "c")
    val cur = (1 to 180).map(i =>
      (((i * 3) % 31).toDouble, (i % 7).toDouble, 5.0)).toDF("a", "b", "c")
    val sweep = Eval.psiSweep(ref, cur, Seq("a", "b", "c"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    Seq("a", "b", "c").foreach { c =>
      val terms = Eval.psi(ref, cur, c).collect()
        .map(r => BigDecimal(r.getDouble(5)))
      val expected = math.rint(terms.sum.toDouble * 1e6) / 1e6
      assert(sweep(c)._3 == expected, c)
      assert(sweep(c)._1 == 200L && sweep(c)._2 == 180L)
    }
    // b: near-identical mod-7 distributions (200 vs 180 rows leave a
    // sub-millipoint remainder effect) — tiny but not zero
    assert(sweep("b")._3 < 0.001)
    assert(sweep("c")._3 == 0.0) // constant
    assert(sweep("a")._3 > 0.0)  // planted drift
    val same = Eval.psiSweep(ref, ref, Seq("a", "b", "c"))
      .collect().map(_.getDouble(3))
    assert(same.forall(_ == 0.0))
  }

  // --- jsDivergenceTerms ---------------------------------------------------

  test("jsDivergenceTerms: terms sum to the corpus JSD; a vanished " +
    "item dominates") {
    val a = (Seq.fill(50)("common") ++ Seq.fill(30)("gone") ++
      Seq.fill(20)("rare")).toDF("i")
    val b = (Seq.fill(55)("common") ++ Seq.fill(45)("rare")).toDF("i")
    val terms = Eval.jsDivergenceTerms(a, b, "i", k = 10).collect()
    assert(terms.length == 3)
    // 'gone' (30% → 0%) out-drifts 'rare' (20% → 45%) and 'common'
    assert(terms.head.getString(0) == "gone")
    assert(terms.head.getLong(1) == 30L && terms.head.getLong(2) == 0L)
    val total = terms.map(r => BigDecimal(r.getDouble(3))).sum.toDouble
    val jsd = Eval.jsDivergence(a, b, "i").collect().head.getDouble(3)
    assert(math.rint(total * 1e6) / 1e6 == jsd)
    // k truncates deterministically
    assert(Eval.jsDivergenceTerms(a, b, "i", k = 2).collect().length == 2)
  }

  // --- randomizationTest ---------------------------------------------------

  test("randomizationTest ≡ independent driver-side replay") {
    val rows = (1 to 30).map(i =>
      (i.toString, if (i % 3 == 0) "x" else "y",
        if (i % 3 == 0) 5.0 + i % 4 else 2.0 + i % 5))
    val df = rows.toDF("id", "variant", "v")
    val r = Eval.randomizationTest(df, "id", "variant", "v", "x", "y",
      b = 60, salt = "tp").collect().head
    val as = rows.filter(_._2 == "x"); val bs = rows.filter(_._2 == "y")
    val dObs = g9(
      as.map(x => BigDecimal(g9(x._3))).sum.toDouble / as.size -
      bs.map(x => BigDecimal(g9(x._3))).sum.toDouble / bs.size)
    val frac = as.size.toDouble / (as.size + bs.size)
    val drs = (1 to 60).flatMap { rr =>
      val (pa, pb) = rows.partition(x =>
        refUniform("tp", s"${x._1}#$rr") < frac)
      if (pa.isEmpty || pb.isEmpty) None
      else Some(g9(
        pa.map(x => BigDecimal(g9(x._3))).sum.toDouble / pa.size -
        pb.map(x => BigDecimal(g9(x._3))).sum.toDouble / pb.size))
    }
    val exceed = drs.count(d => math.abs(d) >= math.abs(dObs))
    assert(r.getLong(0) == as.size.toLong && r.getLong(1) == bs.size.toLong)
    assert(r.getDouble(2) == g6(dObs))
    assert(r.getLong(3) == drs.size.toLong)
    assert(r.getDouble(4) == g6((1.0 + exceed) / (1 + drs.size)))
  }

  test("randomizationTest: identical groups → insignificant p; " +
    "planted separation → small p; partitioning-invariant") {
    val same = (1 to 100).map(i =>
      (i.toString, if (i % 2 == 0) "x" else "y", (i % 5).toDouble))
      .toDF("id", "variant", "v")
    val rSame = Eval.randomizationTest(same, "id", "variant", "v",
      "x", "y", b = 100).collect().head
    assert(rSame.getDouble(4) > 0.05)
    val sep = (1 to 100).map(i =>
      (i.toString, if (i % 2 == 0) "x" else "y",
        if (i % 2 == 0) 100.0 + i % 3 else (i % 3).toDouble))
      .toDF("id", "variant", "v")
    val rSep = Eval.randomizationTest(sep, "id", "variant", "v",
      "x", "y", b = 100).collect().head
    // the add-one form floors at 1/(B_eff+1)
    assert(rSep.getDouble(4) <= 2.0 / 101)
    val rSep2 = Eval.randomizationTest(sep.repartition(13), "id",
      "variant", "v", "x", "y", b = 100).collect().head
    assert(rSep.toSeq == rSep2.toSeq)
  }

  test("rougeL ≡ an independent Scala LCS DP on a pseudo-random " +
    "corpus; hand cases (identity, reorder < faithful, disjoint = 0, " +
    "degenerate nulls); codegen and interpreted eval agree") {
    import spark.implicits._
    // independent textbook DP over the same token contract
    def refLcs(a: String, b: String): Int = {
      def tk(s: String) = s.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val (x, y) = (tk(a), tk(b))
      val dp = Array.ofDim[Int](x.length + 1, y.length + 1)
      for (i <- 1 to x.length; j <- 1 to y.length)
        dp(i)(j) = if (x(i - 1) == y(j - 1)) dp(i - 1)(j - 1) + 1
          else math.max(dp(i - 1)(j), dp(i)(j - 1))
      dp(x.length)(y.length)
    }
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta")
    def doc(seed: Int, n: Int) =
      (0 until n).map(i => words(((seed * 31 + i * 17) % 997) % 6))
        .mkString(" ")
    val pairs = (1 to 40).map(i => (i.toLong, doc(i, 12 + i % 9),
      doc(i * 7 + 3, 10 + i % 5)))
    val out = Eval.rougeL(pairs.toDF("id", "r", "c"), "id", "r", "c")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    pairs.foreach { case (id, r, c) =>
      assert(out(id) == refLcs(r, c).toLong, s"pair $id")
    }
    // hand cases
    val hand = Seq(
      (1L, "the cat sat on the mat", "the cat sat on the mat"),
      (2L, "the cat sat on the mat", "mat the on sat cat the"),
      (3L, "aa bb cc", "xx yy zz"),
      (4L, "some text", ""),
      (5L, null.asInstanceOf[String], "x"))
      .toDF("id", "r", "c")
    val h = Eval.rougeL(hand, "id", "r", "c")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(h(1L).getLong(3) == 6L && h(1L).getDouble(6) == 1.0)
    assert(h(2L).getLong(3) < 6L,
      "a reordered bag scores below the faithful sequence")
    assert(h(3L).getLong(3) == 0L && h(3L).getDouble(6) == 0.0)
    assert(h(4L).getLong(2) == 0L && h(4L).isNullAt(6))
    assert(h(5L).getLong(3) == 0L && h(5L).isNullAt(6))
  }

  test("clusteringAgreement: hand contingency (P = R = 0.5, " +
    "ARI = 1/6); identity = all-1.0; all-singletons vs itself = " +
    "ARI 1.0 by the scikit convention; null rows drop") {
    import spark.implicits._
    val df = Seq((1, "a", "x"), (2, "a", "x"), (3, "a", "y"),
      (4, "b", "y"), (5, "b", "y")).toDF("id", "p", "g")
    val r = Eval.clusteringAgreement(df, "p", "g").collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getString(3) == "2" && r.getString(4) == "4" &&
      r.getString(5) == "4")
    assert(r.getDouble(6) == 0.5 && r.getDouble(7) == 0.5 &&
      r.getDouble(8) == 0.5)
    assert(r.getDouble(9) == math.rint(0.4 / 2.4 * 1e6) / 1e6)
    val same = Eval.clusteringAgreement(
      df.withColumn("g2", col("p")), "p", "g2").collect().head
    assert(same.getDouble(6) == 1.0 && same.getDouble(9) == 1.0)
    val singles = Eval.clusteringAgreement(
      df.withColumn("p1", col("id")).withColumn("g1", col("id") + 10),
      "p1", "g1").collect().head
    assert(singles.getString(3) == "0" && singles.getDouble(9) == 1.0,
      "trivially-identical singleton partitions score 1.0, not 0/0")
    val withNull = df.union(Seq((6, null.asInstanceOf[String], "z"))
      .toDF("id", "p", "g"))
    assert(Eval.clusteringAgreement(withNull, "p", "g")
      .collect().head.getLong(0) == 5L)
  }

  test("bleu2: textbook hand case, identity = 1.0, clipping caps " +
    "repeated-word farming, degenerate pairs null out") {
    import spark.implicits._
    val pairs = Seq(
      (1L, "the cat sat on the mat", "the cat on the mat"),
      (2L, "same text here", "same text here"),
      (3L, "one two three", "the the the the"), // clip: 0 matches
      (4L, "only", "only"),                     // no bigrams → BP·p1
      (5L, "some reference", ""),               // empty candidate
      (6L, "a b", "a b c d")                    // longer cand → bp = 1
    ).toDF("id", "ref", "cand")
    val out = Eval.bleu2(pairs, "id", "ref", "cand")
      .collect().map(r => r.getLong(0) -> r).toMap
    def r9(x: Double) = math.rint(x * 1e9) / 1e9
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // pair 1: p1 = 5/5, p2 = 3/4, bp = e^(1-6/5)
    val bp1 = r9(math.exp(1.0 - 6.0 / 5.0))
    val r1 = out(1L)
    assert(r1.getDouble(3) == 1.0 && r1.getDouble(4) == 0.75)
    assert(r1.getDouble(5) == r6(bp1))
    assert(r1.getDouble(6) == r6(bp1 * math.sqrt(1.0 * 0.75)))
    assert(out(2L).getDouble(6) == 1.0, "identity scores 1")
    // pair 3: 'the' appears 0x in ref → clipped m1 = 0 → bleu 0
    assert(out(3L).getDouble(3) == 0.0)
    assert(out(3L).getDouble(6) == 0.0)
    // pair 4: p2 null, bleu falls back to bp * p1 = 1
    assert(out(4L).isNullAt(4) && out(4L).getDouble(6) == 1.0)
    // pair 5: empty candidate → null p1/bp/bleu
    assert(out(5L).isNullAt(3) && out(5L).isNullAt(5) && out(5L).isNullAt(6))
    // pair 6: cand longer than ref → brevity penalty exactly 1;
    // p1 = 2/4, p2 = 1/3
    assert(out(6L).getDouble(5) == 1.0)
    assert(out(6L).getDouble(6) ==
      r6(math.sqrt(r9(2.0 / 4.0) * r9(1.0 / 3.0))))
  }

  test("mcnemar: hand 2x2 with continuity correction, no-disagreement " +
    "null, null rows drop") {
    import org.apache.spark.sql.functions._
    // 10 both-right, b = 6 A-only, c = 2 B-only, 2 neither
    val rows = Seq.fill(10)((1, 1)) ++ Seq.fill(6)((1, 0)) ++
      Seq.fill(2)((0, 1)) ++ Seq.fill(2)((0, 0))
    val out = Eval.mcnemar(rows.toDF("ok_a", "ok_b"), "ok_a", "ok_b")
      .collect().head
    assert(out.getLong(0) == 20L && out.getLong(1) == 10L &&
      out.getLong(2) == 6L && out.getLong(3) == 2L && out.getLong(4) == 2L)
    // (|6-2|-1)^2 / 8 = 9/8 = 1.125
    assert(out.getDouble(5) == 1.125, out.getDouble(5))
    // perfect agreement → null chi2, not 0
    val agree = Eval.mcnemar(Seq((1, 1), (0, 0)).toDF("ok_a", "ok_b"),
      "ok_a", "ok_b").collect().head
    assert(agree.isNullAt(5))
    // null rows drop from every cell
    val withNull = Seq((Some(1), Some(1)), (None: Option[Int], Some(1)),
      (Some(1), None: Option[Int])).toDF("ok_a", "ok_b")
    val n = Eval.mcnemar(withNull, "ok_a", "ok_b").collect().head
    assert(n.getLong(0) == 1L)
  }

  test("expectedCalibrationError: hand-computed from its own " +
    "calibration table; perfectly-calibrated grid ≈ 0; ece <= mce") {
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1, 0.95), (1, 0.85), (0, 0.90),   // bin 10 and 9
      (0, 0.05), (0, 0.15), (1, 0.10))   // bin 1 and 2
      .toDF("y", "s")
    val tbl = Eval.calibration(rows, "y", "s", numBins = 10)
      .collect().map(r => (r.getLong(1),
        math.abs(r.getDouble(2) - r.getDouble(3))))
    val wantEce = math.rint(tbl.map { case (n, g) =>
      math.rint(n * g * 1e9) / 1e9 }.sum / tbl.map(_._1).sum * 1e6) / 1e6
    val wantMce = math.rint(tbl.map(g => math.rint(g._2 * 1e9) / 1e9)
      .max * 1e6) / 1e6
    val out = Eval.expectedCalibrationError(rows, "y", "s", 10)
      .collect().head
    assert(out.getLong(0) == 6L && out.getLong(1) == tbl.length)
    assert(out.getDouble(2) == wantEce, s"${out.getDouble(2)} vs $wantEce")
    assert(out.getDouble(3) == wantMce)
    assert(out.getDouble(2) <= out.getDouble(3) + 1e-12, "ece <= mce")
    // single-bin case: one bin, gap = |0.45 - 0.5| = 0.05, so
    // ece = mce = 0.05 exactly
    val perfect = Seq((1, 0.45), (0, 0.45)).toDF("y", "s")
    val p = Eval.expectedCalibrationError(perfect, "y", "s", 10)
      .collect().head
    assert(p.getDouble(2) == 0.05 && p.getDouble(3) == 0.05)
  }

  test("cochranQ: textbook hand case, k=2 consistency with McNemar's " +
    "uncorrected form, degenerate null, incomplete design fails fast") {
    import org.apache.spark.sql.functions._
    // classic 3-rater example: items x raters success matrix
    val m = Seq(
      (1L, 1, 1, 1), (2L, 1, 1, 0), (3L, 1, 0, 0), (4L, 0, 1, 0),
      (5L, 1, 1, 1), (6L, 1, 0, 1), (7L, 1, 1, 0), (8L, 0, 0, 0))
    def long(rows: Seq[(Long, Int, Int, Int)]) = rows.flatMap {
      case (i, a, b, c) => Seq((i, "a", a), (i, "b", b), (i, "c", c))
    }.toDF("item", "rater", "ok")
    val out = Eval.cochranQ(long(m), "item", "rater", "ok").collect().head
    // hand: C = (6,5,3), R_i = (3,2,1,1,3,2,2,0); k=3
    // num = 2*(3*(36+25+9) - 14^2) = 2*(210-196) = 28
    // den = 3*14 - (9+4+1+1+9+4+4+0) = 42 - 32 = 10 -> Q = 2.8
    assert(out.getLong(0) == 8L && out.getLong(1) == 3L)
    assert(out.getDouble(2) == 2.8, out.getDouble(2))
    // k = 2: Q equals McNemar's UNCORRECTED (b-c)^2/(b+c)
    val two = Seq((1L, 1, 0), (2L, 1, 0), (3L, 0, 1), (4L, 1, 1),
      (5L, 0, 0)).flatMap { case (i, a, b) =>
        Seq((i, "a", a), (i, "b", b)) }.toDF("item", "rater", "ok")
    val q2 = Eval.cochranQ(two, "item", "rater", "ok")
      .collect().head.getDouble(2)
    assert(q2 == math.rint((2.0 - 1.0) * (2.0 - 1.0) / 3.0 * 1e6) / 1e6, q2)
    // all-success -> zero denominator -> null
    val allOk = Seq((1L, "a", 1), (1L, "b", 1), (2L, "a", 1), (2L, "b", 1))
      .toDF("item", "rater", "ok")
    assert(Eval.cochranQ(allOk, "item", "rater", "ok")
      .collect().head.isNullAt(2))
    // incomplete design fails fast
    val e = intercept[IllegalArgumentException] {
      Eval.cochranQ(Seq((1L, "a", 1), (1L, "b", 1), (2L, "a", 1))
        .toDF("item", "rater", "ok"), "item", "rater", "ok")
    }
    assert(e.getMessage.contains("complete design"))
  }
}
