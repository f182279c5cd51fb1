package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EvalSpec extends SparkSpec {
  import spark.implicits._

  // --- rocAuc --------------------------------------------------------------

  test("rocAuc: perfect separation → 1.0, reversed → 0.0") {
    val df = Seq(
      ("g", 1, 0.9), ("g", 1, 0.8), ("g", 0, 0.2), ("g", 0, 0.1),
      ("r", 0, 0.9), ("r", 0, 0.8), ("r", 1, 0.2), ("r", 1, 0.1))
      .toDF("grp", "y", "s")
    val out = Eval.rocAuc(df, "grp", "y", "s")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("g") == 1.0)
    assert(out("r") == 0.0)
  }

  test("rocAuc: ties count half — all-equal scores → 0.5; textbook mixed case") {
    val allTied = Seq(("g", 1, 0.5), ("g", 1, 0.5), ("g", 0, 0.5), ("g", 0, 0.5))
      .toDF("grp", "y", "s")
    assert(Eval.rocAuc(allTied, "grp", "y", "s")
      .collect().head.getDouble(3) == 0.5)
    // pos scores {0.8, 0.4}, neg {0.4, 0.2}: pairs = 4, wins = 2.5
    // (0.8>0.4, 0.8>0.2, 0.4=0.4 → ½, 0.4>0.2) → AUC = 0.875... wait
    // wins: (0.8,0.4)=1 (0.8,0.2)=1 (0.4,0.4)=0.5 (0.4,0.2)=1 → 3.5/4
    val mixed = Seq(("g", 1, 0.8), ("g", 1, 0.4), ("g", 0, 0.4), ("g", 0, 0.2))
      .toDF("grp", "y", "s")
    assert(Eval.rocAuc(mixed, "grp", "y", "s")
      .collect().head.getDouble(3) == 0.875)
  }

  test("rocAuc: single-class group and null label/score → null auc / dropped") {
    val df = Seq(
      ("onlyPos", Some(1), Some(0.5)), ("onlyPos", Some(1), Some(0.7)),
      ("ok", Some(1), Some(0.9)), ("ok", Some(0), Some(0.1)),
      ("ok", None, Some(0.5)), ("ok", Some(1), None))
      .toDF("grp", "y", "s")
    val rows = Eval.rocAuc(df, "grp", "y", "s").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("onlyPos").isNullAt(3))
    assert(rows("ok").getLong(1) == 1L && rows("ok").getLong(2) == 1L)
    assert(rows("ok").getDouble(3) == 1.0)
  }

  test("rocAuc matches the O(n²) pair count on a pseudo-random set") {
    val data = (1 to 200).map { i =>
      val y = (i * 2654435761L % 97) % 2
      val s = ((i * 40503L) % 101) / 101.0 // coarse grid → many ties
      ("g", y.toInt, s)
    }
    val df = data.toDF("grp", "y", "s")
    val pos = data.filter(_._2 == 1).map(_._3)
    val neg = data.filter(_._2 == 0).map(_._3)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val expected = math.rint(wins / (pos.size * neg.size) * 1e6) / 1e6
    assert(Eval.rocAuc(df, "grp", "y", "s").collect().head.getDouble(3)
      == expected)
  }

  // --- averagePrecision ----------------------------------------------------

  test("averagePrecision: perfect ranking → 1, hand step-integral case") {
    val perfect = Seq(("g", 1, 0.9), ("g", 1, 0.8), ("g", 0, 0.2), ("g", 0, 0.1))
      .toDF("grp", "y", "s")
    assert(Eval.averagePrecision(perfect, "grp", "y", "s")
      .collect().head.getDouble(3) == 1.0)
    // ranked [+ at .9, − at .8, + at .7]: AP = ½·1 + ½·(2/3) = 0.833333
    val mixed = Seq(("g", 1, 0.9), ("g", 0, 0.8), ("g", 1, 0.7))
      .toDF("grp", "y", "s")
    assert(Eval.averagePrecision(mixed, "grp", "y", "s")
      .collect().head.getDouble(3) == 0.833333)
  }

  test("averagePrecision: ties form one threshold; no positives → null") {
    // + and − tied at 0.5 plus a + at 0.9: thresholds {0.9}, {0.5}
    // AP = ½·1 + ½·(2/3) = 0.833333 — NOT an intra-tie ordering artifact
    val tied = Seq(("g", 1, 0.9), ("g", 1, 0.5), ("g", 0, 0.5))
      .toDF("grp", "y", "s")
    assert(Eval.averagePrecision(tied, "grp", "y", "s")
      .collect().head.getDouble(3) == 0.833333)
    val neg = Seq(("g", 0, 0.9), ("g", 0, 0.5)).toDF("grp", "y", "s")
    assert(Eval.averagePrecision(neg, "grp", "y", "s")
      .collect().head.isNullAt(3))
  }

  // --- jsDivergence --------------------------------------------------------

  test("jsDivergence: identical → 0, disjoint → ln 2, hand half-overlap") {
    val a = Seq("x", "x", "y").toDF("i")
    assert(Eval.jsDivergence(a, a, "i").collect().head.getDouble(3) == 0.0)
    val b = Seq("z", "w").toDF("i")
    assert(Eval.jsDivergence(a, b, "i").collect().head.getDouble(3) ==
      math.rint(math.log(2.0) * 1e6) / 1e6)
    // p = {x:1}, q = {x:½, y:½}: JSD = ½[1·ln(4/3)] + ½[½·ln(⅔·2) + ½·ln 2]
    val p = Seq("x", "x").toDF("i")
    val q = Seq("x", "y").toDF("i")
    val g9 = (v: Double) => math.rint(v * 1e9) / 1e9
    val expected = math.rint((
      g9(1.0 * math.log(1.0 / 0.75) * 0.5 + 0.5 * math.log(0.5 / 0.75) * 0.5) +
      g9(0.5 * math.log(0.5 / 0.25) * 0.5)) * 1e6) / 1e6
    assert(Eval.jsDivergence(p, q, "i").collect().head.getDouble(3) == expected)
  }

  // --- anovaF --------------------------------------------------------------

  test("anovaF: textbook three-group case") {
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 3.0), ("b", 4.0),
      ("c", 3.0), ("c", 4.0), ("c", 5.0)).toDF("g", "v")
    val r = Eval.anovaF(df, "g", "v").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 9L)
    // SSB = 6, SSW = 6 → F = (6/2)/(6/6) = 3; η² = 6/12 = 0.5
    assert(r.getDouble(2) == 3.0)
    assert(r.getDouble(3) == 0.5)
  }

  test("anovaF: identical groups → F = 0; zero within-variance → null F") {
    val flat = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
      .toDF("g", "v")
    assert(Eval.anovaF(flat, "g", "v").collect().head.getDouble(2) == 0.0)
    val const = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0))
      .toDF("g", "v")
    val r = Eval.anovaF(const, "g", "v").collect().head
    assert(r.isNullAt(2))        // F undefined at SSW = 0
    assert(r.getDouble(3) == 1.0) // but η² = 1: all variance between
  }

  // --- ksTest --------------------------------------------------------------

  test("ksTest: identical samples → 0, disjoint samples → 1") {
    val same = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
      .toDF("smp", "v")
    assert(Eval.ksTest(same, "smp", "v", "a", "b")
      .collect().head.getDouble(2) == 0.0)
    val disjoint = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0), ("b", 6.0))
      .toDF("smp", "v")
    assert(Eval.ksTest(disjoint, "smp", "v", "a", "b")
      .collect().head.getDouble(2) == 1.0)
  }

  test("ksTest: hand case with unequal sizes; other labels and nulls drop") {
    // a = {1, 2, 3}, b = {2, 4}: D at v=3 → |3/3 - 1/2| = 0.5
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("b", Some(2.0)), ("b", Some(4.0)),
      ("c", Some(9.9)), ("a", None))
      .toDF("smp", "v")
    val r = Eval.ksTest(df, "smp", "v", "a", "b").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.5)
  }

  test("ksTest matches a brute-force sup over all sample values") {
    val a = (1 to 150).map(i => (i * 7919 % 50).toDouble)
    val b = (1 to 120).map(i => (i * 104729 % 60).toDouble)
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("smp", "v")
    val sup = (a ++ b).distinct.map { x =>
      math.abs(a.count(_ <= x).toDouble / a.size -
        b.count(_ <= x).toDouble / b.size)
    }.max
    val expected = math.rint(sup * 1e6) / 1e6
    assert(Eval.ksTest(df, "smp", "v", "a", "b")
      .collect().head.getDouble(2) == expected)
  }

  // --- psi -----------------------------------------------------------------

  test("psi: identical populations → all terms 0; bins cover numBins") {
    val ref = (1 to 100).map(_.toDouble).toDF("v")
    val out = Eval.psi(ref, ref, "v", numBins = 4).orderBy("bin").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    assert(out.forall(_.getDouble(5) == 0.0))
    assert(out.forall(r => r.getLong(1) == r.getLong(2)))
  }

  test("psi: a shifted current population yields positive total drift") {
    val ref = (1 to 1000).map(_.toDouble).toDF("v")
    val cur = (501 to 1500).map(_.toDouble).toDF("v")
    val terms = Eval.psi(ref, cur, "v", numBins = 10).collect()
    val total = terms.map(_.getDouble(5)).sum
    assert(total > 0.25, s"expected drift, got $total") // conventional 'shifted'
    // vanished bins get the epsilon floor, not infinities
    assert(terms.forall(r => !r.getDouble(5).isInfinite))
  }

  test("psi: empty-in-current bin uses the 1e-6 floor exactly") {
    val ref = (1 to 100).map(_.toDouble).toDF("v")
    val cur = (51 to 100).map(_.toDouble).toDF("v") // bins 1..2 empty in cur
    val bin1 = Eval.psi(ref, cur, "v", numBins = 4)
      .filter(col("bin") === 1).collect().head
    val p = 0.25
    val expected = math.rint((1e-6 - p) * math.log(1e-6 / p) * 1e9) / 1e9
    assert(bin1.getLong(2) == 0L)
    assert(bin1.getDouble(5) == expected)
  }

  // --- gini ----------------------------------------------------------------

  test("gini: uniform → 0, single holder → (n−1)/n, textbook case") {
    val even = Seq(("g", 5.0), ("g", 5.0), ("g", 5.0), ("g", 5.0))
      .toDF("grp", "v")
    assert(Eval.gini(even, "grp", "v").collect().head.getDouble(2) == 0.0)
    val one = Seq(("g", 0.0), ("g", 0.0), ("g", 0.0), ("g", 10.0))
      .toDF("grp", "v")
    assert(Eval.gini(one, "grp", "v").collect().head.getDouble(2) == 0.75)
    // {1,2,3,4}: G = Σ(2i-n-1)x_i / (nΣx) = (-3·1 -1·2 +1·3 +3·4)/(4·10) = 0.25
    val tb = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0))
      .toDF("grp", "v")
    assert(Eval.gini(tb, "grp", "v").collect().head.getDouble(2) == 0.25)
  }

  test("gini: ties across the level boundary match the sorted-row formula") {
    val vals = (1 to 120).map(i => (i * 31 % 7).toDouble) // heavy ties
    val df = vals.map(("g", _)).toDF("grp", "v")
    val sorted = vals.sorted
    val n = sorted.size
    val num = sorted.zipWithIndex.map { case (x, i0) =>
      (2.0 * (i0 + 1) - n - 1) * x }.sum
    val expected = math.rint(num / (n * sorted.sum) * 1e6) / 1e6
    assert(Eval.gini(df, "grp", "v").collect().head.getDouble(2) == expected)
  }

  test("gini: zero-sum and empty groups → null; nulls drop") {
    val df = Seq(("z", Some(0.0)), ("z", Some(0.0)), ("n", None))
      .toDF("grp", "v")
    val rows = Eval.gini(df, "grp", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("z").isNullAt(2))
    assert(!rows.contains("n")) // only-null group has no surviving rows
  }

  // --- calibration ---------------------------------------------------------

  test("calibration: bin edges, clamping, and exact per-bin stats") {
    val df = Seq(
      (1, 0.05), (0, 0.05),          // bin 1
      (1, 0.25),                     // bin 3 (floor(0.25*10)=2 → bin 3)
      (1, 1.0), (0, 1.7),            // 1.0 and clamp-high → bin 10
      (0, -0.3))                     // clamp-low → bin 1
      .toDF("y", "s")
    val out = Eval.calibration(df, "y", "s", numBins = 10)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out.keySet == Set(1, 3, 10))
    assert(out(1).getLong(1) == 3L)
    assert(out(3).getDouble(3) == 1.0) // frac_pos
    assert(out(10).getLong(1) == 2L)
    // bin 3 Brier term: (0.25 − 1)² = 0.5625
    assert(out(3).getDouble(4) == 0.5625)
  }

  test("calibration: a perfectly calibrated grid reads back its own diagonal") {
    // at score p, exactly p of rows positive (p = 0.2/0.8 over 10 rows each)
    val rows = (1 to 10).map(i => (if (i <= 2) 1 else 0, 0.25)) ++
      (1 to 10).map(i => (if (i <= 8) 1 else 0, 0.85))
    val out = Eval.calibration(rows.toDF("y", "s"), "y", "s", 10)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out(3).getDouble(2) == 0.25 && out(3).getDouble(3) == 0.2)
    assert(out(9).getDouble(2) == 0.85 && out(9).getDouble(3) == 0.8)
  }

  // --- liftTable -----------------------------------------------------------

  test("liftTable: a perfect ranker captures everything in the top band") {
    // 100 rows, scores descending 100..1, positives = top 10 scores
    val df = (1 to 100).map(i => (if (i > 90) 1 else 0, i.toDouble))
      .toDF("y", "s")
    val out = Eval.liftTable(df, "y", "s", numBins = 10)
      .orderBy("band").collect()
    val b1 = out.head
    assert(b1.getInt(0) == 1 && b1.getLong(2) == 10L)
    assert(b1.getDouble(3) == 1.0)   // pos_rate
    assert(b1.getDouble(4) == 1.0)   // capture: all positives in band 1
    assert(b1.getDouble(5) == 10.0)  // lift = 1.0 / 0.1
    assert(out.tail.forall(_.getLong(2) == 0L))
    assert(out.tail.forall(_.getDouble(4) == 1.0)) // capture stays 1
  }

  test("liftTable: a random score has lift ≈ 1 everywhere and monotone capture") {
    val df = (1 to 500).map { i =>
      ((i * 2654435761L % 5 == 0).compareTo(false), (i * 7919 % 499).toDouble)
    }.toDF("y", "s")
    val out = Eval.liftTable(df, "y", "s", numBins = 5).orderBy("band").collect()
    val captures = out.map(_.getDouble(4))
    assert(captures.zip(captures.tail).forall { case (a, b) => a <= b })
    assert(captures.last == 1.0)
    assert(out.map(_.getLong(1)).sum == 500L)
  }

  // --- welchT --------------------------------------------------------------

  test("welchT: hand-computed unequal-variance case") {
    // a = {1,2,3,4,5}: m=3, s²=2.5; b = {2,4,6,8,10,12}: m=7, s²=14
    val df = ((1 to 5).map(i => ("a", i.toDouble)) ++
      (1 to 6).map(i => ("b", 2.0 * i))).toDF("smp", "v")
    val r = Eval.welchT(df, "smp", "v", "a", "b").collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 6L)
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == 7.0)
    val sea = 2.5 / 5; val seb = 14.0 / 6
    val t = (3.0 - 7.0) / math.sqrt(sea + seb)
    val dfW = (sea + seb) * (sea + seb) /
      (sea * sea / 4 + seb * seb / 5)
    assert(r.getDouble(4) == math.rint(t * 1e6) / 1e6)
    assert(r.getDouble(5) == math.rint(dfW * 1e6) / 1e6)
  }

  test("welchT: identical samples → t = 0; degenerate sizes/variances → null") {
    val same = ((1 to 4) ++ (1 to 4)).zipWithIndex
      .map { case (v, i) => (if (i < 4) "a" else "b", v.toDouble) }
      .toDF("smp", "v")
    assert(Eval.welchT(same, "smp", "v", "a", "b")
      .collect().head.getDouble(4) == 0.0)
    val tiny = Seq(("a", 1.0), ("b", 2.0), ("b", 3.0)).toDF("smp", "v")
    assert(Eval.welchT(tiny, "smp", "v", "a", "b").collect().head.isNullAt(4))
    val const = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0))
      .toDF("smp", "v")
    assert(Eval.welchT(const, "smp", "v", "a", "b").collect().head.isNullAt(4))
  }

  // --- rankingMetrics ------------------------------------------------------

  test("rankingMetrics: perfect ranking → ndcg 1, rr 1; hand DCG case") {
    val df = Seq(
      ("q", 1L, 2.0, 0.9), ("q", 2L, 1.0, 0.8), ("q", 3L, 0.0, 0.7))
      .toDF("qid", "doc", "rel", "s")
    val r = Eval.rankingMetrics(df, "qid", "doc", "rel", "s", k = 3)
      .collect().head
    assert(r.getDouble(6) == 1.0) // ranking == ideal
    assert(r.getDouble(5) == 1.0) // first relevant at rank 1
    // swap top scores: ranked rel = [1, 2, 0]
    val sw = Seq(
      ("q", 1L, 2.0, 0.8), ("q", 2L, 1.0, 0.9), ("q", 3L, 0.0, 0.7))
      .toDF("qid", "doc", "rel", "s")
    val g9 = (x: Double) => math.rint(x * 1e9) / 1e9
    val dcg = BigDecimal(g9(1.0 / (math.log(2.0) / math.log(2.0)))) +
      BigDecimal(g9(3.0 / (math.log(3.0) / math.log(2.0))))
    val idcg = BigDecimal(g9(3.0 / 1.0)) +
      BigDecimal(g9(1.0 / (math.log(3.0) / math.log(2.0))))
    val expected = math.rint(dcg.toDouble / idcg.toDouble * 1e6) / 1e6
    assert(Eval.rankingMetrics(sw, "qid", "doc", "rel", "s", k = 3)
      .collect().head.getDouble(6) == expected)
  }

  test("rankingMetrics: k truncation, precision/recall, rr beyond k → 0") {
    // 4 docs, relevant ones ranked 3rd and 4th; k = 2
    val df = Seq(
      ("q", 1L, 0.0, 0.9), ("q", 2L, 0.0, 0.8),
      ("q", 3L, 1.0, 0.7), ("q", 4L, 1.0, 0.6))
      .toDF("qid", "doc", "rel", "s")
    val r = Eval.rankingMetrics(df, "qid", "doc", "rel", "s", k = 2)
      .collect().head
    assert(r.getLong(1) == 4L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 0.0) // p@2
    assert(r.getDouble(4) == 0.0) // r@2
    assert(r.getDouble(5) == 0.0) // no relevant inside top 2
    assert(r.getDouble(6) == 0.0) // dcg@2 = 0, idcg@2 > 0
  }

  test("rankingMetrics: no-relevant query → null ndcg/recall, zero rr; ties break by id") {
    val df = Seq(
      ("none", 1L, 0.0, 0.9), ("none", 2L, 0.0, 0.8),
      // tie on score: doc 5 (relevant) has smaller id → rank 1
      ("tie", 5L, 1.0, 0.5), ("tie", 6L, 0.0, 0.5))
      .toDF("qid", "doc", "rel", "s")
    val out = Eval.rankingMetrics(df, "qid", "doc", "rel", "s", k = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("none").isNullAt(6) && out("none").isNullAt(4))
    assert(out("none").getDouble(5) == 0.0)
    assert(out("tie").getDouble(5) == 1.0) // rr: relevant won the tie by id
    assert(out("tie").getDouble(6) == 1.0)
  }

  // --- propZTest -----------------------------------------------------------

  test("propZTest: hand-computed case; equal rates → 0; degenerate pooled → null") {
    // a: 40/100, b: 25/100 → pooled .325, z = .15/sqrt(.325*.675*.02)
    val df = ((1 to 100).map(i => ("a", if (i <= 40) 1 else 0)) ++
      (1 to 100).map(i => ("b", if (i <= 25) 1 else 0))).toDF("smp", "y")
    val r = Eval.propZTest(df, "smp", "y", "a", "b").collect().head
    assert(r.getLong(1) == 40L && r.getLong(3) == 25L)
    val z = (0.4 - 0.25) / math.sqrt(0.325 * (1 - 0.325) * (1.0 / 100 + 1.0 / 100))
    assert(r.getDouble(6) == math.rint(z * 1e6) / 1e6)
    val same = Seq(("a", 1), ("a", 0), ("b", 1), ("b", 0)).toDF("smp", "y")
    assert(Eval.propZTest(same, "smp", "y", "a", "b")
      .collect().head.getDouble(6) == 0.0)
    val allPos = Seq(("a", 1), ("b", 1)).toDF("smp", "y")
    assert(Eval.propZTest(allPos, "smp", "y", "a", "b")
      .collect().head.isNullAt(6))
  }

  // --- wilsonCI ------------------------------------------------------------

  test("wilsonCI: textbook interval; extreme p̂ never collapses; contains p_hat") {
    // n=10, x=8, z=1.96: standard Wilson check
    val df = (1 to 10).map(i => ("g", if (i <= 8) 1 else 0)).toDF("grp", "y")
    val r = Eval.wilsonCI(df, "grp", "y").collect().head
    val (n, p, z) = (10.0, 0.8, 1.96)
    val denom = 1.0 + z * z / n
    val center = (p + z * z / (2 * n)) / denom
    val half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    assert(r.getDouble(4) == math.rint((center - half) * 1e6) / 1e6)
    assert(r.getDouble(5) == math.rint((center + half) * 1e6) / 1e6)
    // p̂ = 1: Wald would give [1, 1]; Wilson lower bound must be < 1
    val ones = Seq(("g", 1), ("g", 1), ("g", 1)).toDF("grp", "y")
    val r1 = Eval.wilsonCI(ones, "grp", "y").collect().head
    assert(r1.getDouble(3) == 1.0 && r1.getDouble(4) < 1.0)
    assert(r1.getDouble(4) > 0.0 && r1.getDouble(5) >= 1.0 - 1e-9)
  }

  // --- rbo -----------------------------------------------------------------

  test("rbo: identical rankings → Σ(1−p)p^(d−1), disjoint → 0, brute-force equality") {
    val a = (1 to 10).map(i => (i.toLong, 100.0 - i)).toDF("id", "s")
    val same = Eval.rbo(a, a, "id", "s", k = 10, p = 0.9).collect().head
    // A_d = 1 at every depth → RBO = (1−p)·Σ p^(d−1)
    val g9 = (x: Double) => math.rint(x * 1e9) / 1e9
    val ws = Eval.rboWeights(10, 0.9)
    val expSame = math.rint(0.1 * (1 to 10).map(m => BigDecimal(g9(ws(m - 1))))
      .sum.toDouble * 1e6) / 1e6
    assert(same.getDouble(1) == expSame)
    assert(same.getLong(0) == 10L)
    val b = (11 to 20).map(i => (i.toLong, 100.0 - i)).toDF("id", "s")
    val dis = Eval.rbo(a, b, "id", "s", k = 10, p = 0.9).collect().head
    assert(dis.getLong(0) == 0L && dis.getDouble(1) == 0.0)

    // brute force on partially overlapping scrambled rankings
    val x = Seq(1L -> 9.0, 2L -> 8.0, 3L -> 7.0, 4L -> 6.0, 5L -> 5.0)
    val y = Seq(3L -> 9.0, 1L -> 8.0, 6L -> 7.0, 2L -> 6.0, 7L -> 5.0)
    val out = Eval.rbo(x.toDF("id", "s"), y.toDF("id", "s"),
      "id", "s", k = 5, p = 0.8).collect().head
    val sx = x.sortBy { case (i, sc) => (-sc, i) }.map(_._1)
    val sy = y.sortBy { case (i, sc) => (-sc, i) }.map(_._1)
    val brute = 0.2 * (1 to 5).map { d =>
      math.pow(0.8, d - 1) *
        sx.take(d).toSet.intersect(sy.take(d).toSet).size / d.toDouble
    }.sum
    assert(math.abs(out.getDouble(1) - brute) < 1e-6)
  }

  test("rbo: prefixes prune at k and ties break by id") {
    // beyond-k items must not contribute even if shared
    val a = (1 to 30).map(i => (i.toLong, 100.0 - i)).toDF("id", "s")
    val b = ((1 to 5) ++ (21 to 30)).map(i => (i.toLong, 50.0 - i))
      .toDF("id", "s")
    val out = Eval.rbo(a, b, "id", "s", k = 5, p = 0.9).collect().head
    assert(out.getLong(0) == 5L) // items 21..30 rank beyond b's own top-5? no:
    // b's top-5 by score are ids 1..5 — shared with a's top-5 exactly
    // tie-break: equal scores order by id asc on both sides → same ranking
    val t1 = Seq(1L -> 5.0, 2L -> 5.0, 3L -> 5.0).toDF("id", "s")
    val r = Eval.rbo(t1, t1, "id", "s", k = 3, p = 0.5).collect().head
    assert(r.getLong(0) == 3L)
    val ws = Eval.rboWeights(3, 0.5)
    val g9 = (x: Double) => math.rint(x * 1e9) / 1e9
    val expected = math.rint(0.5 * (1 to 3)
      .map(m => BigDecimal(g9(ws(m - 1)))).sum.toDouble * 1e6) / 1e6
    assert(r.getDouble(1) == expected)
  }

  // --- benford -------------------------------------------------------------

  test("benford: digit extraction is string-exact (powers of ten, decimals, negatives)") {
    val df = Seq(1000.0, 0.00042, -73.2, 10.0, 0.0, 999.99994, 5.5)
      .toDF("v")
    // 999.99994 rounds to 999.9999 at DECIMAL(18,4) → digit 9; 0 drops
    val counts = Eval.benford(df, "v").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts == Map(1 -> 2L, 4 -> 1L, 7 -> 1L, 9 -> 1L, 5 -> 1L))
  }

  test("benford: expected fractions are the 9-grid log10 law and chi2 is exact") {
    val df = (1 to 90).map(i => (i % 9 + 1) * 10.0).toDF("v") // uniform digits
    val out = Eval.benford(df, "v").orderBy("digit").collect()
    assert(out.length == 9)
    val d1 = out.head
    assert(d1.getDouble(3) == math.rint(math.log10(2.0) * 1e9) / 1e9)
    val obs = 10.0 / 90.0
    val e = math.rint(math.log10(2.0) * 1e9) / 1e9
    val chi = math.rint(90.0 * (obs - e) * (obs - e) / e * 1e4) / 1e4
    assert(d1.getDouble(4) == chi)
  }

  // --- mannWhitneyU --------------------------------------------------------

  test("mannWhitneyU: disjoint samples — hand-computed U and z") {
    // A = {1,2,3} all below B = {4,5,6}: U_a = 0, no ties,
    // z = (0 - 4.5)/sqrt(9/12 * 7) = -1.963961 (rounded 6)
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("lbl", "v")
    val r = Eval.mannWhitneyU(df, "lbl", "v", "a", "b").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 0.0)
    assert(r.getDouble(3) ==
      math.rint(-4.5 / math.sqrt(5.25) * 1e6) / 1e6)
  }

  test("mannWhitneyU: swapping samples mirrors U and negates z") {
    val df = Seq(("a", 1.0), ("a", 5.0), ("a", 3.0), ("a", 3.0),
      ("b", 2.0), ("b", 3.0), ("b", 8.0)).toDF("lbl", "v")
    val ab = Eval.mannWhitneyU(df, "lbl", "v", "a", "b").collect().head
    val ba = Eval.mannWhitneyU(df, "lbl", "v", "b", "a").collect().head
    assert(ab.getDouble(2) + ba.getDouble(2) == 4.0 * 3.0)
    assert(ab.getDouble(3) == -ba.getDouble(3))
  }

  test("mannWhitneyU: all-tied values → U = n_a·n_b/2, null z; empty sample → null") {
    val tied = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0)).toDF("lbl", "v")
    val rt = Eval.mannWhitneyU(tied, "lbl", "v", "a", "b").collect().head
    assert(rt.getDouble(2) == 1.0) // 2·1/2
    assert(rt.isNullAt(3))
    val onlyA = Seq(("a", 1.0), ("a", 2.0)).toDF("lbl", "v")
    val ra = Eval.mannWhitneyU(onlyA, "lbl", "v", "a", "b").collect().head
    assert(ra.isNullAt(3))
  }

  // --- isotonicCalibrate ---------------------------------------------------

  /** Independent textbook PAV over (score, n, pos) levels. */
  private def pavReference(levels: Seq[(Double, Long, Long)]): Seq[Double] = {
    case class B(var n: Long, var p: Long, var len: Int)
    val blocks = scala.collection.mutable.ArrayBuffer.empty[B]
    levels.sortBy(_._1).foreach { case (_, n, p) =>
      blocks += B(n, p, 1)
      while (blocks.size >= 2 && {
        val a = blocks(blocks.size - 2); val b = blocks.last
        a.p.toDouble / a.n > b.p.toDouble / b.n
      }) {
        val b = blocks.remove(blocks.size - 1)
        val a = blocks.last
        a.n += b.n; a.p += b.p; a.len += b.len
      }
    }
    blocks.toSeq.flatMap(b =>
      Seq.fill(b.len)(math.rint(b.p.toDouble / b.n * 1e6) / 1e6))
  }

  private def expandLevels(levels: Seq[(Double, Long, Long)], g: String = "g") =
    levels.flatMap { case (s, n, p) =>
      (1L to n).map(i => (g, if (i <= p) 1 else 0, s))
    }.toDF("grp", "y", "s")

  test("isotonicCalibrate: a group over maxLevelsPerGroup fails fast " +
    "with the round-the-score remedy, not an executor OOM") {
    val many = (1 to 10).map(i => ("g", i % 2, i / 100.0)).toDF("grp", "y", "s")
    val e = intercept[org.apache.spark.SparkException] {
      Eval.isotonicCalibrate(many, "grp", "y", "s", maxLevelsPerGroup = 3)
        .collect()
    }
    assert(e.getMessage.contains("round the score") ||
      Option(e.getCause).exists(_.getMessage.contains("round the score")))
    // at-the-cap passes
    assert(Eval.isotonicCalibrate(many, "grp", "y", "s",
      maxLevelsPerGroup = 10).count() == 10)
    intercept[IllegalArgumentException] {
      Eval.isotonicCalibrate(many, "grp", "y", "s", maxLevelsPerGroup = 0)
    }
  }

  test("isotonicCalibrate: monotone input passes through; violations pool " +
    "to weighted means; full reversal pools everything") {
    val mono = expandLevels(Seq((1.0, 4L, 0L), (2.0, 4L, 2L), (3.0, 4L, 4L)))
    val m = Eval.isotonicCalibrate(mono, "grp", "y", "s")
      .orderBy("score").collect().map(_.getDouble(4)).toSeq
    assert(m == Seq(0.0, 0.5, 1.0))
    val mid = expandLevels(Seq((1.0, 5L, 1L), (2.0, 5L, 4L), (3.0, 5L, 2L)))
    val v = Eval.isotonicCalibrate(mid, "grp", "y", "s")
      .orderBy("score").collect().map(_.getDouble(4)).toSeq
    assert(v == Seq(0.2, 0.6, 0.6))
    val rev = expandLevels(Seq((1.0, 10L, 9L), (2.0, 10L, 5L), (3.0, 10L, 1L)))
    val r = Eval.isotonicCalibrate(rev, "grp", "y", "s")
      .orderBy("score").collect().map(_.getDouble(4)).toSeq
    assert(r == Seq(0.5, 0.5, 0.5))
  }

  test("isotonicCalibrate ≡ independent PAV; monotone; preserves mass; " +
    "groups independent") {
    val levelsA = (1 to 40).map { i =>
      val n = (i * 7) % 5 + 1L
      (i.toDouble, n, (i * 2654435761L % (n + 1)))
    }
    val levelsB = (1 to 25).map { i =>
      val n = (i * 3) % 4 + 2L
      (i.toDouble, n, (i * 40507L % (n + 1)))
    }
    val df = expandLevels(levelsA, "A").unionByName(expandLevels(levelsB, "B"))
    val out = Eval.isotonicCalibrate(df, "grp", "y", "s")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    for ((g, lv) <- Seq("A" -> levelsA, "B" -> levelsB)) {
      val mine = out.filter(_._1 == g).sortBy(_._2)
      assert(mine.map(_._5).toSeq == pavReference(lv), s"group $g")
      // monotone non-decreasing
      assert(mine.map(_._5).sliding(2).forall(w =>
        w.length < 2 || w(0) <= w(1)))
      // weighted mean preserved (up to the 1e-6 rendering)
      val mass = mine.map(t => t._5 * t._3).sum
      assert(math.abs(mass - lv.map(_._3).sum) < 1e-3, s"group $g mass")
    }
  }

  // --- wasserstein1 --------------------------------------------------------

  test("wasserstein1: identical → 0, point masses → the gap, shift → δ") {
    val same = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
      .toDF("lbl", "v")
    assert(Eval.wasserstein1(same, "lbl", "v", "a", "b")
      .collect().head.getDouble(2) == 0.0)
    val masses = Seq(("a", 0.0), ("a", 0.0), ("b", 5.0), ("b", 5.0))
      .toDF("lbl", "v")
    assert(Eval.wasserstein1(masses, "lbl", "v", "a", "b")
      .collect().head.getDouble(2) == 5.0)
    val shifted = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 1.5), ("b", 2.5), ("b", 3.5)).toDF("lbl", "v")
    assert(Eval.wasserstein1(shifted, "lbl", "v", "a", "b")
      .collect().head.getDouble(2) == 0.5)
  }

  test("wasserstein1 ≡ mean sorted-quantile gap for equal-size samples") {
    val as = (1 to 120).map(i => ((i * 40507L) % 97).toDouble)
    val bs = (1 to 120).map(i => ((i * 2654435761L % 89) % 97).toDouble)
    val df = (as.map(("a", _)) ++ bs.map(("b", _))).toDF("lbl", "v")
    val w1 = Eval.wasserstein1(df, "lbl", "v", "a", "b")
      .collect().head.getDouble(2)
    val brute = as.sorted.zip(bs.sorted)
      .map { case (x, y) => math.abs(x - y) }.sum / as.size
    assert(math.abs(w1 - brute) < 1e-6, s"$w1 vs $brute")
  }

  test("wasserstein1: single-point grid → exact 0; empty side → null") {
    val one = Seq(("a", 7.0), ("b", 7.0), ("b", 7.0)).toDF("lbl", "v")
    val r1 = Eval.wasserstein1(one, "lbl", "v", "a", "b").collect().head
    assert(r1.getDouble(2) == 0.0)
    val onlyA = Seq(("a", 1.0)).toDF("lbl", "v")
    val r2 = Eval.wasserstein1(onlyA, "lbl", "v", "a", "b").collect().head
    assert(r2.isNullAt(2))
  }

  // --- bhAdjust ------------------------------------------------------------

  test("bhAdjust: textbook adjustment with the suffix-min step") {
    // p = (0.01, 0.02, 0.03, 0.04), m = 4: candidates are
    // (0.04, 0.04, 0.04, 0.04) after p·m/j — the suffix min flattens
    // the whole prefix to the tail value
    val df = Seq(("t1", 0.01), ("t2", 0.02), ("t3", 0.03), ("t4", 0.04))
      .toDF("id", "p")
    val out = Eval.bhAdjust(df, "id", "p").collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out == Map("t1" -> ((1L, 0.04)), "t2" -> ((2L, 0.04)),
      "t3" -> ((3L, 0.04)), "t4" -> ((4L, 0.04))))
    // a genuinely small p survives: p=(0.001, 0.5, 0.9): adj =
    // (0.003, 0.75, 0.9)
    val df2 = Seq(("a", 0.001), ("b", 0.5), ("c", 0.9)).toDF("id", "p")
    val out2 = Eval.bhAdjust(df2, "id", "p").collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out2 == Map("a" -> 0.003, "b" -> 0.75, "c" -> 0.9))
  }

  test("bhAdjust: equal p-values all get the same adjusted value; the " +
    "suffix min caps a large early candidate at the tail p") {
    val df = Seq(("x", 0.4), ("y", 0.4), ("z", 0.4)).toDF("id", "p")
    val out = Eval.bhAdjust(df, "id", "p").collect()
      .map(r => r.getDouble(3)).toSet
    assert(out == Set(0.4)) // p·m/m at the tail, suffix-min propagates
    // 0.9·2/1 = 1.8 would exceed 1, but the suffix min includes the
    // tail candidate p_m·m/m = p_m ≤ 1 — adjusted p never exceeds p_m
    val big = Seq(("x", 0.9), ("y", 0.95)).toDF("id", "p")
    val o2 = Eval.bhAdjust(big, "id", "p").collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(o2("y") == 0.95 && o2("x") == 0.95)
  }

  test("bhAdjust: adjusted values are monotone in rank; nulls drop") {
    val data = (1 to 100).map(i => (s"t$i", ((i * 40507) % 97 + 1) / 100.0))
    val df = data.toDF("id", "p")
      .unionByName(Seq(("bad", Option.empty[Double])).toDF("id", "p"))
    val out = Eval.bhAdjust(df, "id", "p").collect()
    assert(out.length == 100) // null dropped; m = 100
    val adj = out.sortBy(_.getLong(2)).map(_.getDouble(3))
    assert(adj.zip(adj.tail).forall { case (a, b) => a <= b })
  }

  // --- conformalInterval ---------------------------------------------------

  test("conformalInterval: q̂ is the exact ceil-rank residual") {
    // residuals 1..10, α = 0.2: k = ceil(11·0.8) = 9 → q̂ = 9
    val cal = (1 to 10).map(i => (i.toLong, i + 0.0, 0.0)).toDF("id", "y", "yhat")
    val score = Seq((100L, 0.0, 50.0), (101L, 0.0, 60.0))
      .toDF("id", "y", "yhat")
    val out = Eval.conformalInterval(cal, score, "id", "y", "yhat", 0.2)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(out == Map(100L -> ((41.0, 59.0)), 101L -> ((51.0, 69.0))))
  }

  test("conformalInterval: tied residuals rank through cumulative counts") {
    // residuals (1,1,1,2,2,5), α = 0.3: k = ceil(7·0.7) = 5 → the 5th
    // smallest is 2
    val cal = Seq(1.0, 1.0, 1.0, 2.0, 2.0, 5.0).zipWithIndex
      .map { case (r, i) => (i.toLong, r, 0.0) }.toDF("id", "y", "yhat")
    val score = Seq((9L, 0.0, 10.0)).toDF("id", "y", "yhat")
    val r = Eval.conformalInterval(cal, score, "id", "y", "yhat", 0.3)
      .collect().head
    assert((r.getDouble(2), r.getDouble(3)) == ((8.0, 12.0)))
  }

  test("conformalInterval: α too small for the calibration set → null; guards") {
    // n = 3, α = 0.1: k = ceil(4·0.9) = 4 > 3 → undefined
    val cal = Seq((1L, 1.0, 0.0), (2L, 2.0, 0.0), (3L, 3.0, 0.0))
      .toDF("id", "y", "yhat")
    val score = Seq((9L, 0.0, 10.0)).toDF("id", "y", "yhat")
    val r = Eval.conformalInterval(cal, score, "id", "y", "yhat", 0.1)
      .collect().head
    assert(r.isNullAt(2) && r.isNullAt(3))
    intercept[IllegalArgumentException] {
      Eval.conformalInterval(cal, score, "id", "y", "yhat", 0.0)
    }
  }

  // --- cuped ---------------------------------------------------------------

  test("cuped: a perfectly predictive covariate collapses both variants " +
    "to the pooled mean") {
    // x = y exactly → θ = 1 → adjusted = ȳ_v − (x̄_v − x̄_pool) = ȳ_pool
    val df = Seq(("A", 10.0, 10.0), ("A", 14.0, 14.0),
      ("B", 20.0, 20.0), ("B", 28.0, 28.0)).toDF("v", "y", "x")
    val out = Eval.cuped(df, "v", "y", "x").collect()
      .map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out("A")._3 == 1.0 && out("B")._3 == 1.0)
    assert(out("A")._1 == 12.0 && out("B")._1 == 24.0) // raw means differ
    assert(out("A")._2 == 18.0 && out("B")._2 == 18.0) // adjusted collapse
  }

  test("cuped: zero-variance covariate → null theta and adjusted mean") {
    val df = Seq(("A", 1.0, 5.0), ("A", 3.0, 5.0), ("B", 2.0, 5.0))
      .toDF("v", "y", "x")
    val rows = Eval.cuped(df, "v", "y", "x").collect()
    rows.foreach { r =>
      assert(r.isNullAt(3) && r.isNullAt(4))
      assert(!r.isNullAt(2)) // raw mean still reported
    }
  }

  test("cuped: theta matches the pooled closed form on mixed data") {
    val data = Seq(("A", 3.0, 1.0), ("A", 5.0, 2.0), ("A", 4.0, 2.0),
      ("B", 7.0, 3.0), ("B", 6.0, 2.0), ("B", 9.0, 4.0))
    val out = Eval.cuped(data.toDF("v", "y", "x"), "v", "y", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    def r9(v: Double) = math.rint(v * 1e9) / 1e9
    val n = data.size.toDouble
    val sx = data.map(d => r9(d._3)).sum
    val sy = data.map(d => r9(d._2)).sum
    val sxx = data.map(d => r9(d._3 * d._3)).sum
    val sxy = data.map(d => r9(d._3 * d._2)).sum
    val theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(out("A").getDouble(4) == math.rint(theta * 1e6) / 1e6)
    val aYs = data.filter(_._1 == "A")
    val adjA = aYs.map(_._2).sum / 3 - theta *
      (aYs.map(_._3).sum / 3 - sx / n)
    assert(out("A").getDouble(3) == math.rint(adjA * 1e6) / 1e6)
  }

  test("mannWhitneyU matches the O(n²) pair count with heavy ties") {
    val data = (1 to 300).map { i =>
      val lbl = if (i * 2654435761L % 97 % 2 == 0) "a" else "b"
      val v = ((i * 40507L) % 23).toDouble // 23-value grid → many ties
      (lbl, v)
    }
    val df = data.toDF("lbl", "v")
    val as = data.filter(_._1 == "a").map(_._2)
    val bs = data.filter(_._1 == "b").map(_._2)
    val u = (for (x <- as; y <- bs)
      yield if (x > y) 1.0 else if (x == y) 0.5 else 0.0).sum
    val r = Eval.mannWhitneyU(df, "lbl", "v", "a", "b").collect().head
    assert(r.getLong(0) == as.size && r.getLong(1) == bs.size)
    assert(r.getDouble(2) == u)
    assert(!r.isNullAt(3) && math.abs(r.getDouble(3)) < 10)
  }
}
