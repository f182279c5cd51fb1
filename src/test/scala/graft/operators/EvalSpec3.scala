package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** fleissKappa + kruskalWallis (EvalSpec/EvalSpec2 cover the earlier
  * eval surface). */
class EvalSpec3 extends SparkSpec {
  import spark.implicits._

  private def g6(x: Double): Double = math.rint(x * 1e6) / 1e6

  test("fleissKappa: hand 3-item/2-rater case, perfect agreement, " +
    "single-category null, guards") {
    // (i1: a,a) (i2: a,b) (i3: b,b): P-bar = 2/3, P_e = 1/2, kappa = 1/3
    val df = Seq((1L, "r1", "a"), (1L, "r2", "a"), (2L, "r1", "a"),
      (2L, "r2", "b"), (3L, "r1", "b"), (3L, "r2", "b"))
      .toDF("item", "rater", "label")
    val out = Eval.fleissKappa(df, "item", "rater", "label").collect().head
    assert(out.getLong(0) == 3L && out.getLong(1) == 2L &&
      out.getLong(2) == 2L)
    assert(out.getDouble(3) == g6(2.0 / 3.0), out.getDouble(3))
    assert(out.getDouble(4) == 0.5)
    assert(out.getDouble(5) == g6(1.0 / 3.0), out.getDouble(5))
    // perfect agreement across 2 categories -> kappa exactly 1
    val perfect = Seq((1L, "r1", "a"), (1L, "r2", "a"),
      (2L, "r1", "b"), (2L, "r2", "b")).toDF("item", "rater", "label")
    val p = Eval.fleissKappa(perfect, "item", "rater", "label")
      .collect().head
    assert(p.getDouble(3) == 1.0 && p.getDouble(4) == 0.5 &&
      p.getDouble(5) == 1.0)
    // every rating one category: P_e = 1 -> kappa null (undefined)
    val mono = Seq((1L, "r1", "a"), (1L, "r2", "a"),
      (2L, "r1", "a"), (2L, "r2", "a")).toDF("item", "rater", "label")
    assert(Eval.fleissKappa(mono, "item", "rater", "label")
      .collect().head.isNullAt(5))
    // unbalanced design fails fast
    val e1 = intercept[IllegalArgumentException] {
      Eval.fleissKappa(Seq((1L, "r1", "a"), (1L, "r2", "a"),
        (2L, "r1", "a")).toDF("item", "rater", "label"),
        "item", "rater", "label")
    }
    assert(e1.getMessage.contains("same number of ratings"))
    // duplicate (item, rater) fails fast
    val e2 = intercept[IllegalArgumentException] {
      Eval.fleissKappa(Seq((1L, "r1", "a"), (1L, "r1", "b"))
        .toDF("item", "rater", "label"), "item", "rater", "label")
    }
    assert(e2.getMessage.contains("one rating per"))
    // single rating per item fails fast (n >= 2)
    val e3 = intercept[IllegalArgumentException] {
      Eval.fleissKappa(Seq((1L, "r1", "a"), (2L, "r1", "b"))
        .toDF("item", "rater", "label"), "item", "rater", "label")
    }
    assert(e3.getMessage.contains(">= 2 ratings"))
  }

  test("fleissKappa: equals an independent reference on a " +
    "pseudo-random 20x3 design") {
    val raters = Seq("r1", "r2", "r3")
    val labels = Array("x", "y", "z")
    val rows = for (i <- 1L to 20L; r <- raters) yield
      (i, r, labels(((i * 31 + r.hashCode.abs) % 3).toInt))
    val df = rows.toDF("item", "rater", "label")
    val out = Eval.fleissKappa(df, "item", "rater", "label").collect().head
    // independent driver-side reference from the textbook definition
    val byItem = rows.groupBy(_._1).values.toSeq
    val nI = byItem.size.toDouble
    val n = 3.0
    val s2 = byItem.map(_.groupBy(_._3).values
      .map(g => g.size.toLong * g.size).sum).sum.toDouble
    val pBar = (s2 - nI * n) / (nI * n * (n - 1.0))
    val sc2 = rows.groupBy(_._3).values
      .map(g => g.size.toLong * g.size).sum.toDouble
    val pE = sc2 / ((nI * n) * (nI * n))
    assert(out.getDouble(3) == g6(pBar))
    assert(out.getDouble(4) == g6(pE))
    assert(out.getDouble(5) == g6((pBar - pE) / (1.0 - pE)))
  }

  test("kruskalWallis: hand tie-free case, tie-corrected case, " +
    "identical groups, all-one-value null") {
    // A=(1,2) B=(3,4): ranks 1..4, R_A=3, R_B=7 -> H = 2.4, no ties
    val a = Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0))
      .toDF("g", "v")
    val o1 = Eval.kruskalWallis(a, "g", "v").collect().head
    assert(o1.getLong(0) == 4L && o1.getLong(1) == 2L)
    assert(o1.getDouble(2) == 2.4 && o1.getDouble(3) == 2.4)
    // A=(1,1) B=(2,2): avg ranks 1.5/3.5 -> H = 2.4, CF = 0.8 -> 3.0
    // (scipy.stats.kruskal([1,1],[2,2]) = 3.0)
    val b = Seq(("A", 1.0), ("A", 1.0), ("B", 2.0), ("B", 2.0))
      .toDF("g", "v")
    val o2 = Eval.kruskalWallis(b, "g", "v").collect().head
    assert(o2.getDouble(2) == 2.4 && o2.getDouble(3) == 3.0)
    // identical groups -> H = 0
    val c = Seq(("A", 1.0), ("A", 2.0), ("B", 1.0), ("B", 2.0))
      .toDF("g", "v")
    val o3 = Eval.kruskalWallis(c, "g", "v").collect().head
    assert(o3.getDouble(2) == 0.0 && o3.getDouble(3) == 0.0)
    // all rows one value -> CF = 0 -> h_tie null
    val d = Seq(("A", 5.0), ("A", 5.0), ("B", 5.0), ("B", 5.0))
      .toDF("g", "v")
    val o4 = Eval.kruskalWallis(d, "g", "v").collect().head
    assert(o4.getDouble(2) == 0.0 && o4.isNullAt(3))
  }

  test("kruskalWallis: equals an independent average-rank reference " +
    "on pseudo-random tied data; nulls drop") {
    val vals = (1 to 60).map(i => (s"g${i % 3}", ((i * 17) % 7).toDouble))
    val df = vals.toDF("g", "v")
      .unionByName(Seq(("g0", Option.empty[Double]))
        .toDF("g", "v"))
    val out = Eval.kruskalWallis(df, "g", "v").collect().head
    // reference: average ranks over the sorted multiset
    val sorted = vals.map(_._2).sorted
    val rankOf = sorted.distinct.map { v =>
      val below = sorted.count(_ < v); val t = sorted.count(_ == v)
      v -> (below + (t + 1) / 2.0)
    }.toMap
    val n = vals.size.toDouble
    val s = vals.groupBy(_._1).values.map { g =>
      val rg = g.map(r => rankOf(r._2)).sum
      math.rint(rg * rg / g.size * 1e9) / 1e9
    }.sum
    val h = 12.0 / (n * (n + 1.0)) * s - 3.0 * (n + 1.0)
    val tsum = sorted.groupBy(identity).values
      .map { g => val t = g.size.toDouble; t * (t - 1.0) * (t + 1.0) }.sum
    val cf = 1.0 - tsum / (n * (n - 1.0) * (n + 1.0))
    assert(out.getLong(0) == 60L)
    assert(math.abs(out.getDouble(2) - h) < 1e-6, s"${out.getDouble(2)} vs $h")
    assert(math.abs(out.getDouble(3) - h / cf) < 1e-6)
  }

  test("friedman: perfect-consistency hand case, tied case matches " +
    "scipy, all-tied null, guards") {
    // 3 items all ranking A<B<C: R=(3,6,9), chi2 = 12/36*126 - 36 = 6
    // (the N(k-1) maximum — perfectly consistent blocks)
    val a = (1L to 3L).flatMap(i => Seq((i, "A", 1.0), (i, "B", 2.0),
      (i, "C", 3.0))).toDF("item", "t", "v")
    val o1 = Eval.friedman(a, "item", "t", "v").collect().head
    assert(o1.getLong(0) == 3L && o1.getLong(1) == 3L)
    assert(o1.getDouble(2) == 6.0 && o1.getDouble(3) == 6.0)
    // one tied block: item1 ranks (1.5, 1.5, 3), item2 (1, 2, 3) ->
    // R=(2.5, 3.5, 6), chi2 = 0.5*54.5 - 24 = 3.25; tie sum 2*1*3 = 6,
    // cf = 1 - 6/48 = 0.875 -> chi2_tie = 3.25/0.875 = 3.714286
    // (scipy.stats.friedmanchisquare([1,1],[1,2],[2,3]) = 3.7142857...)
    val b = Seq((1L, "A", 1.0), (1L, "B", 1.0), (1L, "C", 2.0),
      (2L, "A", 1.0), (2L, "B", 2.0), (2L, "C", 3.0)).toDF("item", "t", "v")
    val o2 = Eval.friedman(b, "item", "t", "v").collect().head
    assert(o2.getDouble(2) == 3.25 && o2.getDouble(3) == g6(3.25 / 0.875))
    // every block fully tied: chi2 = 0, correction factor 0 -> null
    val c = (1L to 4L).flatMap(i => Seq((i, "A", 7.0), (i, "B", 7.0),
      (i, "C", 7.0))).toDF("item", "t", "v")
    val o3 = Eval.friedman(c, "item", "t", "v").collect().head
    assert(o3.getDouble(2) == 0.0 && o3.isNullAt(3))
    // incomplete block fails fast
    val e1 = intercept[IllegalArgumentException] {
      Eval.friedman(Seq((1L, "A", 1.0), (1L, "B", 2.0), (2L, "A", 1.0))
        .toDF("item", "t", "v"), "item", "t", "v")
    }
    assert(e1.getMessage.contains("all k treatments"))
    // replicated (item, treatment) fails fast
    val e2 = intercept[IllegalArgumentException] {
      Eval.friedman(Seq((1L, "A", 1.0), (1L, "A", 2.0))
        .toDF("item", "t", "v"), "item", "t", "v")
    }
    assert(e2.getMessage.contains("one observation per"))
    // k = 1 fails fast
    val e3 = intercept[IllegalArgumentException] {
      Eval.friedman(Seq((1L, "A", 1.0), (2L, "A", 2.0))
        .toDF("item", "t", "v"), "item", "t", "v")
    }
    assert(e3.getMessage.contains(">= 2 treatments"))
  }

  test("nemenyi: hand CD case (perfect consistency), tie handling, " +
    "alpha 0.10 table, guards") {
    // 3 items all ranking A<B<C: mean ranks (1, 2, 3), N = 3, k = 3,
    // CD = 2.343 * sqrt(2/3) = 1.913052; |A-B| = 1 < CD not significant,
    // |A-C| = 2 > CD significant
    val a = (1L to 3L).flatMap(i => Seq((i, "A", 1.0), (i, "B", 2.0),
      (i, "C", 3.0))).toDF("item", "t", "v")
    val out = Eval.nemenyi(a, "item", "t", "v").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(4), r.getDouble(5), r.getInt(6)))).toMap
    val cd = g6(2.343 * math.sqrt(2.0 / 3.0))
    assert(out(("A", "B")) == ((1.0, cd, 0)))
    assert(out(("A", "C")) == ((2.0, cd, 1)))
    assert(out(("B", "C")) == ((1.0, cd, 0)))
    // tied block: item1 (1.5, 1.5, 3), item2 (1, 2, 3) ->
    // mean ranks A 1.25, B 1.75, C 3
    val b = Seq((1L, "A", 1.0), (1L, "B", 1.0), (1L, "C", 2.0),
      (2L, "A", 1.0), (2L, "B", 2.0), (2L, "C", 3.0)).toDF("item", "t", "v")
    val o2 = Eval.nemenyi(b, "item", "t", "v").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(o2(("A", "B")) == 0.5 && o2(("A", "C")) == 1.75 &&
      o2(("B", "C")) == 1.25)
    // alpha 0.10 tightens the gate (smaller q -> smaller CD)
    val cd10 = Eval.nemenyi(a, "item", "t", "v", alpha = 0.10)
      .collect().head.getDouble(5)
    assert(cd10 == g6(2.052 * math.sqrt(2.0 / 3.0)) && cd10 < cd)
    // unsupported alpha and k > 10 fail fast
    intercept[IllegalArgumentException](
      Eval.nemenyi(a, "item", "t", "v", alpha = 0.01))
    val wide = (1L to 2L).flatMap(i =>
      (1 to 11).map(j => (i, s"t$j", j.toDouble))).toDF("item", "t", "v")
    val e = intercept[IllegalArgumentException](
      Eval.nemenyi(wide, "item", "t", "v"))
    assert(e.getMessage.contains("2..10"))
    // shares friedman's complete-block guard
    intercept[IllegalArgumentException](
      Eval.nemenyi(Seq((1L, "A", 1.0), (1L, "B", 2.0), (2L, "A", 1.0))
        .toDF("item", "t", "v"), "item", "t", "v"))
  }

  test("friedman: equals an independent within-block average-rank " +
    "reference on pseudo-random tied data") {
    val ks = Seq("s1", "s2", "s3", "s4")
    val rows = for (i <- 1L to 25L; (t, j) <- ks.zipWithIndex)
      yield (i, t, ((i * 13 + j * 7) % 5).toDouble)
    val df = rows.toDF("item", "t", "v")
    val out = Eval.friedman(df, "item", "t", "v").collect().head
    // reference: average ranks within each block over its own multiset
    val byItem = rows.groupBy(_._1)
    def rankIn(i: Long, v: Double): Double = {
      val vs = byItem(i).map(_._3)
      vs.count(_ < v) + (vs.count(_ == v) + 1) / 2.0
    }
    val nI = 25.0; val k = 4.0
    val s = rows.groupBy(_._2).values.map { g =>
      val rj = g.map(r => rankIn(r._1, r._3)).sum
      math.rint(rj * rj * 1e9) / 1e9
    }.sum
    val chi2 = 12.0 / (nI * k * (k + 1.0)) * s - 3.0 * nI * (k + 1.0)
    val tsum = rows.groupBy(r => (r._1, r._3)).values
      .map { g => val t = g.size.toDouble; t * (t - 1.0) * (t + 1.0) }.sum
    val cf = 1.0 - tsum / (nI * k * (k * k - 1.0))
    assert(out.getLong(0) == 25L && out.getLong(1) == 4L)
    assert(math.abs(out.getDouble(2) - chi2) < 1e-6,
      s"${out.getDouble(2)} vs $chi2")
    assert(math.abs(out.getDouble(3) - chi2 / cf) < 1e-6)
  }

  test("dunn: hand tie-free case, tie-corrected case, all-one-value " +
    "null, single group empty") {
    // A=(1,2,3) B=(4,5,6) C=(7,8,9): ranks 1..9, mean ranks 2/5/8,
    // sigma^2 = 9*10/12 = 7.5, se = sqrt(7.5 * 2/3) = sqrt(5)
    val a = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 4.0),
      ("B", 5.0), ("B", 6.0), ("C", 7.0), ("C", 8.0), ("C", 9.0))
      .toDF("g", "v")
    val o1 = Eval.dunn(a, "g", "v")
      .orderBy("group_a", "group_b").collect()
    assert(o1.length == 3)
    val ab = o1(0); val ac = o1(1); val bc = o1(2)
    assert(ab.getString(0) == "A" && ab.getString(1) == "B" &&
      ab.getLong(2) == 3L && ab.getLong(3) == 3L &&
      ab.getDouble(4) == 2.0 && ab.getDouble(5) == 5.0)
    assert(ab.getDouble(6) == g6(-3.0 / math.sqrt(5.0)))
    assert(ac.getDouble(6) == g6(-6.0 / math.sqrt(5.0)))
    assert(bc.getDouble(6) == g6(-3.0 / math.sqrt(5.0)))
    // ties: A=(1,1,2) B=(2,3,3): avg ranks 1.5/3.5/5.5, mean ranks
    // round9(6.5/3) and round9(14.5/3), tsum = 3*2*1*3 = 18,
    // sigma^2 = 6*7/12 - 18/(12*5) = 3.2, se = sqrt(3.2 * 2/3)
    val b = Seq(("A", 1.0), ("A", 1.0), ("A", 2.0), ("B", 2.0),
      ("B", 3.0), ("B", 3.0)).toDF("g", "v")
    val o2 = Eval.dunn(b, "g", "v").collect().head
    val ma = math.rint(6.5 / 3.0 * 1e9) / 1e9
    val mb = math.rint(14.5 / 3.0 * 1e9) / 1e9
    assert(o2.getDouble(4) == g6(ma) && o2.getDouble(5) == g6(mb))
    assert(o2.getDouble(6) ==
      g6((ma - mb) / math.sqrt(3.2 * (2.0 / 3.0))))
    // all rows one value -> sigma^2 = 0 -> z null (mean ranks equal)
    val c = Seq(("A", 5.0), ("A", 5.0), ("B", 5.0)).toDF("g", "v")
    val o3 = Eval.dunn(c, "g", "v").collect().head
    assert(o3.getDouble(4) == 2.0 && o3.getDouble(5) == 2.0 &&
      o3.isNullAt(6))
    // one group -> no pairs
    assert(Eval.dunn(Seq(("A", 1.0), ("A", 2.0)).toDF("g", "v"),
      "g", "v").collect().isEmpty)
  }

  test("dunn: equals an independent shared-ranking reference on " +
    "pseudo-random tied data; agrees with kruskalWallis machinery") {
    val vals = (1 to 60).map(i => (s"g${i % 3}", ((i * 17) % 7).toDouble))
    val df = vals.toDF("g", "v")
    val out = Eval.dunn(df, "g", "v")
      .orderBy("group_a", "group_b").collect()
    assert(out.length == 3)
    // reference: average ranks over the sorted multiset (the
    // kruskalWallis reference construction), pairwise z
    val sorted = vals.map(_._2).sorted
    val rankOf = sorted.distinct.map { v =>
      val below = sorted.count(_ < v); val t = sorted.count(_ == v)
      v -> (below + (t + 1) / 2.0)
    }.toMap
    val n = vals.size.toDouble
    val tsum = sorted.groupBy(identity).values
      .map { g => val t = g.size.toDouble; t * (t - 1.0) * (t + 1.0) }.sum
    val sig2 = n * (n + 1.0) / 12.0 - tsum / (12.0 * (n - 1.0))
    val stats = vals.groupBy(_._1).map { case (g, rows) =>
      g -> (math.rint(rows.map(r => rankOf(r._2)).sum / rows.size * 1e9)
        / 1e9, rows.size)
    }
    for (row <- out) {
      val (ma, na) = stats(row.getString(0))
      val (mb, nb) = stats(row.getString(1))
      assert(row.getLong(2) == na.toLong && row.getLong(3) == nb.toLong)
      assert(row.getDouble(4) == g6(ma) && row.getDouble(5) == g6(mb))
      val z = (ma - mb) / math.sqrt(sig2 * (1.0 / na + 1.0 / nb))
      assert(math.abs(row.getDouble(6) - z) < 1e-6,
        s"${row.getDouble(6)} vs $z")
    }
  }

  test("leveneTest: Brown-Forsythe hand case, Levene mean variant, " +
    "all-constant null, bad center guard") {
    // A = 1..4 (median 2.5 → devs 1.5,.5,.5,1.5), B = 10,20,30
    // (median 20 → devs 10,0,10): W = 4.067558 by the anovaF fold
    val a = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 4.0),
      ("B", 10.0), ("B", 20.0), ("B", 30.0)).toDF("g", "v")
    val o1 = Eval.leveneTest(a, "g", "v").collect().head
    assert(o1.getLong(0) == 2L && o1.getLong(1) == 7L)
    assert(o1.getDouble(2) == 4.067558)
    // mean-centered: A = 1,2,3 devs 1,0,1; B = 2,4,6 devs 2,0,2 →
    // SSB = 2/3, SSW = 10/3, W = (2/3)/((10/3)/4) = 0.8
    val b = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 2.0),
      ("B", 4.0), ("B", 6.0)).toDF("g", "v")
    val o2 = Eval.leveneTest(b, "g", "v", center = "mean").collect().head
    assert(o2.getDouble(2) == 0.8)
    // every group constant → all deviations 0 → SSW = 0 → null W
    val c = Seq(("A", 5.0), ("A", 5.0), ("B", 7.0), ("B", 7.0))
      .toDF("g", "v")
    assert(Eval.leveneTest(c, "g", "v").collect().head.isNullAt(2))
    assertThrows[IllegalArgumentException](
      Eval.leveneTest(a, "g", "v", center = "mode"))
  }

  test("leveneTest: grid median matches sort median on tied " +
    "pseudo-random data (odd and even group sizes); equals the " +
    "brute-force W") {
    val vals = (1 to 61).map(i => (s"g${i % 3}", ((i * 29) % 13).toDouble))
    val out = Eval.leveneTest(vals.toDF("g", "v"), "g", "v")
      .collect().head
    // brute reference: sort-median per group, |dev| on the 9-grid,
    // the anovaF sufficient-stat fold
    def g9(x: Double) = math.rint(x * 1e9) / 1e9
    val byG = vals.groupBy(_._1).map { case (g, rs) =>
      val s = rs.map(_._2).sorted
      val m = (s((s.size + 1) / 2 - 1) + s(s.size / 2)) / 2.0
      g -> rs.map(r => g9(math.abs(r._2 - m)))
    }
    val n = vals.size.toDouble; val k = byG.size.toDouble
    val sS = byG.values.map(_.sum).sum
    val q = byG.values.map(_.map(z => g9(z * z)).sum).sum
    val bS = byG.values.map(z => g9(z.sum * z.sum / z.size)).sum
    val w = ((bS - sS * sS / n) / (k - 1.0)) / ((q - bS) / (n - k))
    assert(out.getLong(0) == 3L && out.getLong(1) == 61L)
    assert(math.abs(out.getDouble(2) - w) < 1e-6,
      s"${out.getDouble(2)} vs $w")
  }

  test("jonckheereTerpstra: hand tied case, perfect trend, sign flip, " +
    "all-tied null") {
    // A = 1,2  B = 2,3  C = 4,5: J = 11.5 (one A-B tie at 2),
    // E = (36 - 12)/4 = 6, tie-corrected var = 6.133333 → z = 2.220825
    val a = Seq(("A", 1.0), ("A", 2.0), ("B", 2.0), ("B", 3.0),
      ("C", 4.0), ("C", 5.0)).toDF("g", "v")
    val o1 = Eval.jonckheereTerpstra(a, "g", "v").collect().head
    assert(o1.getLong(0) == 6L && o1.getLong(1) == 3L)
    assert(o1.getDouble(2) == 11.5 && o1.getDouble(3) == 2.220825)
    // perfect separation: J = 3 pairs * 4 = 12, z = 2.384158
    val b = Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0),
      ("C", 5.0), ("C", 6.0)).toDF("g", "v")
    val o2 = Eval.jonckheereTerpstra(b, "g", "v").collect().head
    assert(o2.getDouble(2) == 12.0 && o2.getDouble(3) == 2.384158)
    // reversing group order flips the trend: J = 0, z = -2.384158
    val c = Seq(("C", 1.0), ("C", 2.0), ("B", 3.0), ("B", 4.0),
      ("A", 5.0), ("A", 6.0)).toDF("g", "v")
    val o3 = Eval.jonckheereTerpstra(c, "g", "v").collect().head
    assert(o3.getDouble(2) == 0.0 && o3.getDouble(3) == -2.384158)
    // every value tied → variance 0 → null z; J = half-count
    val d = Seq(("A", 5.0), ("A", 5.0), ("B", 5.0)).toDF("g", "v")
    val o4 = Eval.jonckheereTerpstra(d, "g", "v").collect().head
    assert(o4.getDouble(2) == 1.0 && o4.isNullAt(3))
  }

  test("jonckheereTerpstra: equals brute-force pair counting and the " +
    "independent moment formula on pseudo-random tied data") {
    val vals = (1 to 72).map(i => (s"g${i % 4}", ((i * 23) % 9).toDouble))
    val out = Eval.jonckheereTerpstra(vals.toDF("g", "v"), "g", "v")
      .collect().head
    val names = vals.map(_._1).distinct.sorted
    var j = 0.0
    for {
      (ga, ia) <- names.zipWithIndex; gb <- names.drop(ia + 1)
      x <- vals.filter(_._1 == ga).map(_._2)
      y <- vals.filter(_._1 == gb).map(_._2)
    } j += (if (x < y) 1.0 else if (x == y) 0.5 else 0.0)
    val n = vals.size.toDouble
    val ns = names.map(g => vals.count(_._1 == g).toDouble)
    val ts = vals.groupBy(_._2).values.map(_.size.toDouble)
    val e = (n * n - ns.map(x => x * x).sum) / 4.0
    val va = n * (n - 1) * (2 * n + 5) -
      ns.map(x => x * (x - 1) * (2 * x + 5)).sum -
      ts.map(t => t * (t - 1) * (2 * t + 5)).sum
    val vb = ns.map(x => x * (x - 1) * (x - 2)).sum *
      ts.map(t => t * (t - 1) * (t - 2)).sum
    val vc = ns.map(x => x * (x - 1)).sum * ts.map(t => t * (t - 1)).sum
    val variance = va / 72.0 + vb / (36.0 * n * (n - 1) * (n - 2)) +
      vc / (8.0 * n * (n - 1))
    assert(out.getLong(0) == 72L && out.getLong(1) == 4L)
    assert(out.getDouble(2) == j)
    val z = (j - e) / math.sqrt(variance)
    assert(math.abs(out.getDouble(3) - z) < 1e-6,
      s"${out.getDouble(3)} vs $z")
  }

  test("jarqueBera: hand skewed and symmetric cases, constant-group " +
    "null, group independence, nulls drop") {
    // 1,2,3,4,10: mu=4, m2=10.4, m3=33.6, m4=216.8 →
    // S=1.13842, K=2.788, JB=1.089363; 1..5 symmetric → S=0, K=1.7
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("a", 10.0), ("b", 1.0), ("b", 2.0), ("b", 3.0), ("b", 4.0),
      ("b", 5.0), ("c", 7.0), ("c", 7.0)).toDF("g", "v")
    val out = Eval.jarqueBera(df, "g", "v").orderBy("g").collect()
    assert(out.length == 3)
    assert(out(0).getLong(1) == 5L &&
      out(0).getDouble(2) == 1.13842 && out(0).getDouble(3) == 2.788 &&
      out(0).getDouble(4) == 1.089363)
    assert(out(1).getDouble(2) == 0.0 && out(1).getDouble(3) == 1.7 &&
      out(1).getDouble(4) == 0.352083)
    assert(out(2).getLong(1) == 2L && out(2).isNullAt(2) &&
      out(2).isNullAt(3) && out(2).isNullAt(4))
    val withNull = df.union(Seq((null: String, 1.0)).toDF("g", "v"))
      .union(Seq(("a", null: java.lang.Double)).toDF("g", "v"))
    val out2 = Eval.jarqueBera(withNull, "g", "v").orderBy("g").collect()
    assert(out2.length == 3 && out2(0).getLong(1) == 5L)
  }

  test("jarqueBera: equals an independent centered-moment reference " +
    "on pseudo-random data") {
    def g9d(x: Double) = math.rint(x * 1e9) / 1e9
    val vals = (1 to 100).map(i => (s"g${i % 2}", ((i * 37) % 19) / 3.0))
    val out = Eval.jarqueBera(vals.toDF("g", "v"), "g", "v")
      .orderBy("g").collect()
    for (row <- out) {
      val xs = vals.filter(_._1 == row.getString(0)).map(_._2)
      val n = xs.size.toDouble
      val mu = g9d(xs.map(g9d).sum / n)
      val dev = xs.map(x => g9d(x - mu))
      val m2 = dev.map(x => g9d(x * x)).sum / n
      val m3 = dev.map(x => g9d(x * x * x)).sum / n
      val m4 = dev.map(x => g9d(x * x * x * x)).sum / n
      val sk = m3 / math.pow(m2, 1.5); val ku = m4 / (m2 * m2)
      assert(math.abs(row.getDouble(2) - sk) < 1e-6)
      assert(math.abs(row.getDouble(3) - ku) < 1e-6)
      val jb = n / 6.0 * (sk * sk + (ku - 3.0) * (ku - 3.0) / 4.0)
      assert(math.abs(row.getDouble(4) - jb) < 1e-6,
        s"${row.getDouble(4)} vs $jb")
    }
  }

  private def mhRows(tables: Seq[(String, Long, Long, Long, Long)]) =
    tables.flatMap { case (s, a, b, c, d) =>
      Seq.fill(a.toInt)((s, 1, 1)) ++ Seq.fill(b.toInt)((s, 1, 0)) ++
        Seq.fill(c.toInt)((s, 0, 1)) ++ Seq.fill(d.toInt)((s, 0, 0))
    }.toDF("s", "e", "o")

  test("mantelHaenszel: hand two-stratum case, null-table continuity " +
    "behavior, degenerate guards") {
    // (10,5,3,12) + (4,16,2,18): OR_MH = 4.461538, CMH = 4.979979
    val out = Eval.mantelHaenszel(
      mhRows(Seq(("s1", 10L, 5L, 3L, 12L), ("s2", 4L, 16L, 2L, 18L))),
      "s", "e", "o").collect().head
    assert(out.getLong(0) == 2L && out.getLong(1) == 70L)
    assert(out.getDouble(2) == 4.461538 && out.getDouble(3) == 4.979979)
    // perfectly null tables: OR = 1, chi2 = 0.25/SV (the unclamped R
    // continuity correction) = 0.095
    val nul = Eval.mantelHaenszel(
      mhRows(Seq(("s1", 5L, 5L, 5L, 5L), ("s2", 5L, 5L, 5L, 5L))),
      "s", "e", "o").collect().head
    assert(nul.getDouble(2) == 1.0 && nul.getDouble(3) == 0.095)
    // no discordant pairs anywhere (bc = 0) -> null OR
    val conc = Eval.mantelHaenszel(
      mhRows(Seq(("s1", 3L, 0L, 0L, 3L))), "s", "e", "o")
      .collect().head
    assert(conc.isNullAt(2))
    val onecell = Eval.mantelHaenszel(
      mhRows(Seq(("s1", 4L, 0L, 0L, 0L))), "s", "e", "o")
      .collect().head
    assert(onecell.isNullAt(3))
  }

  test("mantelHaenszel: unbalanced strata — equals an independent " +
    "fold, MH agrees with the stratum-wise direction") {
    // both strata carry OR > 1 with very different exposure mixes
    val tabs = Seq(("a", 18L, 12L, 7L, 13L), ("b", 3L, 27L, 1L, 19L))
    val out = Eval.mantelHaenszel(mhRows(tabs), "s", "e", "o")
      .collect().head
    def g9d(x: Double) = math.rint(x * 1e9) / 1e9
    var num = 0.0; var den = 0.0; var sa = 0L; var se = 0.0; var sv = 0.0
    for ((_, a, b, c, d) <- tabs) {
      val n = (a + b + c + d).toDouble
      num += g9d(a * d / n); den += g9d(b * c / n); sa += a
      se += g9d((a + b) * (a + c) / n)
      sv += g9d((a + b) * (c + d) * ((a + c) * (b + d)) /
        (n * n * (n - 1.0)))
    }
    assert(out.getDouble(2) == math.rint(num / den * 1e6) / 1e6)
    val dev = math.abs(sa - se) - 0.5
    assert(math.abs(out.getDouble(3) - dev * dev / sv) < 1e-6)
    // the stratum-wise ORs both exceed 1; MH agrees
    assert(out.getDouble(2) > 1.0)
  }

  test("cochranArmitage: hand rising trend, flat → 0, sign flip, " +
    "degenerate guards, equals independent integer fold") {
    def rows(tabs: Seq[(String, Int, Int)]) = tabs.flatMap {
      case (g, n, r) => Seq.fill(r)((g, 1)) ++ Seq.fill(n - r)((g, 0))
    }.toDF("g", "o")
    // rates 1/10 → 3/10 → 6/10 across a < b < c: z = 2.371708
    val o1 = Eval.cochranArmitage(
      rows(Seq(("a", 10, 1), ("b", 10, 3), ("c", 10, 6))), "g", "o")
      .collect().head
    assert(o1.getLong(0) == 3L && o1.getLong(1) == 30L &&
      o1.getLong(2) == 10L)
    assert(o1.getDouble(3) == 2.371708)
    // flat rates → exactly 0
    val o2 = Eval.cochranArmitage(
      rows(Seq(("a", 10, 5), ("b", 10, 5), ("c", 10, 5))), "g", "o")
      .collect().head
    assert(o2.getDouble(3) == 0.0)
    // reversing the labels flips the sign
    val o3 = Eval.cochranArmitage(
      rows(Seq(("c", 10, 1), ("b", 10, 3), ("a", 10, 6))), "g", "o")
      .collect().head
    assert(o3.getDouble(3) == -2.371708)
    // all successes / single group → null
    assert(Eval.cochranArmitage(
      rows(Seq(("a", 5, 5), ("b", 5, 5))), "g", "o")
      .collect().head.isNullAt(3))
    assert(Eval.cochranArmitage(
      rows(Seq(("a", 10, 4))), "g", "o").collect().head.isNullAt(3))
    // 4-group independent fold
    val tabs = Seq(("a", 8, 2), ("b", 12, 3), ("c", 10, 9), ("d", 5, 5))
    val o4 = Eval.cochranArmitage(rows(tabs), "g", "o").collect().head
    val nT = tabs.map(_._2).sum.toDouble
    val rT = tabs.map(_._3).sum.toDouble
    val sr = tabs.zipWithIndex.map { case ((_, _, r), i) => i * r }.sum
    val sn = tabs.zipWithIndex.map { case ((_, n, _), i) => i * n }.sum
    val s2n = tabs.zipWithIndex.map { case ((_, n, _), i) => i * i * n }.sum
    val z = (nT * sr - rT * sn) /
      math.sqrt(rT * (nT - rT) * (nT * s2n - sn.toDouble * sn) / nT)
    assert(o4.getDouble(3) == math.rint(z * 1e6) / 1e6)
    assert(o4.getDouble(3) == 3.615938)
  }
}
