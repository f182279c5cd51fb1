package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  // --- naiveBayes ----------------------------------------------------------

  test("naiveBayes: hand-computed two-class posterior (Laplace, tf weighting)") {
    val train = Seq(
      (1L, "spam", "buy cheap pills"),
      (2L, "spam", "cheap pills now"),
      (3L, "ham", "meeting notes attached"),
      (4L, "ham", "notes for the meeting"))
      .toDF("id", "y", "text")
    val score = Seq((10L, "cheap pills"), (11L, "meeting notes"))
      .toDF("id", "text")
    val out = Classify.naiveBayes(train, score, "id", "text", "y")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(10L -> "spam", 11L -> "ham"))

    // exact score check for doc 10: vocab V = 9, spam tot = 6, prior ln(1/2)
    // p(cheap|spam) = (2+1)/(6+9), p(pills|spam) = (2+1)/(6+9)
    val g9 = (x: Double) => math.rint(x * 1e9) / 1e9
    val expected = math.rint((g9(math.log(0.5)) +
      g9(g9(math.log(3.0 / 15)) * 1) + g9(g9(math.log(3.0 / 15)) * 1)) * 1e4) / 1e4
    val s10 = Classify.naiveBayes(train, score, "id", "text", "y")
      .filter(col("id") === 10L).collect().head.getDouble(2)
    assert(s10 == expected)
  }

  test("naiveBayes: OOV tokens drop; all-OOV doc falls back to prior argmax") {
    val train = Seq(
      (1L, "a", "x x x"), (2L, "a", "x y"), (3L, "b", "z"))
      .toDF("id", "y", "text")
    // doc 20 is entirely out of vocabulary → majority prior wins ("a");
    // doc 21 mixes one OOV token with an in-vocab one → classified
    val score = Seq((20L, "qqq www"), (21L, "z qqq")).toDF("id", "text")
    val out = Classify.naiveBayes(train, score, "id", "text", "y")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(20L) == "a")
    assert(out(21L) == "b")
  }

  test("naiveBayes: tf multiplies — repeated tokens outvote singletons") {
    val train = Seq(
      (1L, "a", "left left left right"), (2L, "b", "right right right left"))
      .toDF("id", "y", "text")
    val score = Seq((30L, "left left right"), (31L, "right right left"))
      .toDF("id", "text")
    val out = Classify.naiveBayes(train, score, "id", "text", "y")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(30L -> "a", 31L -> "b"))
  }

  test("naiveBayes: deterministic lexicographic tie-break") {
    // perfectly symmetric classes → identical scores → smallest label
    val train = Seq((1L, "bb", "t"), (2L, "aa", "t")).toDF("id", "y", "text")
    val score = Seq((40L, "t")).toDF("id", "text")
    val out = Classify.naiveBayes(train, score, "id", "text", "y").collect()
    assert(out.head.getString(1) == "aa")
  }

  // --- infoGainSplit -------------------------------------------------------

  test("infoGainSplit: perfect separator recovers the boundary with full gain") {
    val df = ((1 to 50).map(i => (i.toDouble, "lo")) ++
      (51 to 100).map(i => (i.toDouble, "hi"))).toDF("x", "y")
    val r = Classify.infoGainSplit(df, "x", "y").collect().head
    assert(r.getDouble(0) == 50.0)
    assert(r.getLong(1) == 50L && r.getLong(2) == 50L)
    // H(S) = ln 2 for the balanced parent, children pure → IG = ln 2
    assert(r.getDouble(3) == math.rint(math.log(2.0) * 1e6) / 1e6)
  }

  test("infoGainSplit matches a brute-force scan over all thresholds") {
    val data = (1 to 200).map { i =>
      val v = (i * 37 % 23).toDouble
      val y = if ((i * 7919) % 3 == 0) "a" else if (v > 11) "b" else "c"
      (v, y)
    }
    val df = data.toDF("x", "y")
    def entropy(xs: Seq[String]): Double = {
      val n = xs.size.toDouble
      xs.groupBy(identity).values.map { g =>
        val p = g.size / n; -p * math.log(p)
      }.sum
    }
    val hS = entropy(data.map(_._2))
    val candidates = data.map(_._1).distinct.sorted.dropRight(1)
    val best = candidates.map { v =>
      val (le, gt) = data.partition(_._1 <= v)
      val ig = hS - (le.size.toDouble / data.size) * entropy(le.map(_._2)) -
        (gt.size.toDouble / data.size) * entropy(gt.map(_._2))
      (v, ig)
    }.maxBy { case (v, ig) => (math.rint(ig * 1e6) / 1e6, -v) }
    val r = Classify.infoGainSplit(df, "x", "y").collect().head
    assert(r.getDouble(0) == best._1)
    assert(math.abs(r.getDouble(3) - best._2) < 1e-5)
  }

  test("infoGainSplit: uninformative feature → zero gain; nulls drop") {
    val df = Seq((Some(1.0), Some("a")), (Some(1.0), Some("b")),
      (Some(2.0), Some("a")), (Some(2.0), Some("b")),
      (None, Some("a")), (Some(3.0), None))
      .toDF("x", "y")
    val r = Classify.infoGainSplit(df, "x", "y").collect().head
    assert(r.getDouble(3) == 0.0)
    assert(r.getLong(1) + r.getLong(2) == 4L)
  }

  // --- logisticGD ----------------------------------------------------------

  private def r9(x: Double) = math.rint(x * 1e9) / 1e9

  /** Independent driver-side replay of the documented recursion. */
  private def gdReference(data: Seq[(Double, Double)], lr: Double,
                          iters: Int): (Double, Double) = {
    var w0 = 0.0; var w1 = 0.0
    for (_ <- 1 to iters) {
      val terms = data.map { case (y, x) =>
        val e = y - r9(1.0 / (1.0 + math.exp(-(w0 + x * w1))))
        (BigDecimal(r9(e)).setScale(9), BigDecimal(r9(e * x)).setScale(9))
      }
      val g0 = terms.map(_._1).sum
      val g1 = terms.map(_._2).sum
      val n = data.size
      w0 = r9(w0 + lr * (g0.toDouble / n))
      w1 = r9(w1 + lr * (g1.toDouble / n))
    }
    (w0, w1)
  }

  test("logisticGD: one step from zero is the hand-computable update") {
    // z = 0 → σ = 0.5 exactly; g0 = 0, gx = 1.0, n = 2 → w = (0, 0.25)
    val df = Seq((1, 1.0), (0, -1.0)).toDF("y", "x")
    val out = Classify.logisticGD(df, "y", Seq("x"), lr = 0.5, iters = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("intercept" -> 0.0, "x" -> 0.25))
  }

  test("logisticGD ≡ independent driver-side recursion over 3 steps") {
    val data = (1 to 200).map { i =>
      val x = ((i * 40507L) % 101) / 101.0 - 0.5
      val y = if ((i * 2654435761L % 97) % 3 == 0 || x > 0.2) 1.0 else 0.0
      (y, x)
    }
    val df = data.map { case (y, x) => (y.toInt, x) }.toDF("y", "x")
    val (ew0, ew1) = gdReference(data, lr = 0.5, iters = 3)
    val out = Classify.logisticGD(df, "y", Seq("x"), lr = 0.5, iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("intercept") == ew0)
    assert(out("x") == ew1)
  }

  test("logisticGD: separating feature gets a positive weight; rerun and " +
    "repartition are bit-identical") {
    val data = (1 to 120).map { i =>
      val x = if (i % 2 == 0) 1.0 else -1.0
      (if (x > 0) 1 else 0, x, ((i * 37) % 7).toDouble)
    }
    val df = data.toDF("y", "x", "noise")
    val w = Classify.logisticGD(df, "y", Seq("x", "noise"), 0.5, 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(w("x") > 0.3)
    assert(math.abs(w("noise")) < math.abs(w("x")))
    val w2 = Classify.logisticGD(df.repartition(7), "y",
        Seq("x", "noise"), 0.5, 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(w2 == w)
  }

  test("logisticGD: null rows drop; guards reject bad arguments") {
    val df = Seq((Some(1), Some(1.0)), (Some(0), Some(-1.0)),
      (None, Some(9.0)), (Some(1), None)).toDF("y", "x")
    val out = Classify.logisticGD(df, "y", Seq("x"), 0.5, 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("intercept" -> 0.0, "x" -> 0.25))
    intercept[IllegalArgumentException] {
      Classify.logisticGD(df, "y", Seq.empty, 0.5, 1)
    }
    intercept[IllegalArgumentException] {
      Classify.logisticGD(df, "y", Seq("x"), -1.0, 1)
    }
  }

  // --- quantileGD ----------------------------------------------------------

  test("quantileGD: hand one-step update — all-positive y gives e = τ " +
    "everywhere; τ asymmetry") {
    val df = Seq((3.0, 2.0), (5.0, 4.0), (9.0, 6.0)).toDF("y", "x")
    // step 1 from w = 0: margin 0 < y → indicator 0 → e = τ;
    // w0 = lr·τ, wx = lr·τ·mean(x) = lr·τ·4
    val w = Classify.quantileGD(df, "y", Seq("x"), tau = 0.5,
      lr = 0.5, iters = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(w("intercept") == 0.25)
    assert(w("x") == 1.0)
    val w9 = Classify.quantileGD(df, "y", Seq("x"), 0.9, 0.5, 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val w1 = Classify.quantileGD(df, "y", Seq("x"), 0.1, 0.5, 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(w9("intercept") > w1("intercept"))
  }

  test("quantileGD ≡ independent driver-side recursion over 3 steps; " +
    "partitioning-invariant") {
    def g9(x: Double): Double = math.rint(x * 1e9) / 1e9
    val rows = (1 to 120).map { i =>
      val x = (i % 11) / 10.0
      (2.0 * x + (i % 7) * 0.3, x)
    }
    val df = rows.toDF("y", "x")
    val (tau, lr) = (0.5, 0.4)
    var (a, b) = (0.0, 0.0)
    for (_ <- 1 to 3) {
      val terms = rows.map { case (y, x) =>
        val ind = if (y <= g9(a + x * b)) 1.0 else 0.0
        (BigDecimal(g9(tau - ind)), BigDecimal(g9((tau - ind) * x)))
      }
      val n = rows.size
      a = g9(a + lr * (terms.map(_._1).sum.toDouble / n))
      b = g9(b + lr * (terms.map(_._2).sum.toDouble / n))
    }
    val w = Classify.quantileGD(df, "y", Seq("x"), tau, lr, 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(w("intercept") == a)
    assert(w("x") == b)
    val w2 = Classify.quantileGD(df.repartition(7), "y", Seq("x"),
      tau, lr, 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(w2 == w)
    intercept[IllegalArgumentException] {
      Classify.quantileGD(df, "y", Seq("x"), 1.2, 0.5, 1)
    }
    intercept[IllegalArgumentException] {
      Classify.quantileGD(df, "y", Seq.empty, 0.5, 0.5, 1)
    }
  }

  // --- decisionTreeDepth2 --------------------------------------------------

  test("decisionTreeDepth2: perfect root split; pure children still " +
    "report their best (zero-gain) thresholds") {
    val rows = Seq.fill(6)((1.0, "A")) ++ Seq.fill(6)((2.0, "A")) ++
      Seq.fill(6)((3.0, "B")) ++ Seq.fill(6)((4.0, "B"))
    val out = Classify.decisionTreeDepth2(rows.toDF("x", "y"), "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out.keySet == Set("root", "le", "gt"))
    assert(out("root")._1 == 2.0 && out("root")._2 == 12L &&
      out("root")._3 == 12L)
    assert(out("root")._4 == math.rint(math.log(2) * 1e6) / 1e6)
    // both sides are pure: best candidate gains 0 (primitive compare —
    // a boxed tuple equality would reject an IEEE −0.0), smallest
    // threshold wins
    assert(out("le")._1 == 1.0 && out("le")._2 == 6L &&
      out("le")._3 == 6L && out("le")._4 == 0.0)
    assert(out("gt")._1 == 3.0 && out("gt")._2 == 6L &&
      out("gt")._3 == 6L && out("gt")._4 == 0.0)
  }

  test("decisionTreeDepth2: a single-distinct-value side emits no row") {
    val rows = Seq.fill(5)((1.0, "A")) ++ Seq.fill(5)((3.0, "B")) ++
      Seq.fill(5)((4.0, "B"))
    val out = Classify.decisionTreeDepth2(rows.toDF("x", "y"), "x", "y")
      .collect().map(_.getString(0)).toSet
    assert(out == Set("root", "gt")) // le side is the single value 1.0
  }

  test("decisionTreeDepth2 ≡ infoGainSplit recursed by hand; " +
    "partitioning-invariant") {
    val rows = (1 to 200).map { i =>
      val v = (i % 17).toDouble + (i % 3) * 0.25
      val y = if (v < 5 && i % 7 != 0) "lo"
        else if (v < 11) "mid" else "hi"
      (v, y)
    }
    val df = rows.toDF("x", "y")
    val tree = Classify.decisionTreeDepth2(df, "x", "y")
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val root = Classify.infoGainSplit(df, "x", "y").collect().head
    assert(tree("root") == root.toSeq)
    val rt = root.getDouble(0)
    val le = Classify.infoGainSplit(
      df.filter(col("x") <= rt), "x", "y").collect().head
    val gt = Classify.infoGainSplit(
      df.filter(col("x") > rt), "x", "y").collect().head
    assert(tree("le") == le.toSeq)
    assert(tree("gt") == gt.toSeq)
    val tree2 = Classify.decisionTreeDepth2(df.repartition(11), "x", "y")
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(tree2 == tree)
  }
}
