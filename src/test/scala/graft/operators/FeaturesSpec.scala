package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("targetEncode: shrinkage toward the global mean, alpha = 0 raw means, null target drop") {
    // cat a: targets 10, 20 (mean 15, n 2); cat b: target 100 (n 1);
    // global mean = 130/3
    val df = Seq(("a", 10.0), ("a", 20.0), ("b", 100.0))
      .toDF("cat", "y")
    val g = 130.0 / 3
    val out = Features.targetEncode(df, "cat", "y", alpha = 2.0)
      .as[(String, Long, Double)].collect()
      .map { case (c, n, e) => c -> ((n, e)) }.toMap
    val expA = BigDecimal((30.0 + 2 * g) / 4)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expB = BigDecimal((100.0 + 2 * g) / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Map("a" -> ((2L, expA)), "b" -> ((1L, expB))), s"$out")

    // alpha = 0: raw category means
    val raw = Features.targetEncode(df, "cat", "y", alpha = 0.0)
      .as[(String, Long, Double)].collect()
      .map { case (c, _, e) => c -> e }.toMap
    assert(raw == Map("a" -> 15.0, "b" -> 100.0), s"$raw")

    // null targets drop from both n and the sums (category c vanishes)
    val withNull = Seq(("a", Some(10.0)), ("a", Some(20.0)),
      ("b", Some(100.0)), ("c", None)).toDF("cat", "y")
    val enc = Features.targetEncode(withNull, "cat", "y", alpha = 2.0)
      .as[(String, Long, Double)].collect().map(_._1).toSet
    assert(enc == Set("a", "b"), s"$enc")
    intercept[IllegalArgumentException](
      Features.targetEncode(df, "cat", "y", alpha = -1.0))
  }

  test("decayedSum: half-life weighting, snapshot anchor, per-key sums") {
    val hl = 3600L * 1000000L // 1 h half-life
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 11:00:00") // age 1 hl
    val t2 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00") // age 2 hl
    val e = Seq(("a", t0, 10.0), ("a", t1, 10.0), ("b", t2, 8.0))
      .toDF("k", "ts", "v")
    // anchor = max ts = t0: a -> 10·1 + 10·0.5 = 15; b -> 8·0.25 = 2
    val out = Features.decayedSum(e, "k", "ts", "v", hl)
      .as[(String, Double)].collect().toMap
    assert(out == Map("a" -> 15.0, "b" -> 2.0), s"$out")

    // explicit asOf one half-life later halves everything
    val asOf = t0.getTime * 1000L + hl
    val later = Features.decayedSum(e, "k", "ts", "v", hl, Some(asOf))
      .as[(String, Double)].collect().toMap
    assert(later == Map("a" -> 7.5, "b" -> 1.0), s"$later")
    intercept[IllegalArgumentException](
      Features.decayedSum(e, "k", "ts", "v", 0L))
  }

  test("winsorize: clips at exact quantiles, preserves rows and nulls") {
    // 1..10: p20 = 2.8, p80 = 8.2 (the (n-1)p interpolation convention)
    val df = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val out = Features.winsorize(df, "v", 0.2, 0.8)
      .select($"id", $"v_w").as[(Long, Double)].collect().toMap
    def ~=(a: Double, b: Double) = math.abs(a - b) < 1e-9
    assert(~=(out(1L), 2.8) && ~=(out(2L), 2.8) && out(3L) == 3.0, s"$out")
    assert(~=(out(9L), 8.2) && ~=(out(10L), 8.2) && out(8L) == 8.0)
    assert(out.size == 10, "every row survives")

    // nulls pass through as null, and do not perturb the quantiles
    val withNull = df.unionByName(
      Seq((99L, Option.empty[Double])).toDF("id", "v"))
    val rows = Features.winsorize(withNull, "v", 0.2, 0.8)
      .select($"id", $"v_w").collect()
    assert(rows.length == 11)
    assert(rows.find(_.getLong(0) == 99L).get.isNullAt(1))
    assert(math.abs(rows.find(_.getLong(0) == 1L).get.getDouble(1) - 2.8) < 1e-9)

    // approx path stays within tolerance on a smooth column
    val approx = Features.winsorize(df, "v", 0.2, 0.8, exact = false)
      .select($"id", $"v_w").as[(Long, Double)].collect().toMap
    assert(math.abs(approx(1L) - 2.8) <= 1.0, s"$approx")
    intercept[IllegalArgumentException](
      Features.winsorize(df, "v", 0.9, 0.1))
  }

  test("olsFit: recovers a known line exactly; degenerate groups go null") {
    // group a: y = 2x + 1 exactly -> slope 2, intercept 1, r2 1
    // group b: zero x-variance -> nulls
    // group c: y constant -> slope 0, r2 null (zero y-variance)
    val df = Seq(
      ("a", 1.0, 3.0), ("a", 2.0, 5.0), ("a", 3.0, 7.0), ("a", 4.0, 9.0),
      ("b", 5.0, 1.0), ("b", 5.0, 9.0),
      ("c", 1.0, 4.0), ("c", 2.0, 4.0))
      .toDF("g", "x", "y")
    val out = Features.olsFit(df, "g", "x", "y").orderBy("g").collect()
    val a = out(0)
    assert(a.getLong(1) == 4L && a.getDouble(2) == 2.0 &&
      a.getDouble(3) == 1.0 && a.getDouble(4) == 1.0, a.toString)
    val b = out(1)
    assert(b.isNullAt(2) && b.isNullAt(3) && b.isNullAt(4), b.toString)
    val c = out(2)
    assert(c.getDouble(2) == 0.0 && c.getDouble(3) == 4.0 && c.isNullAt(4),
      c.toString)
  }

  test("olsFit: noisy slope matches a hand-computed closed form") {
    val xs = (1 to 20).map(_.toDouble)
    val ys = xs.map(x => 3.5 * x + 2.0 + (if (x % 2 == 0) 0.25 else -0.25))
    val df = xs.zip(ys).map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val n = xs.size.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    val row = Features.olsFit(df, "g", "x", "y").collect().head
    assert(math.abs(row.getDouble(2) - slope) < 1e-3, row.toString)
    assert(math.abs(row.getDouble(3) - icept) < 1e-3, row.toString)
    assert(row.getDouble(4) > 0.99, "near-perfect fit")
  }

  test("quantileBin: equi-depth bins, boundary membership, nulls stay null") {
    // values 1..8, 4 bins -> boundaries at quantile_cont .25/.5/.75 =
    // 2.75, 4.5, 6.25; bin = 1 + #{b : v > b}
    val df = (1 to 8).map(i => Tuple1(i.toDouble)).toDF("v")
    val out = Features.quantileBin(df, "v", 4)
      .select($"v", $"v_bin").as[(Double, Int)].collect().toMap
    assert(out == Map(1.0 -> 1, 2.0 -> 1, 3.0 -> 2, 4.0 -> 2,
      5.0 -> 3, 6.0 -> 3, 7.0 -> 4, 8.0 -> 4), s"$out")

    // a value exactly on a boundary goes to the LOWER bin (v > b strict)
    val onB = Seq(Tuple1(Some(4.5)), Tuple1(None))
      .toDF("v")
    val withNull = Features.quantileBin(
      df.select($"v".cast("double").as("v")).union(onB.filter($"v".isNotNull))
        .union(onB.filter($"v".isNull)), "v", 4)
      .select($"v", $"v_bin").as[(Option[Double], Option[Int])].collect()
    assert(withNull.collect { case (None, b) => b }.head.isEmpty,
      "null value -> null bin")
    intercept[IllegalArgumentException](Features.quantileBin(df, "v", 1))
  }

  test("spearman: perfect monotone, reversed, ties hand-check, constant null") {
    // perfectly increasing -> 1.0; reversed -> -1.0
    val inc = (1 to 6).map(i => ("g", i.toDouble, i * 10.0)).toDF("g", "x", "y")
    assert(Features.spearman(inc, "g", "x", "y")
      .as[(String, Long, Double)].collect().head == (("g", 6L, 1.0)))
    val dec = (1 to 6).map(i => ("g", i.toDouble, -i * 2.0)).toDF("g", "x", "y")
    assert(Features.spearman(dec, "g", "x", "y")
      .as[(String, Long, Double)].collect().head == (("g", 6L, -1.0)))

    // ties: x = (1,2,2,3), y = (1,2,3,4); avg ranks rx = 1, 2.5, 2.5, 4
    // ry = 1..4 -> r = cov/sd = hand value
    val tied = Seq(("g", 1.0, 1.0), ("g", 2.0, 2.0), ("g", 2.0, 3.0),
      ("g", 3.0, 4.0)).toDF("g", "x", "y")
    val rx = Seq(1.0, 2.5, 2.5, 4.0); val ry = Seq(1.0, 2.0, 3.0, 4.0)
    val n = 4.0
    val sx = rx.sum; val sy = ry.sum
    val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
    val sxx = rx.map(a => a * a).sum; val syy = ry.map(b => b * b).sum
    val exp = BigDecimal((n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(Features.spearman(tied, "g", "x", "y")
      .as[(String, Long, Double)].collect().head == (("g", 4L, exp)))

    // constant x -> zero variance -> null; null rows excluded from n
    val const = Seq(("g", 1.0, 1.0), ("g", 1.0, 2.0)).toDF("g", "x", "y")
    val row = Features.spearman(const, "g", "x", "y").collect().head
    assert(row.isNullAt(2), row.toString)
    val withNull = Seq(("g", Some(1.0), Some(1.0)), ("g", Some(2.0), Some(3.0)),
      ("g", None, Some(9.0)), ("g", Some(3.0), Some(7.0)))
      .toDF("g", "x", "y")
    assert(Features.spearman(withNull, "g", "x", "y")
      .as[(String, Long, Double)].collect().head == (("g", 3L, 1.0)))
  }

  test("cohenKappa: textbook 2x2, disjoint labels, degenerate, nulls") {
    // (yes,yes),(yes,no),(no,no),(no,no): po = 3/4; margins A 2/2, B 1/3
    // -> pe = (2*1 + 2*3)/16 = 0.5 -> kappa = 0.5
    val df = Seq(("yes", "yes"), ("yes", "no"), ("no", "no"), ("no", "no"))
      .toDF("a", "b")
    val r = Features.cohenKappa(df, "a", "b")
      .as[(Long, Double, Double, Double)].collect().head
    assert(r == ((4L, 0.75, 0.5, 0.5)), s"$r")

    // disjoint label spaces: po = 0, pe = 0 -> kappa = 0
    val disj = Seq(("x", "y"), ("x", "y")).toDF("a", "b")
    val rd = Features.cohenKappa(disj, "a", "b")
      .as[(Long, Double, Double, Double)].collect().head
    assert(rd == ((2L, 0.0, 0.0, 0.0)), s"$rd")

    // both raters constant and equal: pe = 1 -> kappa null (not NaN)
    val const = Seq(("k", "k"), ("k", "k")).toDF("a", "b")
    val rc = Features.cohenKappa(const, "a", "b").collect().head
    assert(rc.getDouble(1) == 1.0 && rc.getDouble(2) == 1.0 && rc.isNullAt(3))

    // null on either side excluded from n
    val withNull = Seq((Some("y"), Some("y")), (None, Some("y")),
      (Some("y"), None), (Some("n"), Some("n"))).toDF("a", "b")
    assert(Features.cohenKappa(withNull, "a", "b")
      .select($"n").as[Long].collect().head == 2L)
  }

  test("mutualInfo: independence -> 0, perfect dependence -> ln 2 / NMI 1") {
    // all four combos equally often: MI = 0, NMI = 0
    val ind = Seq(("x", "1"), ("x", "2"), ("y", "1"), ("y", "2"))
      .toDF("a", "b")
    val ri = Features.mutualInfo(ind, "a", "b")
      .as[(Long, Double, Double, Double, Double)].collect().head
    assert(ri == ((4L, 0.0, 0.6931, 0.6931, 0.0)), s"$ri")

    // x<->1, y<->2 deterministically: MI = H = ln 2, NMI = 1
    val dep = Seq(("x", "1"), ("x", "1"), ("y", "2"), ("y", "2"))
      .toDF("a", "b")
    val rd = Features.mutualInfo(dep, "a", "b")
      .as[(Long, Double, Double, Double, Double)].collect().head
    assert(rd == ((4L, 0.6931, 0.6931, 0.6931, 1.0)), s"$rd")

    // single-valued column: H_a = 0 -> NMI null
    val degen = Seq(("k", "1"), ("k", "2")).toDF("a", "b")
    val rg = Features.mutualInfo(degen, "a", "b").collect().head
    assert(rg.getDouble(2) == 0.0 && rg.isNullAt(4), s"$rg")
  }

  test("chiSquare: hand-computed 2x2 contingency") {
    // a:(x,x,y,y) b:(x,y,y,y) -> N=8, rt=4 each, ct: x=3, y=5
    val df = (Seq.fill(2)(("a", "x")) ++ Seq.fill(2)(("a", "y")) ++
      Seq.fill(1)(("b", "x")) ++ Seq.fill(3)(("b", "y")))
      .toDF("g", "h")
    val out = Features.chiSquare(df, "g", "h").orderBy("g", "h")
      .as[(String, String, Long, Double, Double)].collect().toList
    // expected(a,x) = 4*3/8 = 1.5; contrib = (2-1.5)^2/1.5 = 0.1667
    assert(out == List(
      ("a", "x", 2L, 1.5, 0.1667), ("a", "y", 2L, 2.5, 0.1),
      ("b", "x", 1L, 1.5, 0.1667), ("b", "y", 3L, 2.5, 0.1)))
  }
}
