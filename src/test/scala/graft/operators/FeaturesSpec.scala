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
}
