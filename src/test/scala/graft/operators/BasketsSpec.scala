package graft.operators

import graft.SparkSpec

class BasketsSpec extends SparkSpec {
  import spark.implicits._

  test("cooccurrence: presence semantics, lift arithmetic, minCount prune") {
    // baskets: 1 = {x, y}, 2 = {x, y}, 3 = {x, z}, 4 = {y} — and basket
    // 1 repeats x twice (presence must count it once)
    val rows = Seq(
      (1L, "x"), (1L, "x"), (1L, "y"),
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z"),
      (4L, "y"))
      .toDF("basket", "item")
    val out = Baskets.cooccurrence(rows, "basket", "item")
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // N = 4 baskets; x in 3, y in 3, z in 1; xy together 2, xz 1
    assert(out(("x", "y")) == (("x", "y", 2L, 3L, 3L,
      BigDecimal(2.0 * 4 / 9).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)), s"$out")
    assert(out(("x", "z")) == (("x", "z", 1L, 3L, 1L,
      BigDecimal(1.0 * 4 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)))
    assert(out.size == 2, "yz never co-occur; same-item pairs excluded")

    // minCount prunes the singleton pair
    val pruned = Baskets.cooccurrence(rows, "basket", "item", minCount = 2)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(pruned.map(r => (r._1, r._2)).toSet == Set(("x", "y")))
    intercept[IllegalArgumentException](
      Baskets.cooccurrence(rows, "basket", "item", minCount = 0))
  }

  test("cooccurrence: mega-basket valve fails fast with the remedy; " +
    "capped runs unchanged below the cap") {
    val rows = Seq(
      (1L, "x"), (1L, "y"), (1L, "z"),
      (2L, "x"), (2L, "y"))
      .toDF("basket", "item")
    // cap 3 admits the 3-item basket — results identical to uncapped
    val capped = Baskets.cooccurrence(rows, "basket", "item",
      maxBasketSize = 3).collect().map(_.toSeq).toSet
    val plain = Baskets.cooccurrence(rows, "basket", "item")
      .collect().map(_.toSeq).toSet
    assert(capped == plain)
    // cap 2 trips on basket 1 inside the job, naming the remedy
    val e = intercept[Exception] {
      Baskets.cooccurrence(rows, "basket", "item", maxBasketSize = 2)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("mega-baskets")), messages(e))
    intercept[IllegalArgumentException](
      Baskets.cooccurrence(rows, "basket", "item", maxBasketSize = 1))
  }

test("associationRules: hand confidences both directions, " +
    "threshold gates, presence semantics, guards") {
    // b1{a,b} b2{a,b} b3{a} b4{a,c}: N=4, n_a=4, n_b=2, n_c=1,
    // n_ab=2, n_ac=1
    val rows = Seq((1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"),
      (4, "a"), (4, "c"), (4, "c")) // repeated (4, c) row: presence
      .toDF("basket", "item")
    val all = Baskets.associationRules(rows, "basket", "item")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))).toMap
    assert(all.size == 4)
    assert(all(("a", "b")) == ((2L, 4L, 0.5, 0.5, 1.0)))
    assert(all(("b", "a")) == ((2L, 2L, 0.5, 1.0, 1.0)))
    assert(all(("a", "c")) == ((1L, 4L, 0.25, 0.25, 1.0)))
    assert(all(("c", "a")) == ((1L, 1L, 0.25, 1.0, 1.0)))
    // confidence gate keeps only the two certain directions
    val conf = Baskets.associationRules(rows, "basket", "item",
        minConfidence = 0.6)
      .select("antecedent", "consequent").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(conf == Set(("b", "a"), ("c", "a")))
    // support gate drops the singleton pair
    val sup = Baskets.associationRules(rows, "basket", "item",
        minSupport = 0.5)
      .select("antecedent", "consequent").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(sup == Set(("a", "b"), ("b", "a")))
    intercept[IllegalArgumentException](
      Baskets.associationRules(rows, "basket", "item", minSupport = 1.5))
    intercept[IllegalArgumentException](
      Baskets.associationRules(rows, "basket", "item",
        minConfidence = -0.1))
  }
}
