package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining — which items appear together in
  * the same basket (order, session, document) more often than chance:
  * the association signal behind related-item recommendation,
  * co-purchase analysis, and token co-occurrence features.
  */
object Baskets {

  /** Item-pair co-occurrence with lift: for every unordered item pair
    * appearing in >= `minCount` common baskets, the pair count, each
    * item's basket count, and `lift = P(a,b) / (P(a)·P(b)) =
    * n_ab·N / (n_a·n_b)` — lift > 1 is positive association, < 1
    * avoidance. PRESENCE semantics: an item counts once per basket
    * however many rows repeat it. Output: (item_a, item_b, n_ab, n_a,
    * n_b, lift), item_a < item_b.
    *
    * Scale shape: one (basket, item) distinct, then the pair explosion
    * via a basket-keyed self-join — work is Σ s_b² over basket sizes,
    * the inherent pair count, NEVER an item-item cross product; item
    * totals are an items-sized broadcast, the basket total one
    * broadcast row. A pathological mega-basket (one basket holding half
    * the catalog) makes s² explode — `maxBasketSize` is the valve (the
    * [[SetSimJoin]] maxBlockSize discipline): baskets past the cap
    * FAIL FAST with the remedy (split or drop them upstream) instead of
    * detonating one task with catalog²/4 pairs. Ordinary baskets
    * (orders, sessions) are bounded by construction; the default cap
    * (100k → ≤ 5·10⁹ pairs from one basket) only trips on degenerate
    * keys. `minCount` prunes AFTER exact counting (it is an output
    * filter, not an apriori bound). */
  def cooccurrence(df: DataFrame, basketCol: String, itemCol: String,
                   minCount: Long = 1L,
                   maxBasketSize: Int = 100000): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(maxBasketSize >= 2,
      s"maxBasketSize must be >= 2, got $maxBasketSize")
    val items = df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
      .withColumn("__bs", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("__b"))))
      // assert_true inside the Filter is load-bearing — a pruned
      // projection column would be optimized away and never fire
      .filter(assert_true(col("__bs") <= maxBasketSize,
        concat(lit("cooccurrence: basket "), col("__b").cast("string"),
          lit(s" holds more than $maxBasketSize distinct items — its" +
            " pair explosion is quadratic; split or drop mega-baskets" +
            " upstream, or raise maxBasketSize"))).isNull)
      .drop("__bs")
    val nBaskets = items.select(col("__b")).distinct()
      .agg(count(lit(1)).as("__nb"))
    val itemCounts = items.groupBy(col("__i")).agg(count(lit(1)).as("__n"))
    val pairs = items.select(col("__b"), col("__i").as("__ia"))
      .join(items.select(col("__b"), col("__i").as("__ib")), "__b")
      .filter(col("__ia") < col("__ib"))
      .groupBy(col("__ia").as("item_a"), col("__ib").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    pairs
      .join(broadcast(itemCounts.select(col("__i").as("item_a"),
        col("__n").as("n_a"))), "item_a")
      .join(broadcast(itemCounts.select(col("__i").as("item_b"),
        col("__n").as("n_b"))), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
        col("n_b"),
        // n_a·n_b stays in doubles: a raw long product overflows past
        // ~3·10⁹ baskets per item (the rocAuc/kendall multiply-before-
        // cast hazard, r10 audit); exact for counts < 2^53, and lift
        // renders rounded-6 anyway
        round(col("n_ab").cast("double") * col("__nb") /
          (col("n_a").cast("double") * col("n_b")), 6).as("lift"))
  }
}
