package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.FreqSketch

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // grp 0/1/2; item `i<j>` appears with frequency proportional to rank
  private def zipf(lo: Long, hi: Long) =
    spark.range(lo, hi).select(
      (col("id") % 3).cast("string").as("grp"),
      concat(lit("i"), floor(sqrt(col("id") % 400))).as("item"))

  private def top(store: String, k: Int) =
    HeavyHitters.topItems(spark, store, k)
      .select(col("grp"), col("rank"), col("item"), col("estimate"),
        col("lower_bound"), col("upper_bound"))
      .as[(String, Int, String, Long, Long, Long)].collect()

  test("exact regime: top-k == exact counts ranked (est desc, item asc); lb == ub == est") {
    val store = java.nio.file.Files.createTempDirectory("freq").toString + "/s"
    HeavyHitters.appendSketches(zipf(0, 3000), Seq("grp"), "item", store,
      batchId = 1L, maxMapSize = 128) // 20 distinct items << capacity
    HeavyHitters.appendSketches(zipf(3000, 6000), Seq("grp"), "item", store,
      batchId = 2L, maxMapSize = 128)
    val got = top(store, 5)
    assert(got.forall(r => r._4 == r._5 && r._5 == r._6),
      "no purge -> zero error -> bounds collapse onto the estimate")
    val want = zipf(0, 6000).groupBy("grp", "item").count()
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("grp")
          .orderBy(col("count").desc, col("item").asc)))
      .filter(col("rank") <= 5)
      .select(col("grp"), col("rank"), col("item"), col("count"))
      .as[(String, Int, String, Long)].collect().toSet
    assert(got.map(r => (r._1, r._2, r._3, r._4)).toSet == want)
  }

  test("purge regime: a dominant item survives with bounded error; merge respects bounds") {
    val store = java.nio.file.Files.createTempDirectory("freq").toString + "/s"
    // 500 distinct tail items vs one item holding ~50% of the stream,
    // squeezed through a map of 8 slots: purges happen constantly
    val skew = spark.range(0, 8000).select(
      lit("g").as("grp"),
      when(col("id") % 2 === 0, lit("HEAVY"))
        .otherwise(concat(lit("t"), col("id") % 500)).as("item"))
    HeavyHitters.appendSketches(skew.filter(col("id") < 4000), Seq("grp"),
      "item", store, batchId = 1L, maxMapSize = 8)
    HeavyHitters.appendSketches(skew.filter(col("id") >= 4000), Seq("grp"),
      "item", store, batchId = 2L, maxMapSize = 8)
    val got = top(store, 1)
    assert(got.length == 1 && got.head._3 == "HEAVY",
      s"the true heavy hitter must not be lost (no false negatives): $got")
    val (_, _, _, est, lb, ub) = got.head
    assert(lb <= 4000 && 4000 <= ub && est >= lb && est <= ub,
      s"true count 4000 must sit inside [$lb, $ub], est $est")
  }

  test("store contract: replay no-ops, orphans invisible, compaction identical, pins enforced") {
    val store = java.nio.file.Files.createTempDirectory("freq").toString + "/s"
    HeavyHitters.appendSketches(zipf(0, 1500), Seq("grp"), "item", store, batchId = 1L)
    HeavyHitters.appendSketches(zipf(1500, 3000), Seq("grp"), "item", store, batchId = 2L)
    val before = top(store, 3).toSeq
    HeavyHitters.appendSketches(zipf(0, 9000), Seq("grp"), "item", store, batchId = 1L)
    assert(top(store, 3).toSeq == before, "manifested batchId = replay no-op")
    HeavyHitters.freqSketches(zipf(0, 9000), Seq("grp"), "item")
      .withColumn("ab", lit(77L))
      .write.mode("append").partitionBy("ab").parquet(store + "/sketches")
    assert(top(store, 3).toSeq == before, "orphans must stay invisible")
    HeavyHitters.compactStore(spark, store)
    assert(top(store, 3).toSeq == before, "compaction must not move answers")
    assert(HeavyHitters.readMeta(spark, store).batches == Seq(-1L))
    intercept[IllegalArgumentException] {
      HeavyHitters.appendSketches(zipf(0, 10), Seq("grp"), "item", store,
        batchId = 9L, maxMapSize = 64)
    }
    intercept[IllegalArgumentException] {
      HeavyHitters.appendSketches(zipf(0, 10).withColumnRenamed("grp", "g2"),
        Seq("g2"), "item", store, batchId = 9L)
    }
    val absent = java.nio.file.Files.createTempDirectory("freq").toString + "/nope"
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.topItems(spark, absent, 3)
    }
    assert(e.getMessage.contains("no heavy-hitters store"))
  }

  test("null items are skipped; empty group reads as no rows") {
    val df = Seq(("a", Some("x")), ("a", None), ("b", None)).toDF("grp", "item")
    val sk = HeavyHitters.freqSketches(df, Seq("grp"), "item")
      .select(col("grp"), FreqSketch.topK(col("freq"), 3).as("t"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(sk("a").getSeq[org.apache.spark.sql.Row](1).map(_.getString(0)) == Seq("x"))
    assert(sk("b").isNullAt(1), "all-null group -> empty sketch -> null top-k")
  }
}
