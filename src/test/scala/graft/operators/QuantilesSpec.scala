package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.KllSketch

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  // 3 groups × known value distributions
  private def rows(lo: Long, hi: Long) =
    spark.range(lo, hi).select(
      (col("id") % 3).cast("string").as("grp"),
      (col("id") % 5000).cast("double").as("v"))

  private def quants(store: String) =
    Quantiles.groupQuantiles(spark, store, Seq(0.5, 0.9))
      .select(col("grp"), col("n"), col("min_v"), col("max_v"),
        element_at(col("quantiles"), 1).as("p50"),
        element_at(col("quantiles"), 2).as("p90"))
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap

  test("exact mode (n <= k): quantiles are percentile_disc (ceil-rank order statistic)") {
    // 1..10 per group — INCLUSIVE rank: p50 -> item 5, p90 -> item 9
    val df = spark.range(0, 30).select(
      (col("id") % 3).cast("string").as("grp"),
      (floor(col("id") / 3) + 1).cast("double").as("v"))
    val store = java.nio.file.Files.createTempDirectory("kll").toString + "/s"
    Quantiles.appendSketches(df, Seq("grp"), "v", store, batchId = 1L)
    val q = quants(store)
    Seq("0", "1", "2").foreach { g =>
      val (_, n, mn, mx, p50, p90) = q(g)
      assert(n == 10L && mn == 1.0 && mx == 10.0)
      assert(p50 == 5.0, s"grp $g p50: got $p50")
      assert(p90 == 9.0, s"grp $g p90: got $p90")
    }
  }

  test("merged per-batch sketches answer like a single-pass sketch; n/min/max exact in estimation mode") {
    val store = java.nio.file.Files.createTempDirectory("kll").toString + "/s"
    Quantiles.appendSketches(rows(0, 4000), Seq("grp"), "v", store, batchId = 1L)
    Quantiles.appendSketches(rows(2000, 8000), Seq("grp"), "v", store, batchId = 2L)
    Quantiles.appendSketches(rows(6000, 12000), Seq("grp"), "v", store, batchId = 3L)
    val q = quants(store)
    val all = rows(0, 4000).union(rows(2000, 8000)).union(rows(6000, 12000))
    // exact facts ride the image whatever compaction did
    val truth = all.groupBy("grp")
      .agg(count(lit(1)).as("n"), min("v"), max("v"))
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    truth.foreach { case (g, (_, n, mn, mx)) =>
      assert(q(g)._2 == n && q(g)._3 == mn && q(g)._4 == mx,
        s"grp $g: exact n/min/max must survive compaction: ${q(g)} vs ($n, $mn, $mx)")
    }
    // estimation band: k = 200 -> normalized rank error ~1.65%; the
    // returned p50/p90 item's TRUE rank must sit within 3x of that
    val vals = all.as[(String, Double)].collect().groupBy(_._1)
      .map { case (g, a) => g -> a.map(_._2).sorted }
    def trueRank(g: String, item: Double): Double = {
      val a = vals(g); a.count(_ <= item).toDouble / a.length
    }
    Seq("0", "1", "2").foreach { g =>
      assert(math.abs(trueRank(g, q(g)._5) - 0.5) < 0.05,
        s"grp $g p50 rank off: ${trueRank(g, q(g)._5)}")
      assert(math.abs(trueRank(g, q(g)._6) - 0.9) < 0.05,
        s"grp $g p90 rank off: ${trueRank(g, q(g)._6)}")
    }
    // batch-merge ≡ single-pass (same images in, associative merge)
    val single = Quantiles.kllSketches(all, Seq("grp"), "v")
      .select(col("grp"),
        element_at(KllSketch.quantiles(col("kll"), Seq(0.5, 0.9)), 1).as("p50"))
      .as[(String, Double)].collect().toMap
    // NOTE: merge order can differ between the store path and the
    // single-pass path, and KLL compaction is order-sensitive, so only
    // the rank guarantee (asserted above) is contractual here; exact
    // equality holds in exact mode (first test).
    single.foreach { case (g, p50) =>
      assert(math.abs(trueRank(g, p50) - 0.5) < 0.05)
    }
  }

  test("replay no-ops; orphans invisible; k/keys pinned; compaction preserves answers") {
    // sizes kept INSIDE exact mode (total per group < k = 200): KLL
    // compaction of over-capacity sketches is randomized (unbiased coin
    // per compaction), so read-to-read equality is only contractual
    // while every sketch retains all items — which also makes this the
    // regime where the store's answers must be BIT-stable
    val store = java.nio.file.Files.createTempDirectory("kll").toString + "/s"
    Quantiles.appendSketches(rows(0, 150), Seq("grp"), "v", store, batchId = 1L)
    Quantiles.appendSketches(rows(150, 300), Seq("grp"), "v", store, batchId = 2L)
    val before = quants(store)
    // replay of a manifested id changes nothing (even with other data)
    Quantiles.appendSketches(rows(0, 12000), Seq("grp"), "v", store, batchId = 1L)
    assert(quants(store) == before)
    // a crashed append's orphan partition is invisible
    Quantiles.kllSketches(rows(0, 12000), Seq("grp"), "v")
      .withColumn("ab", lit(77L))
      .write.mode("append").partitionBy("ab").parquet(store + "/sketches")
    assert(quants(store) == before, "unmanifested sketches must not merge in")
    // compaction: one generation dir, identical answers, appendable after
    Quantiles.compactStore(spark, store)
    def abDirs = new java.io.File(store + "/sketches").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("ab="))
      .map(_.getName).sorted.toSeq
    assert(abDirs == Seq("ab=-1"), s"superseded dirs swept: $abDirs")
    assert(quants(store) == before,
      "exact-mode merge is lossless — compaction must not move any answer")
    Quantiles.appendSketches(rows(300, 450), Seq("grp"), "v", store, batchId = 3L)
    assert(quants(store)("0")._2 > before("0")._2)
    // pins
    intercept[IllegalArgumentException] {
      Quantiles.appendSketches(rows(0, 10), Seq("grp"), "v", store,
        batchId = 9L, k = 400)
    }
    intercept[IllegalArgumentException] {
      Quantiles.appendSketches(rows(0, 10).withColumnRenamed("grp", "g2"),
        Seq("g2"), "v", store, batchId = 9L)
    }
    val absent = java.nio.file.Files.createTempDirectory("kll").toString + "/nope"
    val e = intercept[IllegalArgumentException] {
      Quantiles.groupQuantiles(spark, absent, Seq(0.5))
    }
    assert(e.getMessage.contains("no quantile store"))
  }

  test("null values are skipped; empty group sketch reads as null stats") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", None)).toDF("grp", "v")
    val sk = Quantiles.kllSketches(df, Seq("grp"), "v")
      .select(col("grp"), KllSketch.stats(col("kll")).as("st"),
        KllSketch.quantiles(col("kll"), Seq(1.0)).as("q"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = sk("a").getStruct(1)
    assert(a.getLong(0) == 2L && a.getDouble(1) == 1.0 && a.getDouble(2) == 3.0)
    assert(sk("a").getSeq[Double](2) == Seq(3.0))
    assert(sk("b").isNullAt(1) && sk("b").isNullAt(2),
      "all-null group -> empty sketch -> null stats/quantiles")
  }
}
