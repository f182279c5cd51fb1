package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ThetaSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime: union / intersect / difference estimates equal exact set counts") {
    // A = {0..999}, B = {500..1499}: |A|=|B|=1000, |A∩B|=500, |A\B|=500
    val df = spark.range(0, 1000).select(lit("a").as("g"), col("id"))
      .union(spark.range(500, 1500).select(lit("b").as("g"), col("id")))
      .union(spark.range(0, 1000).select(lit("a").as("g"), col("id"))) // dups collapse
    val sk = df.groupBy("g").agg(ThetaSketch.sketch(col("id")).as("sk"))
    val a = sk.filter(col("g") === "a").select(col("sk").as("ska"))
    val b = sk.filter(col("g") === "b").select(col("sk").as("skb"))
    val r = a.crossJoin(b).select(
      round(ThetaSketch.estimate(col("ska"))).cast("long"),
      round(ThetaSketch.estimate(col("skb"))).cast("long"),
      round(ThetaSketch.estimate(ThetaSketch.intersect(col("ska"), col("skb")))).cast("long"),
      round(ThetaSketch.estimate(ThetaSketch.difference(col("ska"), col("skb")))).cast("long"),
      round(ThetaSketch.estimate(ThetaSketch.difference(col("skb"), col("ska")))).cast("long"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(r == ((1000L, 1000L, 500L, 500L, 500L)), s"$r")
  }

  test("string items and partition-order independence; persisted images merge") {
    val df = spark.range(0, 2000).repartition(7)
      .select((col("id") % 3).cast("string").as("g"),
        concat(lit("u"), col("id") % 800).as("item"))
    val direct = df.groupBy("g").agg(
        round(ThetaSketch.estimate(ThetaSketch.sketch(col("item")))).cast("long").as("n"))
      .as[(String, Long)].collect().toMap
    val truth = df.select("g", "item").distinct().groupBy("g").count()
      .as[(String, Long)].collect().toMap
    assert(direct == truth, s"exact regime: $direct vs $truth")
    // two half-sketches union to the same exact estimate
    val parts = df.withColumn("half", col("item").substr(2, 10).cast("long") % 2)
    val halves = parts.groupBy("g", "half")
      .agg(ThetaSketch.sketch(col("item")).as("sk"))
    val merged = halves.groupBy("g")
      .agg(round(ThetaSketch.estimate(ThetaSketch.merge(col("sk")))).cast("long").as("n"))
      .as[(String, Long)].collect().toMap
    assert(merged == truth, s"union of partial images stays exact: $merged")
  }

  test("estimation band: 200k distinct ids at lgK=12 within 5%") {
    val est = spark.range(0, 200000)
      .agg(ThetaSketch.estimate(ThetaSketch.sketch(col("id"))).as("e"))
      .as[Double].head()
    assert(math.abs(est - 200000.0) / 200000.0 < 0.05,
      s"estimate $est vs 200000")
  }

  test("nulls are skipped; empty input estimates 0") {
    val df = Seq(Some("x"), None, Some("y"), Some("x")).toDF("v")
    val e = df.agg(round(ThetaSketch.estimate(ThetaSketch.sketch(col("v"))))
      .cast("long").as("e")).as[Long].head()
    assert(e == 2L)
    val empty = df.filter(col("v").isNull)
      .agg(ThetaSketch.estimate(ThetaSketch.sketch(col("v"))).as("e"))
      .as[Double].head()
    assert(empty == 0.0)
  }
}
