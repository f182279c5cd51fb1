package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SplitsSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit hits requested weights within hash tolerance and is deterministic") {
    val ids = spark.range(0, 20000).toDF("id")
    val out = Splits.hashSplit(ids, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("train") / 20000.0 - 0.8) < 0.02, s"$counts")
    assert(math.abs(counts("val") / 20000.0 - 0.1) < 0.02, s"$counts")
    assert(math.abs(counts("test") / 20000.0 - 0.1) < 0.02, s"$counts")
    // membership depends on the id alone: re-run over reshuffled data agrees
    val rerun = Splits.hashSplit(ids.repartition(7), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .as[(Long, String)].collect().toMap
    val firstMap = out.as[(Long, String)].collect().toMap
    assert(rerun == firstMap)
  }

  test("four-way split chains every cut point") {
    val out = Splits.hashSplit(spark.range(0, 8000).toDF("id"), "id",
      Seq("a" -> 0.25, "b" -> 0.25, "c" -> 0.25, "d" -> 0.25))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(out.keySet == Set("a", "b", "c", "d"))
    out.values.foreach(v => assert(math.abs(v / 8000.0 - 0.25) < 0.03, s"$out"))
  }

  test("guards: bad weights fail fast") {
    val df = Seq(1L).toDF("id")
    intercept[IllegalArgumentException] {
      Splits.hashSplit(df, "id", Seq("a" -> 0.5))                    // one split
    }
    intercept[IllegalArgumentException] {
      Splits.hashSplit(df, "id", Seq("a" -> 0.5, "b" -> 0.4))        // sums to 0.9
    }
    intercept[IllegalArgumentException] {
      Splits.hashSplit(df, "id", Seq("a" -> 1.1, "b" -> -0.1))       // negative
    }
  }

  test("weightedKeep: weight 1 keeps all, 0 keeps none, fractions approximate, deterministic") {
    val df = spark.range(0, 4000).toDF("id")
      .withColumn("grp", concat(lit("g"), pmod(col("id"), lit(4))))
    val kept = Splits.weightedKeep(df, "id", "grp",
      Map("g0" -> 1.0, "g1" -> 0.5, "g2" -> 0.0), defaultWeight = 0.25)
    val byGrp = kept.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(byGrp("g0") == 1000, "weight 1.0 must keep every row")
    assert(!byGrp.contains("g2"), "weight 0.0 must keep nothing")
    assert(math.abs(byGrp("g1") / 1000.0 - 0.5) < 0.05, s"$byGrp")
    assert(math.abs(byGrp("g3") / 1000.0 - 0.25) < 0.05, s"default weight applies: $byGrp")
    // pure function of the id: a re-run keeps the identical set
    val again = Splits.weightedKeep(df, "id", "grp",
      Map("g0" -> 1.0, "g1" -> 0.5, "g2" -> 0.0), defaultWeight = 0.25)
    assert(kept.select("id").as[Long].collect().sorted.toSeq ==
      again.select("id").as[Long].collect().sorted.toSeq)
    // monotone in the weight: growing a group's share only ADDS rows
    // (no resampling churn when a mix is rebalanced)
    val low = Splits.weightedKeep(df, "id", "grp", Map("g1" -> 0.25), 0.0)
      .select("id").as[Long].collect().toSet
    val high = Splits.weightedKeep(df, "id", "grp", Map("g1" -> 0.5), 0.0)
      .select("id").as[Long].collect().toSet
    assert(low.subsetOf(high), "raising a weight must never drop a kept row")
    intercept[IllegalArgumentException] {
      Splits.weightedKeep(df, "id", "grp", Map("g0" -> 1.5))
    }
  }
}
