package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.SparkSpec

class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString + "/t"

  private def countShuffles(df: org.apache.spark.sql.DataFrame): Int = {
    // force AQE's final plan, then walk it (the initial plan hides
    // bucket-scan decisions behind AdaptiveSparkPlan)
    df.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: ShuffleExchangeExec => 1 + s.children.map(walk).sum
      case other => other.children.map(walk).sum +
        other.subqueries.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  test("writeBucketed: co-bucketed tables sort-merge-join with zero shuffles; results match a plain join") {
    val facts = (1L to 2000L).map(i => (i % 97, i, i * 2.0))
      .toDF("k", "id", "v")
    val dims = (0L until 97L).map(i => (i, s"name$i")).toDF("k", "name")
    // one task per bucket -> one file per bucket -> presorted buckets
    Sinks.writeBucketed(facts.repartition(8, col("k")),
      "bj_facts", tmp("bjf"), Seq("k"), 8, sortKeys = Seq("k"))
    Sinks.writeBucketed(dims.repartition(8, col("k")),
      "bj_dims", tmp("bjd"), Seq("k"), 8, sortKeys = Seq("k"))
    try {
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val bucketed = spark.table("bj_facts")
          .join(spark.table("bj_dims"), "k")
        assert(countShuffles(bucketed) == 0,
          "co-bucketed join must not exchange either side:\n" +
            bucketed.queryExecution.executedPlan.toString)
        // identical result to the shuffled join of the raw frames
        val expected = facts.join(dims, "k")
          .orderBy("id").collect().toSeq
        assert(bucketed.orderBy("id").collect().toSeq == expected)

        // groupBy on the bucket key aggregates shuffle-free too
        val agg = spark.table("bj_facts").groupBy("k").agg(sum("v"))
        assert(countShuffles(agg) == 0,
          agg.queryExecution.executedPlan.toString)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        prevThreshold)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bj_facts")
      spark.sql("DROP TABLE IF EXISTS bj_dims")
    }
    intercept[IllegalArgumentException](
      Sinks.writeBucketed(facts, "bj_bad", tmp("bjb"), Nil, 8))
  }
}
