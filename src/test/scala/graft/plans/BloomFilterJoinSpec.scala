package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Runtime bloom-filter join pruning (SCALE.md): with
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`, a selective filter on
  * one side of a shuffle join injects a bloom-filter predicate into the
  * other side's scan. Size thresholds are lowered here so the optimizer
  * fires on test-scale data; production keeps the defaults (GraftSession).
  */
class BloomFilterJoinSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("selective dim filter injects a bloom filter into the fact scan") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val li = spark.read.parquet(sf("sf0.01") + "/lineitem.parquet")
      val ord = spark.read.parquet(sf("sf0.01") + "/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("bloom_filter_agg") || plan.contains("BloomFilterMightContain")
          || plan.toLowerCase.contains("mightcontain"),
        s"expected an injected runtime bloom filter in:\n$plan")
      // and the result is still correct (filter is a pure pruning aid)
      val n = joined.collect()
      assert(n.length == 1 && n(0).getString(0) == "1-URGENT")
    }
  }

  test("bloom filter stays off below the application-side threshold") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      // default 10 GB probe-side threshold: test-scale scans must NOT pay
      // the bloom build cost
      val li = spark.read.parquet(sf("sf0.01") + "/lineitem.parquet")
      val ord = spark.read.parquet(sf("sf0.01") + "/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val plan = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(!plan.toLowerCase.contains("mightcontain"),
        s"bloom filter should not fire under default thresholds at test scale:\n$plan")
    }
  }
}
