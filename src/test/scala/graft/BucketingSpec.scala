package graft

import org.apache.spark.sql.functions._

/** Bucketed-table layout (SCALE.md): pre-bucketing both sides of a
  * repeated fact-fact join on the join key removes the shuffle — the
  * physical plan joins bucket-to-bucket with zero Exchange nodes. */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables has no shuffle exchange") {
    val o = spark.read.parquet(sf("sf0.001") + "/orders.parquet")
    val l = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("graft_orders_b")
    l.write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("graft_lineitem_b")

    val joined = spark.table("graft_lineitem_b")
      .join(spark.table("graft_orders_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not shuffle; the only exchange allowed is the
    // one feeding the final (post-join) aggregation
    val joinPart = plan.substring(plan.indexOf("Join"))
    assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinPart.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join must not shuffle its inputs:\n$plan")

    // and the result matches the plain join
    val plain = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus").collect().toSeq
    val bucketed = joined.orderBy("o_orderstatus").collect().toSeq
    assert(bucketed == plain)

    spark.sql("DROP TABLE IF EXISTS graft_orders_b")
    spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
  }
}
