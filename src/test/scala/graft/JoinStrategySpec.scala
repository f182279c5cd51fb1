package graft

import org.apache.spark.sql.functions._

/** Join-strategy surface (SURVEY §2.B): Catalyst picks by default; hints
  * override. Results must be identical under every strategy. */
class JoinStrategySpec extends SparkSpec {

  private lazy val cust = spark.read.parquet(sf("sf0.001") + "/customer.parquet")
  private lazy val ord = spark.read.parquet(sf("sf0.001") + "/orders.parquet")

  private def run(hint: Option[String]) = {
    val left = hint.fold(cust)(h => cust.hint(h))
    left.join(ord, col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .orderBy("c_mktsegment")
  }

  test("merge hint produces SortMergeJoin; shuffle_hash produces ShuffledHashJoin") {
    val merge = run(Some("merge"))
    merge.collect()
    assert(merge.queryExecution.executedPlan.toString.contains("SortMergeJoin"))

    val sh = run(Some("shuffle_hash"))
    sh.collect()
    assert(sh.queryExecution.executedPlan.toString.contains("ShuffledHashJoin"))
  }

  test("all join strategies agree on results") {
    val expected = run(None).collect().toSeq
    for (h <- Seq("merge", "shuffle_hash", "broadcast")) {
      assert(run(Some(h)).collect().toSeq == expected, s"strategy $h diverged")
    }
  }
}
