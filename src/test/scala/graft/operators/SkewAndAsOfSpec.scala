package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewAndAsOfSpec extends SparkSpec {
  import spark.implicits._

  test("saltedInner equals plain inner join") {
    val large = (1 to 500).map(i => (i % 3, i)).toDF("k", "v") // key skew: 3 keys
    val small = Seq((0, "a"), (1, "b"), (2, "c"), (3, "unmatched")).toDF("k", "name")
    val expected = large.join(small, Seq("k"))
      .orderBy("k", "v").select("k", "v", "name").collect().toSeq
    val salted = SkewJoin.saltedInner(large, small, "k", saltSource = col("v"), buckets = 4)
      .orderBy("k", "v").select("k", "v", "name").collect().toSeq
    assert(salted == expected)
  }

  test("forward as-of finds the earliest right row at or after each left row") {
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")),
      (1L, 101L, ts("2024-01-01 23:00:00"))) // nothing after -> null
      .toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00")),  // before -> not eligible
      (1L, ts("2024-01-01 12:00:00")),
      (1L, ts("2024-01-01 15:00:00")))
      .toDF("user_id", "ship_ts")
    val out = AsOfJoin.forward(left, right, Seq("user_id"), "ts", "ship_ts",
      Seq("ship_ts"))
      .select("event_id", "ship_ts").as[(Long, Option[Timestamp])]
      .collect().toMap
    assert(out(100L).contains(ts("2024-01-01 12:00:00")))
    assert(out(101L).isEmpty)
  }
}
