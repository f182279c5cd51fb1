package graft.operators

import java.sql.{Date, Timestamp}

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gapFillDaily: spine is per-key, gaps forward-fill, observed flags synthesized rows") {
    val df = Seq(
      // key 1: observed Jan 1 (two events summing 10.5) and Jan 4
      (1L, ts("2024-01-01 10:00:00"), 4.5),
      (1L, ts("2024-01-01 23:59:59"), 6.0),
      (1L, ts("2024-01-04 00:00:00"), 5.0),
      // key 2: a single observation -> a single spine row
      (2L, ts("2024-03-15 12:00:00"), 7.25))
      .toDF("user_id", "ts", "value")
    val out = TimeSeries.gapFillDaily(df, "user_id", "ts", "value")
      .orderBy("user_id", "day")
      .select($"user_id", $"day", $"filled".cast("double"), $"observed")
      .as[(Long, Date, Double, Int)].collect().toList
    assert(out == List(
      (1L, Date.valueOf("2024-01-01"), 10.5, 1),
      (1L, Date.valueOf("2024-01-02"), 10.5, 0), // gap: carries Jan 1
      (1L, Date.valueOf("2024-01-03"), 10.5, 0),
      (1L, Date.valueOf("2024-01-04"), 5.0, 1),
      (2L, Date.valueOf("2024-03-15"), 7.25, 1)))
    // key 2's spine does NOT extend to key 1's range — no global cross-join
    assert(out.count(_._1 == 2L) == 1)
  }

  test("gapFillDaily: filled never null (spine starts at first observation)") {
    val df = Seq((9L, ts("2024-06-02 00:00:00"), 1.0),
      (9L, ts("2024-06-05 00:00:00"), 2.0)).toDF("k", "ts", "v")
    val out = TimeSeries.gapFillDaily(df, "k", "ts", "v")
    assert(out.filter($"filled".isNull).count() == 0)
    assert(out.count() == 4) // Jun 2..5
  }

  test("madOutliers: hand-computed median/MAD and the k gate") {
    // values [1,2,3,4,100]: med=3, adev=[2,1,0,1,97], mad=1
    // k=3 -> outliers where adev > 3: just the 97
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 100.0),
      // group b: symmetric, no outliers
      ("b", 10.0), ("b", 20.0), ("b", 30.0))
      .toDF("g", "v")
    val out = TimeSeries.madOutliers(df, "g", "v", k = 3.0)
      .orderBy("g")
      .as[(String, Double, Double, Long, Long)].collect().toList
    assert(out == List(
      ("a", 3.0, 1.0, 5L, 1L),
      ("b", 20.0, 10.0, 3L, 0L)))
  }

  test("madOutliers: larger k admits more") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 100.0))
      .toDF("g", "v")
    val loose = TimeSeries.madOutliers(df, "g", "v", k = 100.0)
      .as[(String, Double, Double, Long, Long)].collect().head
    assert(loose._5 == 0L)
    intercept[IllegalArgumentException](
      TimeSeries.madOutliers(df, "g", "v", k = 0.0))
  }

  test("islands: runs detected, duplicates collapse, minLen filters, singletons count") {
    // keys: 1,2,3 | 7 | 10,11 (with a duplicate 2)
    val df = Seq(1L, 2L, 2L, 3L, 7L, 10L, 11L).toDF("k")
    val all = TimeSeries.islands(df, "k").orderBy("island_start")
      .as[(Long, Long, Long)].collect().toList
    assert(all == List((1L, 3L, 3L), (7L, 7L, 1L), (10L, 11L, 2L)))
    val big = TimeSeries.islands(df, "k", minLen = 2L).orderBy("island_start")
      .as[(Long, Long, Long)].collect().toList
    assert(big == List((1L, 3L, 3L), (10L, 11L, 2L)))
    intercept[IllegalArgumentException](TimeSeries.islands(df, "k", 0L))
  }

  test("ewma: hand-computed fold, single element = itself, order by ts then tie") {
    // values in time order: 10, 20, 30 with alpha 0.5:
    // e1=10, e2=0.5*20+0.5*10=15, e3=0.5*30+0.5*15=22.5
    val df = Seq(
      (1L, ts("2024-01-01 00:00:02"), 2L, 30.0),
      (1L, ts("2024-01-01 00:00:00"), 0L, 10.0),
      (1L, ts("2024-01-01 00:00:01"), 1L, 20.0),
      (2L, ts("2024-01-01 00:00:00"), 3L, 42.0))
      .toDF("u", "ts", "id", "v")
    val out = TimeSeries.ewma(df, "u", "ts", "id", "v", alpha = 0.5)
      .orderBy("u").as[(Long, Double)].collect().toList
    assert(out == List((1L, 22.5), (2L, 42.0)))

    // equal-ts rows order by the tie column
    val tie = Seq(
      (1L, ts("2024-01-01 00:00:00"), 2L, 100.0),
      (1L, ts("2024-01-01 00:00:00"), 1L, 0.0))
      .toDF("u", "ts", "id", "v")
    // order 0 then 100: 0.5*100 + 0.5*0 = 50
    assert(TimeSeries.ewma(tie, "u", "ts", "id", "v", 0.5)
      .as[(Long, Double)].collect().head == ((1L, 50.0)))
    intercept[IllegalArgumentException](
      TimeSeries.ewma(tie, "u", "ts", "id", "v", 0.0))
  }
}
