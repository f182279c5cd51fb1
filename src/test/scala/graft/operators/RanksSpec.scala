package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RanksSpec extends SparkSpec {
  import spark.implicits._

  test("globalRowNumber ≡ single-window row_number across bucket counts") {
    // shuffled, gappy, negative keys
    val keys = (0 until 500).map(i => ((i * 7919) % 1000) - 300L).distinct
    val df = scala.util.Random.shuffle(keys).toDF("k")
    val expected = keys.sorted.zipWithIndex
      .map { case (k, i) => (k, i + 1L) }.toSet
    for (b <- Seq(1, 4, 64)) {
      val got = Ranks.globalRowNumber(df, "k", "r", buckets = b)
        .as[(Long, Long)].collect().toSet
      assert(got == expected, s"buckets=$b")
    }
  }

  test("globalSuffixMin ≡ single-window suffix min across bucket counts") {
    // ranks 1..400 with a non-monotone value walk (BH's __cand shape)
    val rows = (1 to 400).map(r => (r.toLong, ((r * 31) % 97).toDouble))
    val df = scala.util.Random.shuffle(rows).toDF("rank", "v")
    val expected = rows.map { case (r, _) =>
      (r, rows.filter(_._1 >= r).map(_._2).min)
    }.toSet
    for (b <- Seq(1, 4, 64)) {
      val got = Ranks.globalSuffixMin(df, "rank", "v", "sm", buckets = b)
        .select("rank", "sm").as[(Long, Double)].collect().toSet
      assert(got == expected, s"buckets=$b")
    }
  }

  test("groupedCumSum ≡ per-group running sum, incl. one-giant-group") {
    val rows = (0 until 400).map { i =>
      (if (i % 5 == 0) "big" else s"g${i % 3}", (i * 31) % 997, i.toLong)
    }
    val df = scala.util.Random.shuffle(rows).toDF("g", "o", "v")
    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      val sorted = rs.sortBy(_._2)
      sorted.zip(sorted.scanLeft(0L)(_ + _._3).tail)
        .map { case ((_, o, v), c) => (g, o, v, c) }
    }.toSet
    for (b <- Seq(1, 3, 64)) {
      val got = Ranks.groupedCumSum(df, Seq("g"), "o", Seq("v"), buckets = b)
        .select(col("g"), col("o"), col("v"), col("cum_v").cast("long"))
        .as[(String, Int, Long, Long)].collect().toSet
      assert(got == expected, s"buckets=$b")
    }
  }

  test("groupedCumSum: multiple value columns in one pass") {
    val df = Seq(("a", 1, 10L, 1.0), ("a", 2, 20L, 2.0), ("a", 3, 30L, 4.0),
        ("b", 1, 5L, 0.5))
      .toDF("g", "o", "v1", "v2")
    val got = Ranks.groupedCumSum(df, Seq("g"), "o", Seq("v1", "v2"))
      .select(col("g"), col("o"), col("cum_v1").cast("long"),
        col("cum_v2").cast("double"))
      .as[(String, Int, Long, Double)].collect().toSet
    assert(got == Set(("a", 1, 10L, 1.0), ("a", 2, 30L, 3.0),
      ("a", 3, 60L, 7.0), ("b", 1, 5L, 0.5)))
  }

  test("globalNtile ≡ single-window ntile across bucket counts, tile " +
    "sizes, and the n < tiles edge") {
    import org.apache.spark.sql.expressions.Window
    val keys = (0 until 501).map(i => ((i * 7919) % 2000) - 700L).distinct
    val df = scala.util.Random.shuffle(keys).toDF("k")
    for (tiles <- Seq(1, 4, 7); b <- Seq(1, 4, 64)) {
      val got = Ranks.globalNtile(df, "k", tiles, "t", buckets = b)
        .as[(Long, Long)].collect().toSet
      val expected = df
        .withColumn("t", ntile(tiles).over(Window.orderBy(col("k")))
          .cast("long"))
        .as[(Long, Long)].collect().toSet
      assert(got == expected, s"tiles=$tiles buckets=$b")
    }
    // n < tiles: every row its own tile 1..n, trailing tiles empty
    val tiny = Seq(30L, 10L, 20L).toDF("k")
    val gotTiny = Ranks.globalNtile(tiny, "k", 7, "t")
      .as[(Long, Long)].collect().toSet
    assert(gotTiny == Set((10L, 1L), (20L, 2L), (30L, 3L)))
    intercept[IllegalArgumentException](Ranks.globalNtile(tiny, "k", 0, "t"))
  }

  test("globalRankStats ≡ single-window percent_rank/cume_dist with " +
    "heavy ties; nulls keep null stats; n = 1 edge") {
    import org.apache.spark.sql.expressions.Window
    // 400 rows over 13 levels: every level heavily tied
    val rows = (0 until 400).map(i => ((i * 31) % 13).toLong)
    val df = scala.util.Random.shuffle(rows).toDF("v")
    for (b <- Seq(1, 4, 64)) {
      val got = Ranks.globalRankStats(df, "v", buckets = b)
        .as[(Long, Double, Double)].collect().toSet
      val expected = df.select(col("v"),
          percent_rank().over(Window.orderBy(col("v"))),
          cume_dist().over(Window.orderBy(col("v"))))
        .as[(Long, Double, Double)].collect().toSet
      assert(got == expected, s"buckets=$b")
    }
    val withNull = Seq(Some(1L), Some(1L), Some(2L), None).toDF("v")
    val gn = Ranks.globalRankStats(withNull, "v").collect()
    assert(gn.filter(_.isNullAt(0)).forall(r =>
      r.isNullAt(1) && r.isNullAt(2)), "null value keeps null stats")
    val one = Seq(7L).toDF("v")
    assert(Ranks.globalRankStats(one, "v")
      .as[(Long, Double, Double)].collect().toSet == Set((7L, 0.0, 1.0)))
  }

  test("groupedRankStats / groupedNtile ≡ keyed windows, incl. " +
    "one-giant-group") {
    import org.apache.spark.sql.expressions.Window
    // group 'big' holds 80% of rows; values heavily tied
    val rows = (0 until 500).map { i =>
      (if (i % 5 == 0) s"g${i % 3}" else "big", ((i * 31) % 11).toLong,
        i.toLong)
    }
    val df = scala.util.Random.shuffle(rows).toDF("g", "v", "k")
    val wv = Window.partitionBy(col("g")).orderBy(col("v"))
    for (b <- Seq(1, 4, 64)) {
      val gotStats = Ranks.groupedRankStats(df, Seq("g"), "v", buckets = b)
        .select("g", "v", "percent_rank", "cume_dist")
        .as[(String, Long, Double, Double)].collect().toSet
      val expStats = df.select(col("g"), col("v"),
          percent_rank().over(wv), cume_dist().over(wv))
        .as[(String, Long, Double, Double)].collect().toSet
      assert(gotStats == expStats, s"rank stats buckets=$b")
      val wk = Window.partitionBy(col("g")).orderBy(col("k"))
      val gotTile = Ranks.groupedNtile(df, Seq("g"), "k", 4, "t",
          buckets = b)
        .select("g", "k", "t").as[(String, Long, Long)].collect().toSet
      val expTile = df.select(col("g"), col("k"),
          ntile(4).over(wk).cast("long"))
        .as[(String, Long, Long)].collect().toSet
      assert(gotTile == expTile, s"ntile buckets=$b")
    }
    intercept[IllegalArgumentException](
      Ranks.groupedRankStats(df, Seq.empty, "v"))
    intercept[IllegalArgumentException](
      Ranks.groupedNtile(df, Seq("g"), "k", 0, "t"))
  }

  test("grouped forms treat a NULL group key as its own partition " +
    "(ANSI) — null-safe joins, no dropped/null-stats rows") {
    import org.apache.spark.sql.expressions.Window
    // a third of the corpus carries a null group key
    val rows = (0 until 300).map { i =>
      (if (i % 3 == 0) None else Some(s"g${i % 4}"),
        ((i * 31) % 7).toLong, i.toLong)
    }
    val df = scala.util.Random.shuffle(rows).toDF("g", "v", "k")
    val wv = Window.partitionBy(col("g")).orderBy(col("v"))
    val gotStats = Ranks.groupedRankStats(df, Seq("g"), "v", buckets = 4)
      .select("g", "v", "percent_rank", "cume_dist")
      .as[(Option[String], Long, Double, Double)].collect().toSet
    val expStats = df.select(col("g"), col("v"),
        percent_rank().over(wv), cume_dist().over(wv))
      .as[(Option[String], Long, Double, Double)].collect().toSet
    assert(gotStats == expStats, "null group gets real rank stats")
    val raw = Ranks.groupedRankStats(df, Seq("g"), "v", buckets = 4)
    assert(raw.count() == 300 && raw.filter(col("g").isNull).count() == 100,
      "no null-group row dropped")
    val wk = Window.partitionBy(col("g")).orderBy(col("k"))
    val gotTile = Ranks.groupedNtile(df, Seq("g"), "k", 4, "t", buckets = 4)
      .select("g", "k", "t")
      .as[(Option[String], Long, Long)].collect().toSet
    val expTile = df.select(col("g"), col("k"),
        ntile(4).over(wk).cast("long"))
      .as[(Option[String], Long, Long)].collect().toSet
    assert(gotTile == expTile, "null group gets real ntile")
  }
}
