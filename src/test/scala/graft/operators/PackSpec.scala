package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackSpec extends SparkSpec {
  import spark.implicits._

  test("sequencePack places docs on a contiguous per-shard token stream") {
    // one shard so the layout is a single stream: offsets are exact
    // partial sums, capacity 10 chunks at token 10 and 20
    val docs = Seq((1L, 4L), (2L, 3L), (3L, 6L), (4L, 2L), (5L, 9L))
      .toDF("doc_id", "n_tok")
    val out = Pack.sequencePack(docs, "doc_id", "n_tok", capacity = 10, numShards = 1)
      .select("doc_id", "shard", "offset", "seq_id", "pos_in_seq")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 0L, 0L, 0L, 0L),   // tokens [0,4)
      (2L, 0L, 4L, 0L, 4L),   // [4,7)
      (3L, 0L, 7L, 0L, 7L),   // [7,13): starts in seq 0, straddles into 1
      (4L, 0L, 13L, 1L, 3L),  // [13,15)
      (5L, 0L, 15L, 1L, 5L))) // [15,24)
  }

  test("sharded packing: independent streams, deterministic assignment, invariants") {
    val docs = spark.range(1, 201).toDF("doc_id")
      .withColumn("n_tok", pmod(col("doc_id") * 37L, lit(50L)) + 1L)
    val packed = Pack.sequencePack(docs, "doc_id", "n_tok", capacity = 64, numShards = 4)
    val rows = packed.select("doc_id", "shard", "offset", "n_tok")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._2).distinct.sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    // per shard: offsets are the exact partial sums of n_tok in doc order
    rows.groupBy(_._2).foreach { case (_, members) =>
      val inOrder = members.sortBy(_._1)
      val expected = inOrder.map(_._4).scanLeft(0L)(_ + _).init
      assert(inOrder.map(_._3).toSeq == expected.toSeq,
        "offset must equal the sum of preceding docs' token counts")
    }
    // determinism: a re-run (different partitioning) places identically
    val rerun = Pack.sequencePack(docs.repartition(13), "doc_id", "n_tok",
      capacity = 64, numShards = 4)
      .select("doc_id", "shard", "offset").as[(Long, Long, Long)].collect().toSet
    assert(rerun == rows.map(r => (r._1, r._2, r._3)).toSet)
  }

  test("packStats rolls up window fill per packed sequence") {
    val docs = Seq((1L, 4L), (2L, 3L), (3L, 6L), (4L, 2L), (5L, 9L))
      .toDF("doc_id", "n_tok")
    val packed = Pack.sequencePack(docs, "doc_id", "n_tok", capacity = 10, numShards = 1)
    val stats = Pack.packStats(packed, "n_tok")
      .select("seq_id", "n_starting_docs", "start_tokens")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(stats == Seq((0L, 3L, 13L), (1L, 2L, 11L)))
  }

  test("guards: non-positive capacity or shards fail fast") {
    val docs = Seq((1L, 4L)).toDF("doc_id", "n_tok")
    intercept[IllegalArgumentException] {
      Pack.sequencePack(docs, "doc_id", "n_tok", capacity = 0, numShards = 1)
    }
    intercept[IllegalArgumentException] {
      Pack.sequencePack(docs, "doc_id", "n_tok", capacity = 10, numShards = 0)
    }
  }

  test("chunkTokens: overlapping windows cover every token; last chunk short") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7"),     // 7 tokens
      (2L, "a b"),                       // shorter than one window
      (3L, "   "),                       // whitespace-only: no chunks
      (4L, "x")).toDF("doc_id", "text")
    val out = Pack.chunkTokens(docs, "doc_id", "text", size = 4, stride = 2)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(out == Set(
      (1L, 0L, 4L, "t1 t2 t3 t4"),
      (1L, 1L, 4L, "t3 t4 t5 t6"),
      (1L, 2L, 3L, "t5 t6 t7"),
      (1L, 3L, 1L, "t7"),
      (2L, 0L, 2L, "a b"),
      (4L, 0L, 1L, "x")))
    // non-overlapping stride = size: exact partition of the stream
    val flat = Pack.chunkTokens(docs.filter($"doc_id" === 1), "doc_id", "text",
        size = 3, stride = 3)
      .as[(Long, Long, Long, String)].collect().sortBy(_._2).toSeq
    assert(flat == Seq((1L, 0L, 3L, "t1 t2 t3"), (1L, 1L, 3L, "t4 t5 t6"),
      (1L, 2L, 1L, "t7")))
    intercept[IllegalArgumentException] {
      Pack.chunkTokens(docs, "doc_id", "text", size = 4, stride = 5)
    }
  }

  test("binPackFFD ≡ an independent reference FFD per shard; bins " +
    "valid and dense; FFD half-full property; oversized/empty docs " +
    "fail fast; repartition-deterministic") {
    import org.apache.spark.sql.functions._
    def refFfd(items: Seq[(Long, Long)], capacity: Long)
        : Map[Long, (Long, Long)] = {
      val sorted = items.sortBy { case (id, t) => (-t, id) }
      val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
      sorted.map { case (id, t) =>
        var b = 0
        while (b < loads.length && loads(b) + t > capacity) b += 1
        if (b == loads.length) loads += 0L
        val pos = loads(b); loads(b) += t
        id -> (b.toLong, pos)
      }.toMap
    }
    val items = (0L until 200L).map(id =>
      (id, 1L + (id * 37 + 11) % 90))           // pseudo-random sizes
    val df = items.toDF("doc_id", "n_tokens")
    val out = Pack.binPackFFD(df, "doc_id", "n_tokens",
        capacity = 128, numShards = 4)
      .select(col("doc_id"), col("shard"), col("bin_id"), col("pos_in_bin"))
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == 200, "every doc placed exactly once")
    for (sh <- 0L until 4L) {
      val want = refFfd(items.filter(_._1 % 4 == sh), 128L)
      val got = out.filter(_._2 == sh)
        .map(r => r._1 -> (r._3, r._4)).toMap
      assert(got == want, s"shard $sh")
      // validity: per-bin loads <= capacity; dense ids; FFD property —
      // at most one bin at most half full
      val byBin = out.filter(_._2 == sh).groupBy(_._3)
      val sizes = items.toMap
      val loads = byBin.map { case (b, rs) => b -> rs.map(r => sizes(r._1)).sum }
      assert(loads.values.forall(_ <= 128L))
      assert(byBin.keySet == (0L until byBin.size).toSet, "dense bins")
      assert(loads.values.count(_ <= 64L) <= 1, s"FFD half-full: $loads")
    }
    // determinism under repartition
    val out2 = Pack.binPackFFD(df.repartition(7), "doc_id", "n_tokens",
        capacity = 128, numShards = 4)
      .select(col("doc_id"), col("shard"), col("bin_id"), col("pos_in_bin"))
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSet == out2.toSet)
    // oversized and empty docs fail fast with the remedy
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    val big = intercept[Exception] {
      Pack.binPackFFD(Seq((1L, 300L)).toDF("doc_id", "n_tokens"),
        "doc_id", "n_tokens", capacity = 128, numShards = 1).collect()
    }
    assert(messages(big).exists(_.contains("chunkTokens")), messages(big))
    intercept[Exception] {
      Pack.binPackFFD(Seq((1L, 0L)).toDF("doc_id", "n_tokens"),
        "doc_id", "n_tokens", capacity = 128, numShards = 1).collect()
    }
    intercept[IllegalArgumentException] {
      Pack.binPackFFD(df, "doc_id", "n_tokens", capacity = 0, numShards = 1)
    }
    // binStats roll-up agrees with hand accounting
    val stats = Pack.binStats(Pack.binPackFFD(df, "doc_id", "n_tokens",
        capacity = 128, numShards = 4), "n_tokens", 128)
      .select(col("shard"), col("bin_id"), col("used_tokens"))
      .as[(Long, Long, Long)].collect()
    val sizes = items.toMap
    for ((sh, b, used) <- stats) {
      val want = out.filter(r => r._2 == sh && r._3 == b)
        .map(r => sizes(r._1)).sum
      assert(used == want)
    }
  }
}
