package graft.pipelines

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ~30-token base text so near-dup shingle overlap is well away from
  // the 0.8 threshold boundary
  private val base = (1 to 30).map(i => s"tok$i").mkString(" ")

  private def corpus = Seq(
    // survives everything
    (1L, s"<p>$base</p>", "web"),
    // exact dup of 1 AFTER stripping (different markup, same clean text)
    (2L, s"<div class='x'>$base</div>&nbsp;", "web"),
    // near dup of 1: two appended tokens (shingle jaccard ≈ 0.93)
    (3L, s"<p>$base zz zz</p>", "web"),
    // distinct survivor
    (4L, "<p>" + (1 to 30).map(i => s"other$i").mkString(" ") + "</p>", "web"),
    // too short (length gate)
    (5L, "<p>tiny doc here</p>", "web"),
    // repetitive (dup-bigram fraction ≈ 0.95 > 0.2)
    (6L, "<p>" + Seq.fill(20)("spam").mkString(" ") + "</p>", "web"),
    // second group, both survive
    (7L, "<p>" + (1 to 25).map(i => s"book$i").mkString(" ") + "</p>", "books"),
    (8L, "<p>" + (1 to 25).map(i => s"novel$i").mkString(" ") + "</p>", "books")
  ).toDF("doc_id", "text", "source")

  // alpha = 1 → keep-rate 1 for every group: mixing is deterministic
  // pass-through, so gate/dedup effects are exactly assertable
  private val cfg = Curation.Config(minTokens = 10, mixAlpha = 1.0)

  test("curate composes as ONE lazy plan: construction triggers zero Spark jobs") {
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val plan = Curation.curate(corpus, "doc_id", "text", "source",
        cfg.copy(chunkSize = 16, chunkStride = 12))
      plan.queryExecution.logical // force analysis — still no execution
      Thread.sleep(1000)         // let any stray job events drain
      assert(jobs == 0,
        s"plan construction must not run jobs (TsePipelines discipline), ran $jobs")
      assert(plan.columns.toSeq ==
        Seq("doc_id", "chunk_id", "n_tokens", "chunk_text"))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("gates, exact dedup, greedy near-dup and mixing compose end-to-end") {
    val out = Curation.curate(corpus, "doc_id", "text", "source", cfg)
      .select($"doc_id", $"source", $"n_tokens")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 4L, 7L, 8L),
      "2 exact-dropped, 3 near-dropped (greedy: larger id), 5 length-gated, " +
        s"6 repetition-gated: $out")
    val bySrc = out.map(r => r._1 -> r._2).toMap
    assert(bySrc(1L) == "web" && bySrc(7L) == "books")
    assert(out.find(_._1 == 1L).get._3 == 30L, "n_tokens of the cleaned text")
  }

  test("nearDup = false keeps the hash-seeded stage out (the oracled q130 shape)") {
    val out = Curation.curate(corpus, "doc_id", "text", "source",
      cfg.copy(nearDup = false))
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 3L, 4L, 7L, 8L),
      "near-dup doc 3 survives; exact dup 2 and gated 5/6 still drop")
  }

  test("chunked output reassembles the curated text; stride overlap is honored") {
    val chunks = Curation.curate(corpus, "doc_id", "text", "source",
      cfg.copy(chunkSize = 16, chunkStride = 16))
      .filter($"doc_id" === 1L).orderBy($"chunk_id")
      .select($"n_tokens", $"chunk_text").as[(Long, String)].collect()
    assert(chunks.map(_._1).toSeq == Seq(16L, 14L), "30 tokens → 16 + 14")
    assert(chunks.map(_._2).mkString(" ") == base,
      "non-overlapping chunks reassemble the stripped text exactly")
    val overlapped = Curation.curate(corpus, "doc_id", "text", "source",
      cfg.copy(chunkSize = 16, chunkStride = 12))
      .filter($"doc_id" === 1L).count()
    assert(overlapped == 3, "stride 12 over 30 tokens → starts 0, 12, 24")
  }

  test("optional boilerplate + substring-excision stages ≡ manual composition") {
    import graft.operators.{Dedup, Quality}
    import graft.functions.{TextFunctions => TF}
    // 12 docs sharing a cookie-banner line (boilerplate) and, in 3 of
    // them, a 10-token run duplicated across docs (substring dup)
    val banner = "accept all cookies to continue"
    val run = (1 to 10).map(i => s"dup$i").mkString(" ")
    val docs = (1L to 12L).map { i =>
      val body = (1 to 25).map(j => s"t${i}_$j").mkString(" ")
      val text =
        if (i <= 3) s"$banner\n$body $run"
        else s"$banner\n$body"
      (i, text, "web")
    }.toDF("doc_id", "text", "source")
    val cfg2 = cfg.copy(nearDup = false, maxDupBigramFrac = 1.0,
      boilerplateMinCount = 3, dupSpanK = 6)
    val out = Curation.curate(docs, "doc_id", "text", "source", cfg2)
      .select($"doc_id", $"n_tokens").as[(Long, Long)].collect().toMap

    // manual composition, stage by stage (boilerplate BEFORE strip —
    // stripMarkup would collapse the '\n' delimiter)
    val noBoiler = Quality.removeBoilerplateLines(
        docs, "doc_id", "text", 3, "\n")
      .select($"doc_id", $"clean_text".as("raw"))
      .join(docs.select($"doc_id", $"source"), Seq("doc_id"))
    val clean = noBoiler.select($"doc_id", $"source",
      TF.stripMarkup($"raw").as("clean_text"))
    val spans = Dedup.duplicateSpans(clean, "doc_id", "clean_text", k = 6)
    val excised = Dedup.exciseSpans(clean, "doc_id", "clean_text", spans)
    val expected = excised
      .filter(TF.tokenCount($"clean_text") >= 10)
      .select($"doc_id", TF.tokenCount($"clean_text").cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(out == expected, s"curate ≡ manual: $out vs $expected")
    // the banner (5 boilerplate tokens) and the run (10 dup tokens) are
    // both gone from doc 1: 25 body tokens remain
    assert(out(1L) == 25L && out(12L) == 25L && out.size == 12)
  }

  test("mixing runs on the POST-dedup distribution (alpha 0.5 changes rates)") {
    // group sizes after dedup: web 2, books 2 → rates sqrt(2/2) = 1 for
    // both; planting 2 extra surviving web docs makes web 4 vs books 2 →
    // web rate sqrt(2/4) ≈ 0.707, so the md5-bucket filter can now drop
    // web docs but never books docs
    val extra = Seq(
      (9L, "<p>" + (1 to 25).map(i => s"extra$i").mkString(" ") + "</p>", "web"),
      (10L, "<p>" + (1 to 25).map(i => s"more$i").mkString(" ") + "</p>", "web")
    ).toDF("doc_id", "text", "source")
    val out = Curation.curate(corpus.unionByName(extra), "doc_id", "text",
      "source", cfg.copy(mixAlpha = 0.5))
      .select($"doc_id", $"source").as[(Long, String)].collect()
    val books = out.filter(_._2 == "books").map(_._1).sorted.toSeq
    assert(books == Seq(7L, 8L), "the smallest group always keeps rate 1")
    assert(out.count(_._2 == "web") <= 4, "the larger group downsamples")
  }
}
