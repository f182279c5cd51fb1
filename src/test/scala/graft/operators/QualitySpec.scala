package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("observeNulls collects row count + per-column null counts during the one action") {
    val df = Seq(
      (Some(1L), Some("a")), (None, Some("b")), (Some(3L), None), (None, None))
      .toDF("id", "text")
    val (observed, obs) = Quality.observeNulls(df, Seq("id", "text"))
    // the frame itself is unchanged; the metrics ride the action
    assert(observed.count() == 4)
    val m = obs.get
    assert(m("n_rows") == 4L)
    assert(m("null_id") == 2L)
    assert(m("null_text") == 2L)
  }

  test("observed: custom metrics (range violations) on a write-shaped action") {
    val out = java.nio.file.Files.createTempDirectory("quality").toString + "/t"
    val df = Seq((1L, 5.0), (2L, -1.0), (3L, 120.0)).toDF("k", "score")
    val (observed, obs) = Quality.observed(df, "range_check",
      count(lit(1)).as("n"),
      sum(when(col("score") < 0 || col("score") > 100, 1L).otherwise(0L))
        .as("out_of_range"))
    observed.write.parquet(out) // the single pass: write + metrics together
    assert(obs.get("out_of_range") == 2L && obs.get("n") == 3L)
    assert(spark.read.parquet(out).count() == 3, "data landed unchanged")
  }

  test("lengthHistogram: fixed-width bins per group; empty docs land in bin 0") {
    val docs = Seq(
      ("web", "a b c"), ("web", "a b c d e"), ("web", "a"),
      ("book", (1 to 12).map(i => s"t$i").mkString(" ")),
      ("web", "")).toDF("source", "text")
    val out = Quality.lengthHistogram(docs, "text", Seq("source"), binWidth = 4)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("web", 0L, 0L, 3L),   // lengths 3, 1, 0
      ("web", 1L, 4L, 1L),   // length 5
      ("book", 3L, 12L, 1L)) // length 12 → bin [12, 16)
    )
    intercept[IllegalArgumentException] {
      Quality.lengthHistogram(docs, "text", Seq("source"), binWidth = 0)
    }
  }

  test("repetitionSignals matches an independent reference; repetitive docs score high") {
    val docs = Seq(
      (1L, "buy now buy now buy now buy now"),        // heavy loop
      (2L, "the quick brown fox jumps over the dog"), // all bigrams distinct
      (3L, "a a a a a a"),                            // one repeated bigram
      (4L, "x"),                                      // shorter than n: no row
      (5L, "p q p q r")).toDF("doc_id", "text")
    val out = Quality.repetitionSignals(docs, "doc_id", "text", n = 2)
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

    // independent reference: plain Scala over the same strings
    val ref = Map(
      1L -> "buy now buy now buy now buy now",
      2L -> "the quick brown fox jumps over the dog",
      3L -> "a a a a a a",
      5L -> "p q p q r").map { case (id, s) =>
      val tk = s.split("\\s+").toSeq
      val grams = tk.sliding(2).map(_.mkString(" ")).toSeq
      val counts = grams.groupBy(identity).map(_._2.size)
      id -> (1.0 - counts.size.toDouble / grams.size,
        counts.max.toDouble * 2 / tk.length)
    }
    assert(out.keySet == ref.keySet, "doc 4 (1 token) must produce no row")
    ref.foreach { case (id, (dup, top)) =>
      assert(math.abs(out(id)._1 - dup) < 1e-15, s"dup_ngram_frac doc $id")
      assert(math.abs(out(id)._2 - top) < 1e-15, s"top_ngram_frac doc $id")
    }
    // the loop doc dominates both signals; the distinct doc floors them
    assert(out(1L)._1 > 0.5 && out(2L)._1 == 0.0)
    assert(out(1L)._2 > out(5L)._2 && out(3L)._2 > 0.9)
  }

  test("charEntropies (table form) ≡ charEntropy (HOF form), empty doc is 0") {
    import graft.functions.TextFunctions
    val docs = Seq((1L, "aaaaaaaa"), (2L, "abcd"), (3L, "aabb"), (4L, ""),
      (5L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val table = Quality.charEntropies(docs, "doc_id", "text")
      .select($"doc_id", round($"char_entropy", 9).as("e"))
      .as[(Long, Double)].collect().toMap
    val hof = docs.select($"doc_id",
        round(TextFunctions.charEntropy($"text"), 9).as("e"))
      .as[(Long, Double)].collect().toMap
    assert(table == hof, s"table $table vs HOF $hof")
    assert(table(4L) == 0.0 && math.abs(table(2L) - math.log(4)) < 1e-8)
  }

  test("removeBoilerplateLines: corpus-frequent lines excised, order kept, every doc survives") {
    // "cookie notice" appears in 3 docs → boilerplate at minCount=3;
    // "rare footer" appears twice → kept
    val docs = Seq(
      (1L, "cookie notice\nreal content one\nrare footer"),
      (2L, "real content two\ncookie notice\nmore real text"),
      (3L, "cookie notice\n  \nrare footer\nunique tail"),
      (4L, "nothing shared here"))
      .toDF("doc_id", "text")
    val out = Quality.removeBoilerplateLines(docs, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == (("real content one\nrare footer", 2L, 1L)))
    assert(out(2L) == (("real content two\nmore real text", 2L, 1L)))
    // whitespace-only segment dropped unconditionally, not counted
    assert(out(3L) == (("rare footer\nunique tail", 2L, 1L)))
    assert(out(4L) == (("nothing shared here", 1L, 0L)))

    // a doc that is ENTIRELY boilerplate stays in the output, empty
    val all = Seq((1L, "x\nx"), (2L, "x"), (3L, "x\ny")).toDF("doc_id", "text")
    val o2 = Quality.removeBoilerplateLines(all, "doc_id", "text", minCount = 3)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(o2(1L) == (("", 0L, 2L)) && o2(2L) == (("", 0L, 1L)))
    assert(o2(3L) == (("y", 1L, 1L)))

    // custom delimiter is literal (regex-quoted): '|' must not be
    // treated as alternation
    val piped = Seq((1L, "a|shared|b"), (2L, "shared|c"), (3L, "shared"))
      .toDF("doc_id", "text")
    val o3 = Quality.removeBoilerplateLines(piped, "doc_id", "text",
        minCount = 3, delimiter = "|")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(o3(1L) == (("a\nb", 2L, 1L)) && o3(3L) == (("", 0L, 1L)))

    intercept[IllegalArgumentException](
      Quality.removeBoilerplateLines(docs, "doc_id", "text", minCount = 1))
    intercept[IllegalArgumentException](
      Quality.removeBoilerplateLines(docs, "doc_id", "text", delimiter = ""))
  }

  test("charClassProfile: exact class counts, non-ASCII outside every class") {
    val docs = Seq(
      (1L, "Ab 12\n"),           // 2 letters, 2 digits, 2 space
      (2L, "!!??"),              // punctuation only
      (3L, ""),                  // empty
      (4L, "héllo wörld"))       // é/ö are NOT [A-Za-z]
      .toDF("doc_id", "text")
    val out = Quality.charClassProfile(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) == ((6L, 2L, 2L, 2L)), s"$out")
    assert(out(2L) == ((4L, 0L, 0L, 0L)))
    assert(out(3L) == ((0L, 0L, 0L, 0L)))
    assert(out(4L) == ((11L, 8L, 0L, 1L)), "accented chars count in n_chars only")
  }

  // --- maskTokens ----------------------------------------------------------

  private def refUniform(salt: String, id: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((salt + id).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 13), 16) + 1.0) /
      4503599627370496.0
  }

  test("maskTokens ≡ independent md5-coin replay; deterministic under " +
    "repartition; empty doc → empty output") {
    val docs = Seq(
      (1L, "The Quick brown fox Jumps over the lazy dog again and again"),
      (2L, "a b c d e f g h i j k l m n o p q r s t"),
      (3L, "   "),
      (4L, "single"))
      .toDF("doc_id", "text")
    val out = Quality.maskTokens(docs, "doc_id", "text", rate = 0.5,
        salt = "tm")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    Seq(1L, 2L, 4L).foreach { id =>
      val toks = docs.filter(col("doc_id") === id)
        .collect().head.getString(1).toLowerCase
        .split("\\s+").filter(_.nonEmpty)
      val expect = toks.zipWithIndex.map { case (t, i) =>
        if (refUniform("tm", s"$id#$i") < 0.5) "[MASK]" else t }
      assert(out(id)._1 == toks.length.toLong, s"doc $id")
      assert(out(id)._2 == expect.count(_ == "[MASK]").toLong, s"doc $id")
      assert(out(id)._3 == expect.mkString(" "), s"doc $id")
    }
    assert(out(3L) == ((0L, 0L, "")))
    val again = Quality.maskTokens(docs.repartition(7), "doc_id", "text",
        rate = 0.5, salt = "tm")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(again == out)
    intercept[IllegalArgumentException] {
      Quality.maskTokens(docs, "doc_id", "text", rate = 1.5)
    }
  }

  test("maskTokens: a pre-existing mask literal in the text never " +
    "inflates n_masked (the coin counts, not the token)") {
    // tiny rate: the deterministic coins for this doc draw no mask
    val docs = Seq((9L, "[mask] [mask] safe")).toDF("doc_id", "text")
    val r = Quality.maskTokens(docs, "doc_id", "text", rate = 0.0001,
      maskToken = "[mask]").collect().head
    assert(r.getLong(1) == 3L)
    assert(r.getLong(2) == 0L,
      "existing [mask] tokens must not count as masked")
  }

  test("fleschReadingEase: hand counts — sentences on [.!?]+ runs, " +
    "vowel-group syllables; degenerate docs null the score") {
    import spark.implicits._
    val docs = Seq(
      // 2 sentences, 6 words; syllables: the(1) cat(1) sat(1) a(1)
      // big(1) mat(1) = 6 → 206.835 − 1.015·3 − 84.6·1
      (1L, "The cat sat. A big mat!"),
      (2L, "Beautiful queue today."), // 1 sentence, 3 words; vowel
      // groups: b-eau-t-i-f-u-l = 3, q-ueue = 1 (one contiguous run),
      // t-o-d-ay = 2 -> 6
      (3L, "no terminator here"),     // trailing fragment = 1 sentence
      (4L, null.asInstanceOf[String]),
      (5L, "?!?"))                     // punctuation only: 0 words
      .toDF("doc_id", "text")
    val out = Quality.fleschReadingEase(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getLong(1) == 2L && r1.getLong(2) == 6L && r1.getLong(3) == 6L)
    assert(r1.getDouble(4) ==
      math.rint((206.835 - 1.015 * 3.0 - 84.6 * 1.0) * 1e4) / 1e4)
    val r2 = out(2L)
    assert(r2.getLong(1) == 1L && r2.getLong(2) == 3L && r2.getLong(3) == 6L)
    assert(out(3L).getLong(1) == 1L && !out(3L).isNullAt(4),
      "a terminator-less doc is one trailing sentence")
    assert(out(4L).getLong(2) == 0L && out(4L).isNullAt(4))
    // "?!?" is one whitespace TOKEN but zero sentences (all segments
    // empty after the terminator split) → null score
    assert(out(5L).getLong(1) == 0L && out(5L).getLong(2) == 1L &&
      out(5L).isNullAt(4))
  }

  test("corruptSpans: sentinels are ordinal and consistent between " +
    "the corrupted and target sides; dropped token count = spans x " +
    "block sizes; null/empty text yields the zero row; reruns " +
    "bit-identical") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j k l m n o p"),
      (2L, "one two"),
      (3L, null.asInstanceOf[String]),
      (4L, "")).toDF("doc_id", "text")
    val out = Quality.corruptSpans(docs, "doc_id", "text",
        rate = 0.5, spanLen = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getLong(1) == 16L)
    val nSpans = r1.getLong(2)
    val nMasked = r1.getLong(3)
    val corrupted = r1.getString(4)
    val targets = r1.getString(5)
    // masked tokens = full blocks of 3 except possibly the last (1)
    val lastBlockMasked = targets.contains(" p") || targets.endsWith("> p")
    assert(nMasked == 3 * nSpans - (if (lastBlockMasked) 2 else 0))
    // each side carries each sentinel exactly once, numbered 0..n-1
    for (k <- 0L until nSpans) {
      assert(corrupted.contains(s"<extra_id_$k>"), s"corrupted missing $k")
      assert(targets.contains(s"<extra_id_$k>"), s"targets missing $k")
    }
    assert(!corrupted.contains(s"<extra_id_$nSpans>"))
    // corrupted keeps the un-dropped tokens in order; targets hold the
    // dropped ones — together they cover all 16 tokens exactly once
    val corrToks = corrupted.split(" ").filterNot(_.startsWith("<extra"))
    val tgtToks = targets.split(" ").filterNot(_.startsWith("<extra"))
      .filter(_.nonEmpty)
    assert((corrToks ++ tgtToks).sorted.toSeq ==
      "a b c d e f g h i j k l m n o p".split(" ").sorted.toSeq)
    assert(out(3L).getLong(1) == 0L && out(3L).getString(4) == "" &&
      out(3L).getString(5) == "")
    assert(out(4L).getLong(1) == 0L)
    val out2 = Quality.corruptSpans(docs, "doc_id", "text",
      rate = 0.5, spanLen = 3).collect().map(_.toSeq).toSet
    assert(out2 == out.values.map(_.toSeq).toSet, "determinism")
    intercept[IllegalArgumentException] {
      Quality.corruptSpans(docs, "doc_id", "text", rate = 0.5, spanLen = 0)
    }
  }

  test("corruptSpans: per-doc block envelope fails fast with the " +
    "remedy; docs inside the envelope are untouched by the guard") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 30).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    // 30 tokens / spanLen 3 = 10 blocks: cap 10 admits, cap 9 raises
    val ok = Quality.corruptSpans(docs, "doc_id", "text", rate = 0.5,
      spanLen = 3, maxBlocksPerDoc = 10).collect()
    val plain = Quality.corruptSpans(docs, "doc_id", "text", rate = 0.5,
      spanLen = 3).collect()
    assert(ok.map(_.toSeq).toSeq == plain.map(_.toSeq).toSeq)
    val e = intercept[Exception] {
      Quality.corruptSpans(docs, "doc_id", "text", rate = 0.5,
        spanLen = 3, maxBlocksPerDoc = 9).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("maxBlocksPerDoc")), messages(e))
    intercept[IllegalArgumentException] {
      Quality.corruptSpans(docs, "doc_id", "text", rate = 0.5,
        maxBlocksPerDoc = 0)
    }
  }
  test("lexicalStats: hand counts, case folding, empty doc, guard") {
    val docs = Seq(
      (1L, "The the cat sat on the mat"),
      (2L, ""),
      (3L, "Word word WORD"))
      .toDF("doc_id", "text")
    val out = Quality.lexicalStats(docs, "doc_id", "text",
        stopwords = Seq("the", "on"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val d1 = out(1L)
    // tokens: the,the,cat,sat,on,the,mat (7); types 5; stop 4; len 20
    assert(d1.getLong(1) == 7L && d1.getLong(2) == 5L)
    assert(d1.getDouble(3) == math.rint(5.0 / 7.0 * 1e6) / 1e6)
    assert(d1.getDouble(4) == math.rint(4.0 / 7.0 * 1e6) / 1e6)
    // hapax: cat,sat,on,mat of 5 types
    assert(d1.getDouble(5) == 0.8)
    assert(d1.getDouble(6) == math.rint(20.0 / 7.0 * 1e6) / 1e6)
    // empty doc survives with zero counts and null ratios
    val d2 = out(2L)
    assert(d2.getLong(1) == 0L && d2.getLong(2) == 0L && d2.isNullAt(3) &&
      d2.isNullAt(4) && d2.isNullAt(5) && d2.isNullAt(6))
    // case folding: one type, zero hapax
    val d3 = out(3L)
    assert(d3.getLong(1) == 3L && d3.getLong(2) == 1L &&
      d3.getDouble(5) == 0.0)
    intercept[IllegalArgumentException] {
      Quality.lexicalStats(docs, "doc_id", "text", stopwords = Nil)
    }
  }
}
