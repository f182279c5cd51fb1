package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KeywordsSpec extends SparkSpec {
  import spark.implicits._

  /** Independent single-machine TextRank with the operator's exact
    * numeric contract (9-grid contributions, per-iteration re-round). */
  private def refTextRank(text: String, window: Int, iterations: Int,
                          damping: Double, minLen: Int): Map[String, Double] = {
    val g9 = (x: Double) => math.rint(x * 1e9) / 1e9
    val toks = text.trim.split("\\s+").filter(_.nonEmpty).zipWithIndex
      .filter(_._1.length >= minLen)
    val pairs = for {
      (a, i) <- toks
      o <- 1 until window
      (b, j) <- toks if j == i + o && a != b
    } yield (a, b)
    val und = pairs ++ pairs.map { case (a, b) => (b, a) }
    val wts = und.groupBy(identity).map { case (k, v) => k -> v.size.toDouble }
    val deg = wts.groupBy(_._1._1).map { case (n, es) => n -> es.values.sum }
    var s = deg.keys.map(_ -> 1.0).toMap
    for (_ <- 1 to iterations) {
      val contrib = wts.toSeq.map { case ((a, b), w) =>
        b -> math.rint(w / deg(a) * s(a) * 1e9).toLong
      }.groupBy(_._1).map { case (n, cs) =>
        // exact integer-grid sum of 1e-9 units, one division back
        n -> cs.map(_._2).sum.toDouble / 1e9
      }
      s = s.map { case (n, _) =>
        n -> g9((1.0 - damping) + damping * contrib.getOrElse(n, 0.0))
      }
    }
    s
  }

  test("textRank matches the independent reference bit-for-bit") {
    val text = "spark shuffles data across the cluster the cluster " +
      "shuffles data when spark joins data"
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val out = Keywords.textRank(df, "doc_id", "text", window = 2,
        iterations = 5, topK = 100)
      .collect().map(r => r.getString(2) -> r.getDouble(3)).toMap
    val ref = refTextRank(text, 2, 5, 0.85, 2)
    assert(out.keySet == ref.keySet)
    for ((t, s) <- ref)
      assert(out(t) == math.rint(s * 1e6) / 1e6, s"token $t")
    // frequent, well-connected words should outrank singletons
    assert(out("data") > out("joins"))
  }

  test("textRank: gated tokens still occupy positions (gaps block adjacency)") {
    // minTokenLen = 2 drops both "x"; with window 2 the gap isolates
    // "aa" entirely — under re-indexing it would link to "bb"
    val df = Seq((1L, "aa x x bb cc dd")).toDF("doc_id", "text")
    val out = Keywords.textRank(df, "doc_id", "text", window = 2,
        iterations = 3, topK = 10)
      .collect()
    assert(!out.exists(_.getString(2) == "x"))
    assert(!out.exists(_.getString(2) == "aa")) // edgeless → no rank row
    val ref = refTextRank("aa x x bb cc dd", 2, 3, 0.85, 2)
    val reindexed = refTextRank("aa bb cc dd", 2, 3, 0.85, 2)
    assert(ref != reindexed) // the two conventions genuinely differ here
    assert(out.map(r => r.getString(2) -> r.getDouble(3)).toMap ==
      ref.map { case (k, v) => k -> (math.rint(v * 1e6) / 1e6) })
  }

  test("textRank: many documents advance independently in one plan") {
    val df = Seq(
      (1L, "alpha beta alpha beta gamma"),
      (2L, "delta epsilon delta"),
      (3L, "zz")) // no edges at all → no keyword rows
      .toDF("doc_id", "text")
    val out = Keywords.textRank(df, "doc_id", "text", topK = 2)
      .collect().groupBy(_.getLong(0))
    assert(out(1L).length == 2 && out(2L).length == 2)
    assert(!out.contains(3L))
    // per-doc results equal the single-doc runs (no cross-doc bleed)
    val solo = Keywords.textRank(
        Seq((1L, "alpha beta alpha beta gamma")).toDF("doc_id", "text"),
        "doc_id", "text", topK = 2)
      .collect().map(r => (r.getInt(1), r.getString(2), r.getDouble(3))).toSet
    assert(out(1L).map(r => (r.getInt(1), r.getString(2), r.getDouble(3)))
      .toSet == solo)
  }

  // --- collocations --------------------------------------------------------

  test("collocations: hand-computed PMI; minCount prunes the hapax pair") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c d")).toDF("doc_id", "text")
    // Nu = 8 tokens, Nb = 6 bigrams; "a b" ×3, c(a)=3, c(b)=3
    val out = Keywords.collocations(docs, "doc_id", "text",
        minCount = 2, topK = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out.keySet == Set("a b")) // "b a","b c","c d" are count-1
    val pmi = math.rint(math.log(3.0 * 8 * 8 / (6.0 * 3 * 3)) * 1e6) / 1e6
    assert(out("a b") == ((3L, 3L, 3L, pmi)))
  }

  test("collocations: exclusive pair outranks a stopword pair of equal count") {
    // "x y" occurs 3×, x and y occur ONLY there; "t u" occurs 3× but t
    // and u are everywhere — PMI must rank "x y" first even though raw
    // counts tie (the q81 failure mode this operator exists to fix)
    val docs = Seq(
      (1L, "x y t q t u r t u s t u"),
      (2L, "x y t t u u"),
      (3L, "x y")).toDF("doc_id", "text")
    val out = Keywords.collocations(docs, "doc_id", "text",
        minCount = 3, topK = 10).collect()
    val byName = out.map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(byName("x y") > byName("t u"))
    assert(out.head.getString(0) == "x y")
  }

  test("collocations: empty and single-token docs contribute no bigrams") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "p q p q p q"))
      .toDF("doc_id", "text")
    val out = Keywords.collocations(docs, "doc_id", "text",
        minCount = 1, topK = 10).collect()
    assert(out.map(_.getString(0)).toSet == Set("p q", "q p"))
    // Nu counts only real tokens (7), Nb only real bigrams (5)
    val pq = out.find(_.getString(0) == "p q").get
    assert(pq.getLong(1) == 3L)
    val exp = math.rint(math.log(3.0 * 7 * 7 / (5.0 * 3 * 3)) * 1e6) / 1e6
    assert(pq.getDouble(4) == exp)
  }
}
