package graft.operators

import graft.SparkSpec

class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a b a b c"),
    (2L, "a b"),
    (3L, "c c c"),
    (4L, "x"),        // single token: no bigrams, no output row
    (5L, "")).toDF("doc_id", "text")

  test("bigramOccurrences: ordered within-doc pairs, short docs drop") {
    val out = LanguageModel.bigramOccurrences(docs, "doc_id", "text")
      .as[(Long, String, String)].collect().toSeq
    assert(out.filter(_._1 == 1L).map(r => (r._2, r._3)) ==
      Seq(("a", "b"), ("b", "a"), ("a", "b"), ("b", "c")))
    assert(out.filter(_._1 == 3L).map(r => (r._2, r._3)) ==
      Seq(("c", "c"), ("c", "c")))
    assert(!out.exists(r => r._1 == 4L || r._1 == 5L))
  }

  test("bigramCrossEntropy matches an independent in-memory reference") {
    val corpus = Map(
      1L -> Seq("a", "b", "a", "b", "c"),
      2L -> Seq("a", "b"),
      3L -> Seq("c", "c", "c"))
    val grams = corpus.values.flatMap(t => t.zip(t.tail)).toSeq
    val cbg = grams.groupBy(identity).view.mapValues(_.size).toMap
    val ctx = grams.groupBy(_._1).view.mapValues(_.size).toMap
    val v = corpus.values.flatten.toSet.size + 1 // +1 for the bigram-less "x"
    def xent(toks: Seq[String]): Double = {
      val nlls = toks.zip(toks.tail).map { g =>
        val p = (cbg(g) + 1.0) / (ctx(g._1) + v)
        BigDecimal(-math.log(p)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }
      (nlls.sum / nlls.size).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val out = LanguageModel.bigramCrossEntropy(docs, "doc_id", "text")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.keySet == Set(1L, 2L, 3L), "bigram-less docs produce no row")
    corpus.foreach { case (id, toks) =>
      assert(math.abs(out(id)._1 - xent(toks)) < 1e-9, s"doc $id: ${out(id)._1} vs ${xent(toks)}")
      assert(out(id)._2 == toks.length - 1)
    }
    // the templated doc (3: all c-c) must score LOWER than doc 1
    assert(out(3L)._1 < out(1L)._1)
  }
}
