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

  test("bigramPmi: collocations score ln(c·N/(ca·cb)); minCount floors") {
    val pdocs = Seq(
      (1L, "new york new york new york"),
      (2L, "new deal and old york"),
      (3L, "a b a b a b a b")).toDF("doc_id", "text")
    val out = LanguageModel.bigramPmi(pdocs, "doc_id", "text", minCount = 2)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // reference marginals over ALL bigrams
    val bgs = Seq("new york new york new york", "new deal and old york",
      "a b a b a b a b").flatMap { s =>
      val t = s.split(" ").toSeq; t.zip(t.tail)
    }
    val n = bgs.size.toDouble
    def pmi(a: String, b: String): Double = {
      val c = bgs.count(_ == (a, b)).toDouble
      math.log(c * n / (bgs.count(_._1 == a).toDouble * bgs.count(_._2 == b)))
    }
    assert(out.keySet == Set(("new", "york"), ("york", "new"), ("a", "b"), ("b", "a")),
      s"pairs below minCount 2 must drop: ${out.keySet}")
    out.foreach { case ((a, b), (c, p)) =>
      assert(c == bgs.count(_ == (a, b)).toLong)
      assert(math.abs(p - pmi(a, b)) < 1e-12, s"pmi($a, $b)")
    }
    // the dedicated collocation (a, b) outscores the diluted (new, york):
    // 'new' also precedes 'deal', 'york' also follows 'old'
    assert(out(("a", "b"))._2 > out(("new", "york"))._2)
  }

  test("trigramCrossEntropy matches an independent in-memory reference") {
    val tdocs = Seq(
      (1L, "a b c a b c a b"),
      (2L, "a b c"),
      (3L, "c c c c"),
      (4L, "x y"),     // 2 tokens: no trigrams, no output row
      (5L, "a b x y c a")).toDF("doc_id", "text")
    val corpus = Map(
      1L -> "a b c a b c a b", 2L -> "a b c", 3L -> "c c c c",
      4L -> "x y", 5L -> "a b x y c a").view.mapValues(_.split(" ").toSeq).toMap
    val tris = corpus.values.flatMap(_.sliding(3).filter(_.size == 3).map(_.toList)).toSeq
    val bis = corpus.values.flatMap(t => t.zip(t.tail)).toSeq
    val unis = corpus.values.flatten.toSeq
    val c3 = tris.groupBy(identity).view.mapValues(_.size).toMap
    val c3x = tris.groupBy(_.take(2)).view.mapValues(_.size).toMap
    val c2 = bis.groupBy(identity).view.mapValues(_.size).toMap
    val c2x = bis.groupBy(_._1).view.mapValues(_.size).toMap
    val c1 = unis.groupBy(identity).view.mapValues(_.size).toMap
    val t = unis.size
    def xent3(toks: Seq[String]): Double = {
      val nlls = toks.sliding(3).filter(_.size == 3).map(_.toList).map { g =>
        val p = 0.6 * c3(g).toDouble / c3x(g.take(2)) +
          0.3 * c2((g(1), g(2))).toDouble / c2x(g(1)) +
          0.1 * c1(g(2)).toDouble / t
        BigDecimal(-math.log(p)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.toSeq
      (nlls.sum / nlls.size).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val out = LanguageModel.trigramCrossEntropy(tdocs, "doc_id", "text")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 5L), "trigram-less docs produce no row")
    Seq(1L, 2L, 3L, 5L).foreach { id =>
      assert(math.abs(out(id)._1 - xent3(corpus(id))) < 1e-9,
        s"doc $id: ${out(id)._1} vs ${xent3(corpus(id))}")
      assert(out(id)._2 == corpus(id).length - 2)
    }
    // the unique-path doc 5 carries more surprise than either repetitive
    // doc (1's abc-cycle is the corpus's dominant pattern)
    assert(out(5L)._1 > out(1L)._1 && out(5L)._1 > out(3L)._1)
  }
}
