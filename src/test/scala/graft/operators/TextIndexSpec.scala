package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark merge spark window"),
    (2L, "window table row"),
    (3L, "spark spark spark"),
    (4L, "nothing relevant here")).toDF("doc_id", "text")

  test("postings: tf and 1-based positions per (token, doc)") {
    val out = TextIndex.postings(docs, "doc_id", "text")
      .select($"token", $"doc_id", $"tf", $"positions")
      .as[(String, Long, Long, Seq[Int])].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out(("spark", 1L)) == (2L, Seq(1, 3)))
    assert(out(("merge", 1L)) == (1L, Seq(2)))
    assert(out(("window", 1L)) == (1L, Seq(4)))
    assert(out(("spark", 3L)) == (3L, Seq(1, 2, 3)))
    assert(!out.contains(("spark", 2L)))
    // total postings = distinct (token, doc) pairs
    assert(out.size == 3 + 3 + 1 + 3)
  }

  test("bm25 matches an independent in-memory reference computation") {
    val q = Seq("spark", "window")
    val out = TextIndex.bm25(docs, "doc_id", "text", q)
      .as[(Long, Double)].collect().toMap

    // independent reference: plain Scala over the same corpus
    val corpus = Map(
      1L -> Seq("spark", "merge", "spark", "window"),
      2L -> Seq("window", "table", "row"),
      3L -> Seq("spark", "spark", "spark"),
      4L -> Seq("nothing", "relevant", "here"))
    val n = corpus.size.toDouble
    val avgdl = corpus.values.map(_.length).sum / n
    def score(d: Seq[String]): Double = q.distinct.map { t =>
      val tf = d.count(_ == t).toDouble
      if (tf == 0) 0.0
      else {
        val df = corpus.values.count(_.contains(t)).toDouble
        val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * d.length / avgdl))
      }
    }.sum
    corpus.foreach { case (id, toks) =>
      assert(math.abs(out(id) - score(toks)) < 1e-12, s"doc $id")
    }
    assert(out(4L) == 0.0, "no-match docs score 0 and stay in the output")
    // the all-spark doc must out-rank the no-match doc, and doc 1 (both
    // terms) must beat doc 2 (one rarer-term occurrence only)
    assert(out(1L) > out(2L) && out(3L) > out(4L))
  }

  test("rrfFuse: integer ranks, full-outer universes, known fusion values") {
    val a = Seq((1L, 10.0), (2L, 5.0), (3L, 1.0)).toDF("doc_id", "sa")
    val b = Seq((2L, 0.9), (3L, 0.8), (4L, 0.7)).toDF("doc_id", "sb")
    val out = TextIndex.rrfFuse(a, "sa", b, "sb", k = 60)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(out(1L) - 1.0 / 61) < 1e-15)          // rank 1 in a only
    assert(math.abs(out(2L) - (1.0 / 62 + 1.0 / 61)) < 1e-15)
    assert(math.abs(out(3L) - (1.0 / 63 + 1.0 / 62)) < 1e-15)
    assert(math.abs(out(4L) - 1.0 / 63) < 1e-15)          // b only
    // equal scores tie-break by id: both get consecutive ranks
    val ties = Seq((7L, 1.0), (5L, 1.0)).toDF("doc_id", "sa")
    val tied = TextIndex.rrfFuse(ties, "sa", ties.limit(0), "sa")
      .as[(Long, Double)].collect().toMap
    assert(tied(5L) > tied(7L), "lower id wins the tie (rank 1)")
  }
}
