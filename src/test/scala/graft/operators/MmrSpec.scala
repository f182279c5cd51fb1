package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{VectorFunctions => VF}

/** MMR rerank: pure-relevance endpoint, diversity behavior on planted
  * vectors, bounded-candidate contract, and equality against an
  * independent driver-side greedy reference. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def cands(rows: Seq[(Long, Double, Seq[Float])]) =
    rows.toDF("id", "rel", "vec")

  test("lambda = 1.0 is pure relevance: selection order = rel desc, id asc") {
    val c = cands(Seq(
      (1L, 0.9, Seq(1f, 0f, 0f)),
      (2L, 0.8, Seq(1f, 0f, 0f)),
      (3L, 0.8, Seq(0f, 1f, 0f)),
      (4L, 0.1, Seq(0f, 0f, 1f))))
    val out = Mmr.mmrRerank(c, "id", "rel", "vec", k = 3, lambda = 1.0)
      .orderBy("rank").select("id").as[Long].collect()
    assert(out.toSeq == Seq(1L, 2L, 3L)) // tie at 0.8 broken by id asc
  }

  test("diversity: near-duplicate of the top pick is displaced by a distinct vector") {
    // ids 1 and 2 are the same direction (sim 1.0); id 3 is orthogonal
    // with lower relevance. Pure relevance picks (1, 2); MMR at
    // lambda = 0.5 penalizes 2 by 0.5·1.0 and picks 3 second.
    val c = cands(Seq(
      (1L, 0.9, Seq(1f, 0f, 0f)),
      (2L, 0.85, Seq(1f, 0f, 0f)),
      (3L, 0.5, Seq(0f, 1f, 0f))))
    val out = Mmr.mmrRerank(c, "id", "rel", "vec", k = 2, lambda = 0.5)
      .orderBy("rank").select("id").as[Long].collect()
    assert(out.toSeq == Seq(1L, 3L))
  }

  test("k larger than the candidate list returns all candidates, ranks dense") {
    val c = cands(Seq(
      (1L, 0.9, Seq(1f, 0f, 0f)),
      (2L, 0.4, Seq(0f, 1f, 0f))))
    val out = Mmr.mmrRerank(c, "id", "rel", "vec", k = 10, lambda = 0.5)
      .orderBy("rank").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(out.map(_.getLong(1)).toSet == Set(1L, 2L))
  }

  test("matches an independent driver-side greedy reference on real embeddings") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val c = emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(qv))
      .select(col("vec_id").as("id"),
        round(VF.cosine(col("embedding"), col("qv")), 4).as("rel"),
        col("embedding").as("vec"))
      .orderBy(col("rel").desc, col("id").asc).limit(15)

    val lambda = 0.5
    val got = Mmr.mmrRerank(c, "id", "rel", "vec", k = 6, lambda = lambda)
      .orderBy("rank")
      .select("id", "mmr_score").as[(Long, Double)].collect().toSeq

    // independent reference: plain Scala greedy over the collected list
    val rows = c.collect().map { r =>
      (r.getLong(0), r.getDouble(1), r.getSeq[Float](2).toArray)
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    var sel = Vector.empty[(Long, Double)]
    while (sel.size < 6 && sel.size < rows.length) {
      val rem = rows.filterNot(r => sel.exists(_._1 == r._1))
      val scored = rem.map { case (id, rel, v) =>
        val pen = if (sel.isEmpty) 0.0
          else sel.map(s => r4(cos(v, rows.find(_._1 == s._1).get._3))).max
        (id, r4(lambda * rel - (1.0 - lambda) * pen))
      }
      val best = scored.minBy { case (id, sc) => (-sc, id) }
      sel :+= best
    }
    assert(got == sel,
      s"engine $got != reference $sel")
  }
}
