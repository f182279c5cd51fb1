package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(0.0f, 1.0f, 0.0f)),
    (2L, Seq(2.0f, 0.0f, 0.0f)),
    (3L, Seq(-1.0f, 0.0f, 0.0f)),
    (4L, Seq(1.0f, 1.0f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("cosine: identity 1, orthogonal 0, opposite -1, scale-invariant") {
    val q = array(lit(1.0f), lit(0.0f), lit(0.0f))
    val out = vecs.select($"vec_id",
      VectorFunctions.cosine($"embedding", q).as("c"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(out(0L) - 1.0) < 1e-12)
    assert(math.abs(out(1L)) < 1e-12)
    assert(math.abs(out(2L) - 1.0) < 1e-12, "scale invariance")
    assert(math.abs(out(3L) + 1.0) < 1e-12)
    assert(math.abs(out(4L) - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("bruteForceTopK returns k best by cosine with deterministic tiebreak") {
    val out = VectorFunctions.bruteForceTopK(vecs, "embedding", "vec_id",
      Seq(1.0f, 0.0f, 0.0f), k = 3)
      .select("vec_id").as[Long].collect().toSeq
    // 0 and 2 both cosine=1 (tie -> lower id first), then 4
    assert(out == Seq(0L, 2L, 4L))
  }

  test("lshTopK finds the exact top-1 for an easy margin") {
    val out = VectorFunctions.lshTopK(vecs.filter($"vec_id" =!= 0L),
      "embedding", "vec_id", Seq(1.0f, 0.0f, 0.0f), k = 1, numPlanes = 2)
      .select("vec_id").as[Long].collect()
    assert(out.headOption.contains(2L))
  }

  test("bucketedKnn only pairs within buckets and ranks by cosine") {
    val out = VectorFunctions.bucketedKnn(vecs, "embedding", "vec_id",
      k = 2, numPlanes = 1)
    // with 1 plane there are at most 2 buckets; every returned pair must
    // have a defined cosine and id_a != id_b
    val rows = out.as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (a, b, _) => a != b })
  }
}
