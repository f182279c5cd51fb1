package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def centroids = Seq(
    (1L, Seq(0.0, 0.0)), (2L, Seq(10.0, 0.0))
  ).toDF("cluster_id", "centroid")

  test("silhouette: well-separated points ≈ 1, a boundary point = 0, " +
    "a mis-assigned-side point scores via the simplified formula") {
    val pts = Seq(
      (10L, Seq(0.0, 1.0)),   // near c1: a = 1, b = sqrt(101)
      (11L, Seq(10.0, 1.0)),  // near c2: symmetric
      (12L, Seq(5.0, 0.0)),   // exact midpoint: a = b = 5 → s = 0
      (13L, null.asInstanceOf[Seq[Double]])) // dropped
      .toDF("id", "v")
    val out = KMeans.silhouette(pts, "v", "id", centroids)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // cluster 1 holds the near point (s = 1 − 1/sqrt(101)) and the
    // midpoint (tie → smaller cluster_id, s = 0): mean of the two
    val s10 = math.rint((1.0 - 1.0 / math.sqrt(101.0)) * 1e9) / 1e9
    assert(out(1L)._1 == 2L)
    assert(out(1L)._2 == math.rint(s10 / 2 * 1e6) / 1e6)
    assert(out(2L) == ((1L, math.rint(s10 * 1e6) / 1e6)))
  }

  test("silhouette: the degenerate max(a,b) = 0 point (sitting on two " +
    "identical centroids) scores 0, not a division error") {
    val dup = Seq((1L, Seq(0.0, 0.0)), (2L, Seq(0.0, 0.0)))
      .toDF("cluster_id", "centroid")
    val pts = Seq((10L, Seq(0.0, 0.0))).toDF("id", "v")
    val out = KMeans.silhouette(pts, "v", "id", dup).collect()
    assert(out.length == 1 && out.head.getDouble(2) == 0.0)
  }

  test("silhouette: k = 1 fails fast (no nearest-other centroid) " +
    "instead of silently dropping every point") {
    val one = Seq((1L, Seq(0.0, 0.0))).toDF("cluster_id", "centroid")
    val pts = Seq((10L, Seq(1.0, 0.0))).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      KMeans.silhouette(pts, "v", "id", one)
    }
    assert(e.getMessage.contains(">= 2 centroids"))
  }

  test("assign: argmin with cluster-id tie-break (the silhouette 'own' " +
    "side)") {
    val pts = Seq((10L, Seq(5.0, 0.0)), (11L, Seq(1.0, 0.0)))
      .toDF("id", "v")
    val out = KMeans.assign(pts, "v", "id", centroids)
      .select("id", "cluster_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(10L -> 1L, 11L -> 1L))
  }
}
