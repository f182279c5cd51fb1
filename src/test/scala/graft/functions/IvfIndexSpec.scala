package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  test("build assigns every vector to exactly one of k clusters") {
    val idx = IvfIndex.build(emb, "embedding", "vec_id", k = 8)
    assert(idx.indexed.count() == emb.count())
    assert(idx.indexed.select("cluster_id").distinct().count() <= 8)
    assert(idx.centroids.count() <= 8)
    // assignment is a function: one row per vec_id
    assert(idx.indexed.select("vec_id").distinct().count() == emb.count())
    // caller-owned lifecycle: close() releases the cached centroid blocks
    assert(idx.centroids.storageLevel.useMemory)
    idx.close()
    assert(!idx.centroids.storageLevel.useMemory,
      "close() must unpersist the centroid cache")
  }

  test("probing all clusters reproduces the exact brute-force top-k") {
    import scala.jdk.CollectionConverters._
    val qv = emb.filter($"vec_id" === 0).select("embedding")
      .collect()(0).getList[Float](0).asScala.toSeq
    val rest = emb.filter($"vec_id" =!= 0)
    val idx = IvfIndex.build(rest, "embedding", "vec_id", k = 8)
    val exact = VectorFunctions.bruteForceTopK(rest, "embedding", "vec_id", qv, 10)
      .select("vec_id").as[Long].collect().toSeq
    val ivfAll = IvfIndex.topK(idx.indexed, idx.centroids, "embedding", "vec_id", qv,
      k = 10, nprobe = 8).select("vec_id").as[Long].collect().toSeq
    assert(ivfAll == exact, "nprobe=k must equal exact search")
    idx.close()
  }

  test("catalog ivf cache evicts and closes its session's entries (ADVICE r2)") {
    import graft.catalog.LlmQueries
    val idx = LlmQueries.cachedIvfIndex(spark, "spec-dir")(
      IvfIndex.build(emb, "embedding", "vec_id", k = 4))
    assert(LlmQueries.cachedIvfIndex(spark, "spec-dir")(
      fail("second lookup must hit the cache")) eq idx)
    assert(idx.centroids.storageLevel.useMemory)
    LlmQueries.evictIvfForSession(spark)
    assert(!idx.centroids.storageLevel.useMemory,
      "eviction must close() the index and release centroid blocks")
    assert(!LlmQueries.ivfCache.keySet().stream()
      .anyMatch(k => k._1 eq spark), "no entries for the session may remain")
    // re-registration after eviction works (listener set was cleared)
    val idx2 = LlmQueries.cachedIvfIndex(spark, "spec-dir")(
      IvfIndex.build(emb, "embedding", "vec_id", k = 4))
    assert(idx2 ne idx)
    LlmQueries.evictIvfForSession(spark)
  }

  test("small nprobe still finds most of the true top-k (recall sanity)") {
    import scala.jdk.CollectionConverters._
    val qv = emb.filter($"vec_id" === 0).select("embedding")
      .collect()(0).getList[Float](0).asScala.toSeq
    val rest = emb.filter($"vec_id" =!= 0)
    val idx = IvfIndex.build(rest, "embedding", "vec_id", k = 8)
    val exact = VectorFunctions.bruteForceTopK(rest, "embedding", "vec_id", qv, 10)
      .select("vec_id").as[Long].collect().toSet
    val approx = IvfIndex.topK(idx.indexed, idx.centroids, "embedding", "vec_id", qv,
      k = 10, nprobe = 4).select("vec_id").as[Long].collect().toSet
    val recall = (exact intersect approx).size / 10.0
    assert(recall >= 0.3, s"recall@10 with half the clusters probed was $recall")
  }
}
