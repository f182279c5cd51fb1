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

  test("k = 0 (default) auto-sizes centroids to max(8, round(sqrt(n))) " +
    "— the measured k-for-scale rule; explicit k still pins geometry") {
    val n = emb.filter(col("embedding").isNotNull).count()
    val want = math.max(8L, math.round(math.sqrt(n.toDouble)))
    val auto = IvfIndex.build(emb, "embedding", "vec_id")
    try assert(auto.centroids.count() == want,
      s"n=$n -> expected $want centroids, got ${auto.centroids.count()}")
    finally auto.close()
    // the floor: a tiny corpus still gets 8 centroids, not 2
    val tiny = IvfIndex.build(emb.filter(col("vec_id") < 5),
      "embedding", "vec_id")
    try assert(tiny.centroids.count() <= 8) // <= : seeds capped by rows
    finally tiny.close()
    intercept[IllegalArgumentException] {
      IvfIndex.build(emb, "embedding", "vec_id", k = -1)
    }
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

  // --- knnJoin -------------------------------------------------------------

  test("knnJoin at full probe ≡ per-query brute force, exactly") {
    val idx = IvfIndex.build(emb, "embedding", "vec_id", k = 8)
    val qs = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val joined = IvfIndex.knnJoin(idx, qs, "query_id", "qvec",
        "embedding", "vec_id", k = 5, nprobe = 8, grid = 6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    import scala.jdk.CollectionConverters._
    qs.collect().foreach { qr =>
      val qid = qr.getLong(0)
      val qv = qr.getList[Float](1).asScala.toSeq
      val exact = VectorFunctions
        .bruteForceTopK(emb, "embedding", "vec_id", qv, 5)
        .select($"vec_id", round($"cosine_sim", 6).as("s"))
        .as[(Long, Double)].collect().toSeq
      // rank-on-rounded-grid can reorder within a rounded tie; compare
      // the (id, sim) SETS and the sim sequence (both are pinned)
      val got = joined(qid).map(t => (t._2, t._3)).toSeq
      assert(got.map(_._2).sorted == exact.map(_._2).sorted,
        s"query $qid sims diverge")
      assert(got.toSet == exact.toSet || got.map(_._2) == exact.map(_._2),
        s"query $qid sets diverge")
      assert(got.head._1 == qid && got.head._2 == 1.0,
        s"query $qid must match itself first")
    }
    idx.close()
  }

  test("knnJoin: pruned probe returns ≤ k rows per query from probed clusters only") {
    val idx = IvfIndex.build(emb, "embedding", "vec_id", k = 8)
    val qs = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val pruned = IvfIndex.knnJoin(idx, qs, "query_id", "qvec",
      "embedding", "vec_id", k = 5, nprobe = 2)
    val counts = pruned.groupBy("query_id").count()
      .as[(Long, Long)].collect().toMap
    assert(counts.values.forall(_ <= 5))
    // every query still matches itself (its own cluster is its nearest)
    val selfTop = pruned.filter($"query_id" === $"vec_id")
      .select("query_id").as[Long].collect().toSet
    assert(selfTop == counts.keySet)
    idx.close()
  }

  test("knnJoin: null query vectors drop; guards reject bad k/nprobe") {
    val idx = IvfIndex.build(emb, "embedding", "vec_id", k = 4)
    val qs = Seq((1L, None: Option[Seq[Float]]))
      .toDF("query_id", "qvec")
    assert(IvfIndex.knnJoin(idx, qs, "query_id", "qvec",
      "embedding", "vec_id", k = 3).count() == 0)
    intercept[IllegalArgumentException] {
      IvfIndex.knnJoin(idx, qs, "query_id", "qvec", "embedding", "vec_id",
        k = 0)
    }
    intercept[IllegalArgumentException] {
      IvfIndex.knnJoin(idx, qs, "query_id", "qvec", "embedding", "vec_id",
        k = 3, nprobe = 0)
    }
    idx.close()
  }

// --- radiusJoin ----------------------------------------------------------

  test("radiusJoin at full probe ≡ per-query brute-force threshold " +
    "filter, exactly; includeSelf; pruned subset; guards") {
    val idx = IvfIndex.build(emb, "embedding", "vec_id", k = 8)
    val qs = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val tau = 0.9
    val got = IvfIndex.radiusJoin(idx, qs, "query_id", "qvec",
        "embedding", "vec_id", threshold = tau, nprobe = 8, grid = 6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (k, v) =>
        k -> v.map(t => (t._2, t._3)).toSet }
    import scala.jdk.CollectionConverters._
    qs.collect().foreach { qr =>
      val qid = qr.getLong(0)
      val qv = qr.getList[Float](1).asScala.toSeq
      val q = array(qv.map(v => lit(v)): _*)
      val exact = emb
        .withColumn("s", round(VectorFunctions.cosine($"embedding", q), 6))
        .filter($"s" >= tau)
        .select($"vec_id", $"s").as[(Long, Double)].collect().toSet
      assert(got.getOrElse(qid, Set.empty) == exact, s"query $qid diverges")
      // the query always finds itself at 1.0
      assert(got(qid).contains((qid, 1.0)))
    }
    // includeSelf = false drops exactly the self matches
    val noSelf = IvfIndex.radiusJoin(idx, qs, "query_id", "qvec",
        "embedding", "vec_id", threshold = tau, nprobe = 8, grid = 6,
        includeSelf = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(noSelf == got.flatMap { case (q2, s) =>
      s.map(t => (q2, t._1)) }.toSet.filterNot(p2 => p2._1 == p2._2))
    // pruned probe returns a subset of the full-probe result
    val pruned = IvfIndex.radiusJoin(idx, qs, "query_id", "qvec",
        "embedding", "vec_id", threshold = tau, nprobe = 2, grid = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val full = got.flatMap { case (q2, s) =>
      s.map(t => (q2, t._1, t._2)) }.toSet
    assert(pruned.subsetOf(full))
    intercept[IllegalArgumentException] {
      IvfIndex.radiusJoin(idx, qs, "query_id", "qvec", "embedding",
        "vec_id", threshold = 1.5)
    }
    intercept[IllegalArgumentException] {
      IvfIndex.radiusJoin(idx, qs, "query_id", "qvec", "embedding",
        "vec_id", threshold = 0.9, nprobe = 0)
    }
    idx.close()
  }
}
