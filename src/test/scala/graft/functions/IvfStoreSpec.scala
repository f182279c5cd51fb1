package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvfStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  private def tmpStore(): String =
    java.nio.file.Files.createTempDirectory("ivfstore").toString + "/ivf"

  private def qv: Seq[Float] = {
    import scala.jdk.CollectionConverters._
    emb.filter($"vec_id" === 0).select("embedding")
      .collect()(0).getList[Float](0).asScala.toSeq
  }

  test("served topK ≡ in-session IvfIndex.topK (same corpus, same params)") {
    val store = tmpStore()
    val rest = emb.filter($"vec_id" =!= 0)
    IvfStore.build(rest, "embedding", "vec_id", store, k = 8, iterations = 2)
    val idx = IvfIndex.build(rest, "embedding", "vec_id", k = 8, iterations = 2)
    try {
      for (nprobe <- Seq(1, 2, 8)) {
        val served = IvfStore.topK(spark, store, qv, k = 10, nprobe = nprobe)
          .as[(Long, Double)].collect().toSeq
        val inSession = IvfIndex.topK(idx.indexed, idx.centroids, "embedding",
          "vec_id", qv, k = 10, nprobe = nprobe)
          .as[(Long, Double)].collect().toSeq
        assert(served == inSession, s"nprobe=$nprobe")
      }
    } finally idx.close()
  }

  test("probe is a partition-pruned scan: only nprobe cluster dirs read") {
    val store = tmpStore()
    IvfStore.build(emb, "embedding", "vec_id", store, k = 8)
    val df = IvfStore.topK(spark, store, qv, k = 5, nprobe = 2)
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a file scan in the probe plan")
    val scanned = scans.map(_.selectedPartitions.partitionCount).sum
    val total = IvfStore.readVectors(spark, store)
      .select("cluster").distinct().count()
    assert(scanned <= 2, s"probe must read at most nprobe=2 cluster " +
      s"partitions, read $scanned of $total")
    assert(total > 2, "test needs more clusters than nprobe to prove pruning")
    // and the plan carries the partition filter, not a post-scan filter
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains("cluster"),
      s"expected cluster partition filters in:\n$planStr")
  }

  test("append with frozen centroids: served results absorb the batch; " +
      "replayed batch ids no-op; compaction is content-invariant") {
    val store = tmpStore()
    val base = emb.filter($"vec_id" < 300)
    val extra = emb.filter($"vec_id" >= 300 && $"vec_id" < 400)
    IvfStore.build(base, "embedding", "vec_id", store, k = 4)
    IvfStore.append(extra, store, batchId = 1L)
    assert(IvfStore.readVectors(spark, store).count() ==
      base.count() + extra.count())
    val before = IvfStore.topK(spark, store, qv, k = 10, nprobe = 4)
      .as[(Long, Double)].collect().toSeq
    // replay: same batch id again must not duplicate rows or change results
    IvfStore.append(extra, store, batchId = 1L)
    assert(IvfStore.readVectors(spark, store).count() ==
      base.count() + extra.count(), "replayed batch must no-op")
    // compaction folds ab= trees; probe results identical
    IvfStore.compactStore(spark, store)
    val after = IvfStore.topK(spark, store, qv, k = 10, nprobe = 4)
      .as[(Long, Double)].collect().toSeq
    assert(after == before, "compaction must not change probe results")
    // the vectors tree now holds exactly one (negative) generation
    val gens = IvfStore.readVectors(spark, store).count()
    assert(gens == base.count() + extra.count())
    // post-compaction replay (crash after compact, before the stream
    // checkpoint committed): the folded-away batch id must STILL be a
    // recognized no-op — retired tombstones, not re-ingestion
    IvfStore.append(extra, store, batchId = 1L)
    assert(IvfStore.readVectors(spark, store).count() ==
      base.count() + extra.count(),
      "replay of a compacted-away batch must no-op")
    assert(IvfStore.topK(spark, store, qv, k = 10, nprobe = 4)
      .as[(Long, Double)].collect().toSeq == before)
  }

  test("append assignment uses the FROZEN centroids (bit-equal to a " +
      "build-session assign of the same rows)") {
    val store = tmpStore()
    val base = emb.filter($"vec_id" < 300)
    val extra = emb.filter($"vec_id" >= 300 && $"vec_id" < 350)
    IvfStore.build(base, "embedding", "vec_id", store, k = 4)
    IvfStore.append(extra, store, batchId = 7L)
    // assigning the extra rows against the recreated centroid frame in
    // THIS session must reproduce the stored clusters exactly
    val expected = IvfIndex.assign(extra,
        broadcast(IvfStore.centroidsDf(spark, store)), "embedding", "vec_id")
      .select(col("vec_id"), col("cluster_id").cast("long").as("cluster"))
      .as[(Long, Long)].collect().toSet
    val stored = IvfStore.readVectors(spark, store)
      .join(extra.select("vec_id"), Seq("vec_id"), "left_semi")
      .select(col("vec_id"), col("cluster").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(stored == expected)
  }

  test("crash-shape guards: absent store rejects reads/appends; batchId " +
      "contract enforced") {
    val store = tmpStore()
    intercept[IllegalArgumentException](IvfStore.topK(spark, store, qv, 5))
    intercept[IllegalArgumentException](
      IvfStore.append(emb, store, batchId = 1L))
    IvfStore.build(emb.filter($"vec_id" < 100), "embedding", "vec_id",
      store, k = 2)
    intercept[IllegalArgumentException](
      IvfStore.append(emb, store, batchId = 0L))
    intercept[IllegalArgumentException](
      IvfStore.append(emb, store, batchId = -3L))
  }

  test("retrain: re-anchored store serves identically to a fresh build " +
      "pinning the same anchors; superseded dirs swept; folded ids " +
      "stay tombstoned") {
    val coarse = tmpStore(); val fine = tmpStore()
    val base = emb.filter($"vec_id" < 300)
    val extra = emb.filter($"vec_id" >= 300)
    IvfStore.build(base, "embedding", "vec_id", coarse, k = 2, iterations = 1)
    IvfStore.append(extra, coarse, 1L)
    // the re-anchor target: a fresh k=8 index over the SAME vectors —
    // after retrain the coarse store must be indistinguishable from it
    IvfStore.build(emb, "embedding", "vec_id", fine, k = 8, iterations = 2)
    IvfStore.retrain(spark, coarse, IvfStore.centroidsDf(spark, fine))
    for (nprobe <- Seq(1, 2, 4, 8)) {
      val a = IvfStore.topK(spark, coarse, qv, 10, nprobe)
        .as[(Long, Double)].collect().toSeq
      val b = IvfStore.topK(spark, fine, qv, 10, nprobe)
        .as[(Long, Double)].collect().toSeq
      assert(a == b, s"retrained ≠ fresh build at nprobe=$nprobe")
    }
    // one negative generation on disk; the swap swept the old dirs
    val dirs = new java.io.File(coarse + "/vectors").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("ab="))
      .map(_.getName)
    assert(dirs.toList == List("ab=-1"), dirs.mkString(","))
    // batch 1 was folded into the generation: a replay must not re-land
    val n = IvfStore.readVectors(spark, coarse).count()
    IvfStore.append(extra, coarse, 1L)
    assert(IvfStore.readVectors(spark, coarse).count() == n,
      "replayed folded batch must stay a no-op after retrain")
    // geometry guards: wrong dim / dup ids / non-positive ids refuse
    intercept[IllegalArgumentException](IvfStore.retrain(spark, coarse,
      Seq((1L, Seq(0.0, 1.0))).toDF("cluster_id", "centroid")))
    intercept[IllegalArgumentException](IvfStore.retrain(spark, coarse,
      IvfStore.centroidsDf(spark, fine).withColumn("cluster_id", lit(1L))))
    intercept[IllegalArgumentException](IvfStore.retrain(spark, coarse,
      IvfStore.centroidsDf(spark, fine)
        .withColumn("cluster_id", col("cluster_id") - 1L)))
    // GAPPED ids (2, 4, 6, …) refuse too: ids must be exactly 1..k —
    // a gap would be silently filled with a zero centroid that can win
    // assignments (small-norm vectors) and distort probes
    intercept[IllegalArgumentException](IvfStore.retrain(spark, coarse,
      IvfStore.centroidsDf(spark, fine)
        .withColumn("cluster_id", col("cluster_id") * 2L)))
  }
}
