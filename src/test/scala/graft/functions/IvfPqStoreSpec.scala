package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvfPqStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet(sf("sf0.01") + "/embeddings.parquet")
    .filter(col("embedding").isNotNull)

  private def tmpStore(): String =
    java.nio.file.Files.createTempDirectory("ivfpq").toString + "/s"

  private def qv: Seq[Float] = {
    import scala.jdk.CollectionConverters._
    emb.filter(col("vec_id") === 0).select("embedding")
      .collect()(0).getList[Float](0).asScala.toSeq
  }

  test("the shipped auto defaults resolve as documented: ksub = " +
      "min(256, train), auto shortlist = 0.7·scanned ≡ its explicit " +
      "value, stable across an append") {
    val store = tmpStore()
    // all defaults: k = 0 (√n), ksub = 0 (auto), built on 2/3 of the
    // corpus so an append can grow `scanned` under the auto shortlist
    IvfPqStore.build(emb.filter($"vec_id" % 3 =!= 0), "embedding",
      "vec_id", store)
    // sf0.01 leaves ~333 training vectors >= 256: the byte is filled
    assert(PqIndex.loadCodebooks(spark, store).ksub == 256)
    def probed(k: Int, nprobe: Int): Long = {
      // replicate topK's probe selection to compute `scanned` exactly
      val ids = IvfStore.centroidsDf(spark, store)
        .withColumn("__sim",
          graft.plans.CosineSimilarity(col("centroid"),
            array(qv.map(v => lit(v)): _*)))
        .orderBy(col("__sim").desc_nulls_last, col("cluster_id").asc)
        .limit(nprobe).select("cluster_id").as[Long].collect().toSeq
      val m = IvfStore.readMeta(spark, store)
      spark.read.parquet(store + "/codes")
        .filter(col("ab").isin(m.batches: _*) &&
          col("cluster").isin(ids: _*)).count()
    }
    def topAuto() = IvfPqStore.topK(spark, store, qv, k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    def topAt(sl: Int) = IvfPqStore.topK(spark, store, qv, k = 10,
        nprobe = 4, shortlist = sl)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val sl0 = math.max(40L, math.ceil(0.7 * probed(10, 4)).toLong).toInt
    assert(topAuto() == topAt(sl0), "auto ≡ resolved explicit shortlist")
    // append the held-out third: scanned grows, the auto rule follows
    IvfPqStore.append(emb.filter($"vec_id" % 3 === 0), store, 1L)
    val sl1 = math.max(40L, math.ceil(0.7 * probed(10, 4)).toLong).toInt
    assert(topAuto() == topAt(sl1),
      "auto must track the post-append scanned count")
  }

  test("served topK ≡ the in-session IVF×PQ composition (identical " +
      "probe, codes, ADC and refine arithmetic)") {
    val store = tmpStore()
    IvfPqStore.build(emb, "embedding", "vec_id", store,
      k = 8, iterations = 2, m = 8, ksub = 16, pqIterations = 3)
    val served = IvfPqStore.topK(spark, store, qv, k = 10, nprobe = 4,
        shortlist = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ivf = IvfIndex.build(emb, "embedding", "vec_id", k = 8,
      iterations = 2)
    try {
      val q = array(qv.map(v => lit(v)): _*)
      val probe = ivf.centroids
        .withColumn("__sim", graft.plans.CosineSimilarity(col("centroid"), q))
        .orderBy(col("__sim").desc_nulls_last, col("cluster_id").asc)
        .limit(4).select("cluster_id")
      val cb = PqIndex.train(ivf.indexed, "embedding", "vec_id",
        m = 8, ksub = 16, iterations = 3)
      val probed = PqIndex.encode(ivf.indexed, "embedding", cb)
        .join(broadcast(probe), Seq("cluster_id"), "left_semi")
      val inSession = PqIndex.adcRefineTopK(probed, "embedding", "vec_id",
          cb, qv, k = 10, shortlist = 50)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(served == inSession,
        s"served $served\nin-session $inSession")
      assert(served.nonEmpty)
    } finally ivf.close()
  }

  test("append with both layers frozen ≡ build-all at full probe; " +
      "replayed batchId no-ops") {
    val all = emb.filter($"vec_id" < 400)
    val storeA = tmpStore(); val storeB = tmpStore()
    IvfPqStore.build(all, "embedding", "vec_id", storeA, k = 4,
      m = 8, ksub = 16)
    // B: same centroids/codebooks trained on the SAME base corpus,
    // then the remainder appended frozen
    IvfPqStore.build(all, "embedding", "vec_id", storeB, k = 4,
      m = 8, ksub = 16)
    val extra = emb.filter($"vec_id" >= 400 && $"vec_id" < 450)
    IvfPqStore.append(extra, storeB, batchId = 1L)
    IvfPqStore.append(extra, storeB, batchId = 1L) // replay: no-op
    val full = IvfPqStore.topK(spark, storeB, qv, k = 10, nprobe = 4,
      shortlist = 500).collect()
    assert(full.length == 10)
    // the appended ids are servable: probe for a vector FROM the batch
    import scala.jdk.CollectionConverters._
    val qExtra = emb.filter($"vec_id" === 410).select("embedding")
      .collect()(0).getList[Float](0).asScala.toSeq
    val hits = IvfPqStore.topK(spark, storeB, qExtra, k = 1, nprobe = 4,
      shortlist = 500).collect()
    assert(hits.head.getLong(0) == 410L && hits.head.getDouble(1) == 0.0)
    // base store is untouched by B's append
    assert(IvfPqStore.topK(spark, storeA, qv, k = 10, nprobe = 4,
      shortlist = 500).collect().length == 10)
  }

  test("a probe scans only the nprobe winning cluster partitions — " +
      "codes AND vectors layers both prune") {
    val store = tmpStore()
    IvfPqStore.build(emb, "embedding", "vec_id", store, k = 8,
      m = 8, ksub = 16)
    val df = IvfPqStore.topK(spark, store, qv, k = 5, nprobe = 2,
      shortlist = 20)
    df.collect()
    // AQE wraps the joined plan: unwrap adaptive roots and query stages
    // to reach the actual file scans
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p.flatMap {
      case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      case s: QueryStageExec => scansOf(s.plan)
      case f: FileSourceScanExec => Seq(f)
      case _ => Seq.empty
    }
    val scans = scansOf(df.queryExecution.executedPlan)
    assert(scans.size >= 2, "expected codes + vectors scans")
    scans.foreach { f =>
      assert(f.selectedPartitions.partitionCount <= 2,
        s"each layer must read at most nprobe=2 cluster partitions, " +
          s"read ${f.selectedPartitions.partitionCount}")
    }
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") &&
      planStr.contains("cluster"),
      s"expected cluster partition filters in:\n$planStr")
  }

  test("crash order: without the codebook manifest the PQ layer is " +
      "absent and refuses friendly; the plain IVF layer still serves") {
    val store = tmpStore()
    IvfStore.build(emb, "embedding", "vec_id", store, k = 4)
    assert(!IvfPqStore.pqLayerExists(spark, store))
    val e = intercept[IllegalArgumentException] {
      IvfPqStore.topK(spark, store, qv, k = 5)
    }
    assert(e.getMessage.contains("no IVF×PQ store"))
    intercept[IllegalArgumentException] {
      IvfPqStore.append(emb.limit(5), store, 1L)
    }
    assert(IvfStore.topK(spark, store, qv, k = 5, nprobe = 4)
      .collect().length == 5)
  }

  test("compaction folds both layers; probes identical before and " +
      "after; superseded codes dirs swept") {
    val store = tmpStore()
    IvfPqStore.build(emb.filter($"vec_id" < 300), "embedding", "vec_id",
      store, k = 4, m = 8, ksub = 16)
    IvfPqStore.append(emb.filter($"vec_id" >= 300 && $"vec_id" < 380),
      store, batchId = 1L)
    val before = IvfPqStore.topK(spark, store, qv, k = 10, nprobe = 4,
      shortlist = 100).collect().map(_.toSeq).toSeq
    IvfPqStore.compactStore(spark, store)
    val after = IvfPqStore.topK(spark, store, qv, k = 10, nprobe = 4,
      shortlist = 100).collect().map(_.toSeq).toSeq
    assert(after == before)
    val dirs = new java.io.File(store + "/codes").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("ab=-1"), s"superseded dirs must sweep: $dirs")
    // post-compaction replay of the folded-away batch id (crash after
    // compact, before the stream checkpoint committed) must no-op in
    // BOTH layers — retired tombstones keep the id recognized
    IvfPqStore.append(emb.filter($"vec_id" >= 300 && $"vec_id" < 380),
      store, batchId = 1L)
    assert(IvfPqStore.topK(spark, store, qv, k = 10, nprobe = 4,
        shortlist = 100).collect().map(_.toSeq).toSeq == before,
      "replay of a compacted-away batch must not duplicate codes")
    val dirs2 = new java.io.File(store + "/codes").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs2 == Set("ab=-1"), s"replay must not create new dirs: $dirs2")
  }

  test("retrain moves BOTH layers under one swap: full-probe results " +
      "invariant (codes bytes never change), layers stay keyed " +
      "identically, plain IvfStore.retrain refuses") {
    val store = tmpStore()
    IvfPqStore.build(emb.filter($"vec_id" < 300), "embedding", "vec_id",
      store, k = 2, m = 8, ksub = 16)
    IvfPqStore.append(emb.filter($"vec_id" >= 300 && $"vec_id" < 380),
      store, batchId = 1L)
    // full probe = exact over the content: the invariant yardstick
    val before = IvfPqStore.topK(spark, store, qv, k = 10, nprobe = 2,
      shortlist = 100).collect().map(_.toSeq).toSeq
    // the plain vectors-only path must refuse — it would strand the
    // codes layer on dead partitions
    val fresh = IvfIndex.build(emb.filter($"vec_id" < 380), "embedding",
      "vec_id", k = 8, iterations = 2)
    try {
      intercept[IllegalArgumentException](
        IvfStore.retrain(spark, store, fresh.centroids))
      IvfPqStore.retrain(spark, store, fresh.centroids)
    } finally fresh.close()
    val meta = IvfStore.readMeta(spark, store)
    assert(meta.k == 8 && meta.batches.length == 1 &&
      meta.batches.head < 0L && meta.retired.contains(1L))
    // full probe over the re-anchored layout: same content, same
    // codebooks, same ADC arithmetic — identical results
    val after = IvfPqStore.topK(spark, store, qv, k = 10, nprobe = 8,
      shortlist = 100).collect().map(_.toSeq).toSeq
    assert(after == before,
      "re-anchoring moves bytes, not content: full probe must not move")
    // the two layers stay keyed identically: every id in the same
    // (ab, cluster) partition in both
    val vecKeys = spark.read.parquet(store + "/vectors")
      .select($"vec_id", $"ab", $"cluster")
    val codeKeys = spark.read.parquet(store + "/codes")
      .select($"vec_id".as("cid"), $"ab".as("cab"),
        $"cluster".as("ccluster"))
    val joined = vecKeys.join(codeKeys, $"vec_id" === $"cid", "full")
    assert(joined.filter($"vec_id".isNull || $"cid".isNull ||
        $"ab" =!= $"cab" || $"cluster" =!= $"ccluster").isEmpty,
      "codes and vectors must carry identical (id, ab, cluster) keys")
    // probes still prune to nprobe partitions on the NEW layout
    // (AQE wraps the joined plan — unwrap to the file scans)
    val pruned = IvfPqStore.topK(spark, store, qv, k = 5, nprobe = 2,
      shortlist = 100)
    pruned.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p.flatMap {
      case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      case s: QueryStageExec => scansOf(s.plan)
      case f: FileSourceScanExec => Seq(f)
      case _ => Seq.empty
    }
    val scans = scansOf(pruned.queryExecution.executedPlan)
    assert(scans.nonEmpty &&
      scans.forall(_.selectedPartitions.partitionCount <= 2),
      "retrained probe must stay partition-pruned")
  }
}
