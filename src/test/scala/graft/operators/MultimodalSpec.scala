package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media =
    Multimodal.syntheticMedia(spark.read.parquet(sf("sf0.001") + "/documents.parquet"))

  test("synthetic media conforms to the canonical multimodal schema") {
    val s = media.schema
    assert(s("payload").dataType.typeName == "binary")
    val meta = s("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq ==
      Seq("kind", "mime", "width", "height", "duration_ms", "source_uri"))
  }

  test("decodeFrames: frames x dim shape, deterministic across runs") {
    val d1 = Multimodal.decodeFrames(media.limit(10), frames = 3, dim = 16)
    assert(d1.count() == 30)
    val first = d1.filter(_.media_id == 0).collect().sortBy(_.frame_no)
    assert(first.length == 3 && first.forall(_.pixels.length == 16))
    val d2 = Multimodal.decodeFrames(media.limit(10), frames = 3, dim = 16)
      .filter(_.media_id == 0).collect().sortBy(_.frame_no)
    assert(first.map(_.pixels.toSeq).toSeq == d2.map(_.pixels.toSeq).toSeq)
  }

  test("frameEmbeddings mean-pools to one vector per media item") {
    val emb = Multimodal.frameEmbeddings(
      Multimodal.decodeFrames(media.limit(20), frames = 4, dim = 64))
    assert(emb.count() == 20)
    val v = emb.filter($"media_id" === 1).select("embedding")
      .as[Seq[Float]].collect().head
    assert(v.length == 64)
    assert(v.forall(x => x >= 0.0f && x <= 1.0f))
  }

  test("resizeFrames resamples the grid") {
    val d = Multimodal.decodeFrames(media.limit(5), frames = 2, dim = 64)
    val r = Multimodal.resizeFrames(d, newDim = 16)
    assert(r.collect().forall(_.pixels.length == 16))
  }

  test("resizeFrames tolerates empty frames (ADVICE r1: dim=0 / empty decode)") {
    import Multimodal.DecodedFrame
    implicit val enc = org.apache.spark.sql.Encoders.product[DecodedFrame]
    val d = spark.createDataset(Seq(
      DecodedFrame(1L, 0, Array.emptyFloatArray),
      DecodedFrame(1L, 1, Array(0.5f, 0.25f))))
    val out = Multimodal.resizeFrames(d, newDim = 4).collect()
      .map(f => f.frame_no -> f.pixels.toSeq).toMap
    assert(out(0) == Seq.empty, "empty frame stays empty, no AIOOBE")
    assert(out(1).length == 4)
  }

  test("metaStats never reads the payload column (column pruning)") {
    val dir = java.nio.file.Files.createTempDirectory("mm").toString
    media.write.mode("overwrite").parquet(dir)
    val fromDisk = spark.read.parquet(dir)
    val plan = Multimodal.metaStats(fromDisk).queryExecution.executedPlan.toString
    assert(plan.contains("media_id") || plan.contains("ReadSchema"))
    assert(!plan.contains("payload"),
      s"payload must be pruned from the scan:\n$plan")
  }

  test("dHash64: deterministic, brightness-shift invariant, empty -> 0") {
    val px = Array.tabulate(64)(i => (i % 7) / 7.0f)
    val h1 = Multimodal.dHash64(px)
    val h2 = Multimodal.dHash64(px.clone())
    assert(h1 == h2)
    // uniform level shift preserves every adjacent comparison
    val shifted = px.map(_ + 0.3f)
    assert(Multimodal.dHash64(shifted) == h1)
    assert(Multimodal.dHash64(Array.emptyFloatArray) == 0L)
    assert(Multimodal.dHash64(null) == 0L)
  }

  test("mediaNearDupPairs: planted same-length byte perturbations are " +
    "found as near-dup pairs; disjoint payloads never pair") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val base = Multimodal.syntheticMedia(docs)
    // planted: first 10 docs with one same-length char overlay
    val planted = Multimodal.syntheticMedia(
      docs.filter(col("doc_id") < 10)
        .withColumn("doc_id", col("doc_id") + 1000000L)
        .withColumn("text", expr("overlay(text PLACING 'Z' FROM 11)")))
    val pairs = Multimodal.mediaNearDupPairs(base.unionByName(planted),
        maxHamming = 8)
      .as[(Long, Long, Long)].collect()
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    // every planted twin pairs with its original
    for (id <- 0L until 10L)
      assert(pairSet.contains((id, id + 1000000L)),
        s"planted twin $id missing from ${pairSet.size} pairs")
    // disjoint payloads never pair: the pooled grids of two unrelated
    // random-text docs differ in far more than 8 gradient bits
    val sigs = Multimodal.frameEmbeddings(
        Multimodal.decodeFrames(base, frames = 4, dim = 64))
      .as[(Long, Seq[Float])].collect()
      .map { case (id, e) => id -> Multimodal.dHash64(e.toArray) }.toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for ((a, b) <- pairs.map(p => (p._1, p._2)) if a < 1000000L && b < 1000000L) {
      // any base-base pair the blocking emitted really is Hamming-close
      assert(ham(sigs(a), sigs(b)) <= 8)
    }
    // spot-check: a handful of unrelated doc pairs are far apart and absent
    for ((a, b) <- Seq((0L, 7L), (1L, 8L), (2L, 9L)) if ham(sigs(a), sigs(b)) > 8)
      assert(!pairSet.contains((a, b)))
  }
}
