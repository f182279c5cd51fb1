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
}
