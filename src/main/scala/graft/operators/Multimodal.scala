package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads + typed metadata struct, with decode / feature-extraction /
  * resize / frame-sampling operators.
  *
  * The decode step is STUBBED (this environment has no image/audio
  * codecs): `fakeDecode` derives deterministic "pixels" from the payload
  * bytes so the full pipeline — schema, partition-iterator batch shape,
  * column pruning, feature vectors feeding the similarity operators — is
  * real and tested end-to-end. Swap `decodeBatch` for a codec-backed
  * implementation (e.g. JNI/JavaCV) without touching the dataflow.
  *
  * Scale notes: payloads stay on executors end-to-end (no collect);
  * operators are mapPartitions so a codec can amortize per-batch init
  * (model load, decoder contexts) across a whole partition — the JVM
  * analog of pandas-UDF batching; metadata-only queries never touch the
  * binary column (parquet column pruning).
  */
object Multimodal {

  /** Canonical multimodal schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType, nullable = false),     // image|audio|video
      StructField("mime", StringType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("source_uri", StringType, nullable = true))), nullable = false)))

  /** Deterministic synthetic media frame derived from the documents table
    * (payload = utf8 bytes of the text; metadata derived from lengths) —
    * gives the pipeline real binary columns without codec input files. */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        lit("application/octet-stream").as("mime"),
        (col("n_chars") % 640 + 16).cast("int").as("width"),
        (col("n_chars") % 480 + 16).cast("int").as("height"),
        (col("n_chars") * 10).cast("long").as("duration_ms"),
        concat(lit("synthetic://"), col("source")).as("source_uri")).as("meta"))

  /** Decoded-frame record: fixed-size feature grid per media item. */
  case class DecodedFrame(media_id: Long, frame_no: Int, pixels: Array[Float])

  /** STUB decoder for one payload — deterministic bytes→"pixels" hash
    * expansion standing in for a real codec. Real implementation would
    * decode `payload` according to `mime`. */
  private[operators] def fakeDecode(mediaId: Long, payload: Array[Byte],
                                    frames: Int, dim: Int): Iterator[DecodedFrame] = {
    (0 until frames).iterator.map { f =>
      val px = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        val b = if (payload.isEmpty) 0 else payload((f * dim + i) % payload.length) & 0xff
        px(i) = ((b * 31 + f * 7 + i) % 256) / 255.0f
        i += 1
      }
      DecodedFrame(mediaId, f, px)
    }
  }

  /** Decode (stub) + frame-sample: every media row → `frames` rows of
    * `dim`-length float features. mapPartitions so a real codec can hold
    * per-partition state (decoder context, model weights). */
  def decodeFrames(media: DataFrame, frames: Int = 4, dim: Int = 64): Dataset[DecodedFrame] = {
    implicit val enc = Encoders.product[DecodedFrame]
    media.select("media_id", "payload").mapPartitions { rows =>
      // per-partition init would go here (codec/model handle)
      rows.flatMap { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
        fakeDecode(id, payload, frames, dim)
      }
    }
  }

  /** Mean-pool frame features into one embedding per media item — output
    * feeds VectorFunctions / similarity search directly. The output
    * dimension is whatever the frames carry (taken from the first frame
    * of each group). */
  def frameEmbeddings(decoded: Dataset[DecodedFrame]): DataFrame = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded
      .groupByKey(_.media_id)
      .mapGroups { (id, frames) =>
        var acc: Array[Float] = null
        var n = 0
        frames.foreach { fr =>
          if (acc == null) acc = new Array[Float](fr.pixels.length)
          var i = 0
          val m = math.min(acc.length, fr.pixels.length)
          while (i < m) { acc(i) += fr.pixels(i); i += 1 }
          n += 1
        }
        if (acc == null) acc = Array.emptyFloatArray
        if (n > 0) { var i = 0; while (i < acc.length) { acc(i) /= n; i += 1 } }
        (id, acc.toSeq)
      }
      .toDF("media_id", "embedding")
  }

  /** "Resize": deterministic re-sampling of the stubbed pixel grid
    * (nearest-neighbor over the feature vector) — the plumbing for a real
    * resize kernel. */
  def resizeFrames(decoded: Dataset[DecodedFrame], newDim: Int): Dataset[DecodedFrame] = {
    implicit val enc = Encoders.product[DecodedFrame]
    decoded.map { fr =>
      if (fr.pixels.isEmpty) {
        // nothing to sample from (dim=0 stub, or a real decoder emitting an
        // empty frame): keep emptiness rather than fabricate pixels
        DecodedFrame(fr.media_id, fr.frame_no, Array.emptyFloatArray)
      } else {
        val out = new Array[Float](newDim)
        var i = 0
        while (i < newDim) {
          out(i) = fr.pixels((i.toLong * fr.pixels.length / newDim).toInt)
          i += 1
        }
        DecodedFrame(fr.media_id, fr.frame_no, out)
      }
    }
  }

  /** 64-bit difference hash (dHash) over a decoded feature grid: bit i
    * is set when the (i+1)-th of 65 evenly-sampled grid values exceeds
    * the i-th — the classic gradient perceptual hash, invariant to
    * uniform brightness/level shifts (only RELATIVE order of adjacent
    * samples matters). Empty grids hash to 0. Deterministic pure
    * function of the grid, so replays and cross-partition runs agree. */
  private[graft] def dHash64(px: Array[Float]): Long = {
    if (px == null || px.isEmpty) 0L
    else {
      var h = 0L
      var i = 0
      while (i < 64) {
        val a = px((i.toLong * px.length / 65).toInt)
        val b = px(((i + 1).toLong * px.length / 65).toInt)
        if (b > a) h |= (1L << i)
        i += 1
      }
      h
    }
  }

  /** Per-frame perceptual hashes: (media_id, frame_no, phash). */
  def perceptualHash(decoded: Dataset[DecodedFrame]): DataFrame = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.map(fr => (fr.media_id, fr.frame_no, dHash64(fr.pixels)))
      .toDF("media_id", "frame_no", "phash")
  }

  /** Media near-duplicate candidate pairs, end-to-end through the
    * existing dedup machinery: decode (codec seam) → mean-pool frames →
    * dHash the pooled grid → [[Dedup.simHashCandidatePairs]]' pigeonhole
    * block bucketing + exact Hamming gate. One 8-byte signature per
    * media item is all that shuffles — payloads never leave their
    * executors. The hash rides the `simhash` column name so every
    * signature-store / banded-persistence path built for text SimHash
    * works on media unchanged.
    *
    * Approximation contract: near-dup PAYLOADS map to near (small
    * Hamming) hashes only as faithfully as the decode produces stable
    * grids — with the stubbed codec a same-length byte perturbation
    * moves few grid cells (spec-planted and asserted); a real codec
    * inherits the dHash robustness literature. Output: (id_a, id_b,
    * hamming), id_a < id_b. */
  def mediaNearDupPairs(media: DataFrame, maxHamming: Int = 8,
                        frames: Int = 4, dim: Int = 64,
                        maxBucketSize: Int = 10000): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val sigs = frameEmbeddings(decodeFrames(media, frames, dim))
      .as[(Long, Seq[Float])]
      .map { case (id, e) => (id, dHash64(e.toArray)) }
      .toDF("media_id", "simhash")
    Dedup.simHashCandidatePairs(sigs, "media_id", maxHamming, maxBucketSize)
  }

  /** Metadata-only analytics — must not read the payload column (parquet
    * column pruning; assert via explain in specs). */
  def metaStats(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("meta.kind").as("kind"),
      col("meta.width").as("width"), col("meta.duration_ms").as("duration_ms"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"), avg(col("width")).as("avg_width"),
        max(col("duration_ms")).as("max_duration_ms"))
}
