package graft.streaming

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Tables

/** Runnable streaming pipeline over the driver testdata: the events
  * parquet replayed through a FILE streaming source (readStream) into a
  * windowed aggregation landing in a parquet sink with checkpointing —
  * the deployment shape of the engine's streaming surface.
  *
  * Usage: runMain graft.streaming.StreamDemo [sfDir]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local(4)

    val work = java.nio.file.Files.createTempDirectory("stream_demo")
    val srcDir = work.resolve("in").toString
    val outDir = work.resolve("out").toString
    val ckpt = work.resolve("ckpt").toString

    // land the batch events as the stream's backing files (ts normalized
    // to µs so the streaming schema is a proper TimestampType)
    val batch = Tables.events(spark, sfDir)
    batch.write.parquet(srcDir)

    val stream = spark.readStream
      .schema(batch.schema)
      .option("maxFilesPerTrigger", "2") // several micro-batches, not one
      .parquet(srcDir)

    val agg = StreamOps.tumblingCounts(stream, "1 hour", watermark = Some("30 minutes"))

    val q = agg.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()

    val result = spark.read.schema(agg.schema).parquet(outDir)
    val n = result.count()
    val total = Option(result.agg(sum("n")).head.get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    println(s"[stream-demo] windows=$n events_counted=$total (append mode drops " +
      "windows newer than the final watermark; a live stream would flush them)")
    result.orderBy("w_start").show(5, truncate = false)
    spark.stop()
  }
}
