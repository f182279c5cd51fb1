package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Stateful streaming on the RocksDB state store provider — the
  * production backend for large state (the default HDFS-backed store
  * keeps every key in executor heap; RocksDB spills to local SSD and
  * bounds memory by block cache, the difference between 10 M and 10 B
  * distinct keys at 100 TB). The provider is a session-level conf, so
  * this spec builds its own session (same pattern as
  * GraftExtensionsSpec).
  */
class RocksDbStateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-rocksdb-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
  }

  override protected def withFixture(test: NoArgTest) = {
    val res = super.withFixture(test)
    spark.stop()
    res
  }

  test("stateful dedup runs on RocksDB state (provider engaged, exact results)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("rocks-ckpt").toString
    val mem = MemoryStream[(Long, Long, Double)]
    val deduped = StreamOps.dedupStream(
      mem.toDF().toDF("event_id", "user_id", "value"), Seq("event_id"))
    val q = deduped.writeStream
      .format("memory").queryName("rocks_out").outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    mem.addData((1L, 10L, 1.0), (2L, 10L, 2.0), (1L, 10L, 1.0))
    q.processAllAvailable()
    mem.addData((2L, 10L, 2.0), (3L, 11L, 3.0)) // 2 is a cross-batch dup
    q.processAllAvailable()
    val rocksMetrics = Option(q.lastProgress)
      .toSeq.flatMap(_.stateOperators.toSeq)
      .flatMap(_.customMetrics.keySet().toArray.map(_.toString))
      .filter(_.toLowerCase.startsWith("rocksdb"))
    q.stop()
    val out = spark.table("rocks_out").select("event_id")
      .as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 2L, 3L),
      "within- and cross-batch duplicates must drop exactly once")
    assert(rocksMetrics.nonEmpty,
      "state operator must report rocksdb* custom metrics — the provider is engaged")
  }
}
