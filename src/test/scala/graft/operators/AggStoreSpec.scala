package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AggStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("aggstore").toString + "/s"

  private def serveMap(store: String) =
    AggStore.serve(spark, store)
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("append x2 == one-pass aggregation of the union; replay no-ops; compaction invariant") {
    val store = tmp()
    val b1 = Seq(("a", 1.5), ("a", 2.5), ("b", 10.0)).toDF("g", "v")
    val b2 = Seq(("a", 6.0), ("c", 3.0)).toDF("g", "v")
    AggStore.append(b1, Seq("g"), "v", store, 1L)
    AggStore.append(b2, Seq("g"), "v", store, 2L)
    val expected = Map(
      "a" -> ((3L, 10.0, 3.3333, 1.5, 6.0)),
      "b" -> ((1L, 10.0, 10.0, 10.0, 10.0)),
      "c" -> ((1L, 3.0, 3.0, 3.0, 3.0)))
    assert(serveMap(store) == expected)

    // batchId replay is a completed append: state unchanged
    AggStore.append(b1.limit(1), Seq("g"), "v", store, 2L)
    assert(serveMap(store) == expected)

    // compaction folds to one generation, serve identical, dirs swept
    AggStore.compactStore(spark, store)
    assert(serveMap(store) == expected)
    val dirs = new java.io.File(store + "/partials").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("ab=")).map(_.getName)
    assert(dirs.toList == List("ab=-1"), dirs.mkString(","))

    // post-compaction appends keep merging correctly
    AggStore.append(Seq(("a", 0.5)).toDF("g", "v"), Seq("g"), "v", store, 3L)
    assert(serveMap(store)("a") == ((4L, 10.5, 2.625, 0.5, 6.0)))
  }

  test("schema pinning: wrong keys or measure fail fast; missing store fails loud") {
    val store = tmp()
    val df = Seq(("a", 1.0)).toDF("g", "v")
    AggStore.append(df, Seq("g"), "v", store, 1L)
    intercept[IllegalArgumentException](
      AggStore.append(df.withColumnRenamed("g", "h"), Seq("h"), "v", store, 2L))
    intercept[IllegalArgumentException](
      AggStore.append(df.withColumn("w", lit(1.0)), Seq("g"), "w", store, 2L))
    intercept[IllegalArgumentException](AggStore.serve(spark, tmp()))
  }

  test("empty batches never create a store nor corrupt one (r12 " +
    "skeleton-store guard)") {
    val store = tmp()
    val empty = Seq.empty[(String, Double)].toDF("g", "v")
    AggStore.append(empty, Seq("g"), "v", store, 1L)
    assert(!AggStore.storeExists(spark, store),
      "a rows-less first append must not manifest an unreadable store")
    AggStore.append(Seq(("a", 1.0)).toDF("g", "v"), Seq("g"), "v", store, 2L)
    AggStore.append(empty, Seq("g"), "v", store, 3L) // later empties no-op
    assert(serveMap(store) == Map("a" -> ((1L, 1.0, 1.0, 1.0, 1.0))))
  }

  test("null values: count skips them, sums unaffected") {
    val store = tmp()
    val df = Seq(("a", Some(2.0)), ("a", None), ("b", None))
      .toDF("g", "v")
    AggStore.append(df, Seq("g"), "v", store, 1L)
    val a = AggStore.serve(spark, store).filter($"g" === "a").collect().head
    assert((a.getAs[Long]("n"), a.getAs[Double]("total"),
      a.getAs[Double]("mean"), a.getAs[Double]("vmin"),
      a.getAs[Double]("vmax")) == ((1L, 2.0, 2.0, 2.0, 2.0)))
    // group b has zero non-null values: n=0, null stats
    val b = AggStore.serve(spark, store).filter($"g" === "b").collect().head
    assert(b.getAs[Long]("n") == 0L && b.isNullAt(b.fieldIndex("total")))
  }

  test("aggSink: streamed micro-batches == batch appends of the same chunks") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val store = tmp()
    val ck = java.nio.file.Files.createTempDirectory("aggck").toString
    val mem = MemoryStream[(String, Double)]
    val q = graft.streaming.StreamOps.aggSink(
      mem.toDF().toDF("g", "v"), Seq("g"), "v", store, ck)
    mem.addData(("a", 1.0), ("b", 2.0))
    q.processAllAvailable()
    mem.addData(("a", 3.0))
    q.processAllAvailable()
    q.stop()

    val batchStore = tmp()
    AggStore.append(Seq(("a", 1.0), ("b", 2.0)).toDF("g", "v"),
      Seq("g"), "v", batchStore, 1L)
    AggStore.append(Seq(("a", 3.0)).toDF("g", "v"),
      Seq("g"), "v", batchStore, 2L)
    assert(serveMap(store) == serveMap(batchStore))
  }
}
