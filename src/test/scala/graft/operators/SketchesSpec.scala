package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // 3 groups × overlapping value ranges; true distincts known exactly
  private def rows(lo: Long, hi: Long) =
    spark.range(lo, hi).select(
      (col("id") % 3).cast("string").as("grp"),
      (col("id") % 5000).as("v"))

  test("union of per-batch sketches estimates EXACTLY like a single-pass sketch") {
    val store = java.nio.file.Files.createTempDirectory("hll").toString + "/s"
    Sketches.appendSketches(rows(0, 4000), Seq("grp"), "v", store, batchId = 1L)
    Sketches.appendSketches(rows(2000, 8000), Seq("grp"), "v", store, batchId = 2L)
    Sketches.appendSketches(rows(6000, 12000), Seq("grp"), "v", store, batchId = 3L)
    val merged = Sketches.distinctCounts(spark, store)
      .as[(String, Long)].collect().toMap
    // single-pass over the union of the same rows
    val all = rows(0, 4000).union(rows(2000, 8000)).union(rows(6000, 12000))
    val single = Sketches.hllSketches(all, Seq("grp"), "v")
      .select(col("grp"), hll_sketch_estimate(col("hll")).as("e"))
      .as[(String, Long)].collect().toMap
    assert(merged == single,
      s"mergeability is exact, not approximate: $merged vs $single")
    // and the estimate is close to truth (distinct v per grp <= 5000/3+1)
    val truth = all.select("grp", "v").distinct()
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    truth.foreach { case (g, t) =>
      assert(math.abs(merged(g) - t).toDouble / t < 0.05,
        s"grp $g: estimate ${merged(g)} vs true $t")
    }
  }

  test("compactStore folds batches into one generation; estimates unchanged; appendable after") {
    val store = java.nio.file.Files.createTempDirectory("hll").toString + "/s"
    Sketches.appendSketches(rows(0, 4000), Seq("grp"), "v", store, batchId = 1L)
    Sketches.appendSketches(rows(2000, 8000), Seq("grp"), "v", store, batchId = 2L)
    Sketches.appendSketches(rows(6000, 12000), Seq("grp"), "v", store, batchId = 3L)
    val before = Sketches.distinctCounts(spark, store)
      .as[(String, Long)].collect().toMap
    def abDirs = new java.io.File(store + "/sketches").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("ab="))
      .map(_.getName).sorted.toSeq
    assert(abDirs == Seq("ab=1", "ab=2", "ab=3"))
    Sketches.compactStore(spark, store)
    assert(abDirs == Seq("ab=-1"), "superseded batch dirs swept")
    assert(Sketches.readMeta(spark, store).batches == Seq(-1L))
    assert(Sketches.distinctCounts(spark, store)
      .as[(String, Long)].collect().toMap == before,
      "sketch union is exact — compaction never moves an estimate")
    Sketches.appendSketches(rows(12000, 15000), Seq("grp"), "v", store, batchId = 4L)
    val after = Sketches.distinctCounts(spark, store)
      .as[(String, Long)].collect().toMap
    assert(after("0") >= before("0"))
    Sketches.compactStore(spark, store)
    assert(abDirs == Seq("ab=-2") &&
      Sketches.distinctCounts(spark, store)
        .as[(String, Long)].collect().toMap == after)
  }

  test("replay no-ops; orphan batches are invisible; guards fail fast") {
    val store = java.nio.file.Files.createTempDirectory("hll").toString + "/s"
    Sketches.appendSketches(rows(0, 3000), Seq("grp"), "v", store, batchId = 1L)
    val before = Sketches.distinctCounts(spark, store)
      .as[(String, Long)].collect().toMap
    // replay of a manifested batch changes nothing (even with new data)
    Sketches.appendSketches(rows(0, 12000), Seq("grp"), "v", store, batchId = 1L)
    assert(Sketches.distinctCounts(spark, store)
      .as[(String, Long)].collect().toMap == before)
    // a crashed append's orphan partition (data landed, no manifest) is
    // invisible to queries
    Sketches.hllSketches(rows(0, 12000), Seq("grp"), "v")
      .withColumn("ab", lit(77L))
      .write.mode("append").partitionBy("ab").parquet(store + "/sketches")
    assert(Sketches.distinctCounts(spark, store)
      .as[(String, Long)].collect().toMap == before,
      "unmanifested sketches must not merge in")
    // …and the replayed batch id 77 dynamically overwrites its own orphan
    Sketches.appendSketches(rows(3000, 6000), Seq("grp"), "v", store, batchId = 77L)
    val after = Sketches.distinctCounts(spark, store)
      .as[(String, Long)].collect().toMap
    assert(after("0") > before("0"))
    // lgK / keys pinned at creation
    intercept[IllegalArgumentException] {
      Sketches.appendSketches(rows(0, 10), Seq("grp"), "v", store,
        batchId = 9L, lgK = 14)
    }
    intercept[IllegalArgumentException] {
      Sketches.appendSketches(rows(0, 10).withColumnRenamed("grp", "g2"),
        Seq("g2"), "v", store, batchId = 9L)
    }
    // absent store fails friendly
    val absent = java.nio.file.Files.createTempDirectory("hll").toString + "/nope"
    val e = intercept[IllegalArgumentException] {
      Sketches.distinctCounts(spark, absent)
    }
    assert(e.getMessage.contains("no sketch store"))
  }

  // --- count-min sketch ----------------------------------------------------

  private def cmsRows = (1 to 600).map(i =>
    ((i % 2).toString, (i % 37).toString)).toDF("g", "item")

  test("cms: every estimate >= exact; exact at generous width " +
    "(deterministic hashing — passes once, passes forever)") {
    val exact = cmsRows.groupBy("g", "item").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // collision-heavy narrow sketch: >= always
    val narrow = Sketches.cmsEstimate(
        Sketches.cmsCounts(cmsRows, Seq("g"), "item", depth = 4, width = 8),
        cmsRows.select("g", "item"), Seq("g"), "item", depth = 4, width = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(narrow.keySet == exact.keySet)
    narrow.foreach { case (k, est) => assert(est >= exact(k), s"$k") }
    assert(narrow.exists { case (k, est) => est > exact(k) }) // width 8 MUST collide
    // 37 items into 4096 buckets x 4 rows: no colliding row set
    val wide = Sketches.cmsEstimate(
        Sketches.cmsCounts(cmsRows, Seq("g"), "item", width = 4096),
        cmsRows.select("g", "item"), Seq("g"), "item", width = 4096)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(wide == exact)
  }

  test("cms: sketches are cell-wise sum-mergeable (batch == union)") {
    val a = cmsRows.filter(col("item").cast("int") < 20)
    val b = cmsRows.filter(col("item").cast("int") >= 20)
    val merged = Sketches.cmsCounts(a, Seq("g"), "item", width = 16)
      .unionByName(Sketches.cmsCounts(b, Seq("g"), "item", width = 16))
      .groupBy("g", "j", "bucket").agg(sum("n").as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)) ->
        r.getLong(3)).toMap
    val whole = Sketches.cmsCounts(cmsRows, Seq("g"), "item", width = 16)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)) ->
        r.getLong(3)).toMap
    assert(merged == whole)
  }

  test("cms persistence rides AggStore: two appended cell batches " +
    "serve the same sketch and estimates as one-shot") {
    val store = java.nio.file.Files.createTempDirectory("cms").toString + "/s"
    val a = cmsRows.filter(col("item").cast("int") < 20)
    val b = cmsRows.filter(col("item").cast("int") >= 20)
    def cells(df: org.apache.spark.sql.DataFrame) =
      Sketches.cmsCells(df, Seq("g"), "item", width = 16)
        .withColumn("one", lit(1.0))
    AggStore.append(cells(a), Seq("g", "j", "bucket"), "one", store, 1L)
    AggStore.append(cells(b), Seq("g", "j", "bucket"), "one", store, 2L)
    val served = AggStore.serve(spark, store)
      .select(col("g"), col("j"), col("bucket"), col("n"))
    val oneShot = Sketches.cmsCounts(cmsRows, Seq("g"), "item", width = 16)
    assert(served.collect().map(_.toSeq).toSet ==
      oneShot.collect().map(_.toSeq).toSet)
    val probes = cmsRows.select("g", "item")
    val estServed = Sketches.cmsEstimate(served, probes, Seq("g"),
        "item", width = 16)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val estOne = Sketches.cmsEstimate(oneShot, probes, Seq("g"),
        "item", width = 16)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(estServed == estOne)
  }

  test("cms: unseen probe estimates its bucket load, never errors; " +
    "partitioning-invariant; guards") {
    val probes = Seq(("0", "zzz-unseen"), ("1", "5")).toDF("g", "item")
    val sk = Sketches.cmsCounts(cmsRows, Seq("g"), "item", width = 8)
    val est = Sketches.cmsEstimate(sk, probes, Seq("g"), "item", width = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(est.size == 2 && est.values.forall(_ >= 0L))
    val est2 = Sketches.cmsEstimate(
        Sketches.cmsCounts(cmsRows.repartition(13), Seq("g"), "item",
          width = 8),
        probes, Seq("g"), "item", width = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(est2 == est)
    intercept[IllegalArgumentException] {
      Sketches.cmsCounts(cmsRows, Seq("g"), "item", depth = 0)
    }
    intercept[IllegalArgumentException] {
      Sketches.cmsCounts(cmsRows, Seq("g"), "item", width = 1)
    }
  }
}
