package graft.operators

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SignatureStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore() =
    java.nio.file.Files.createTempDirectory("sigstore").toString + "/s"

  private def docs(n: Int, seed: String) =
    (1 to n).map(i => (i.toLong,
      s"$seed document number $i with shared filler words plus unique token u$i$seed"))
      .toDF("doc_id", "text")

  private def sigs(df: org.apache.spark.sql.DataFrame) =
    Dedup.minHashSignature(df, "text", shingleSize = 3, numHashes = 32)
      .select(col("doc_id"), col("minhash"))

  test("band reads are PARTITION-PRUNED to touched buckets (the incremental-dedup scale contract)") {
    val store = freshStore()
    SignatureStore.append(sigs(docs(60, "alpha")), "doc_id", 8, 4, store, numBuckets = 16)
    val all = spark.read.parquet(store + "/bands")
    val allBuckets = all.select("bucket").distinct().as[Int].collect().sorted.toSeq
    assert(allBuckets.size >= 8, s"60 docs x 8 bands should spread over many buckets: $allBuckets")
    val touched = allBuckets.take(2)
    val pruned = SignatureStore.readBands(spark, store, touched)
    val scan = pruned.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    // partition-level proof: the scan's file listing covers ONLY the
    // touched bucket directories, not the whole store
    assert(scan.selectedPartitions.partitionCount == touched.size,
      s"expected ${touched.size} selected partitions, " +
        s"got ${scan.selectedPartitions.partitionCount} of ${allBuckets.size}")
    assert(scan.selectedPartitions.totalNumberOfFiles <
      all.inputFiles.length,
      "pruned scan must list fewer files than the full store")
    // and the pruned read returns exactly the touched buckets' rows
    val expect = all.filter(col("bucket").isin(touched: _*)).count()
    assert(pruned.count() == expect && expect > 0)
  }

  test("id reads are partition-pruned the same way") {
    val store = freshStore()
    SignatureStore.append(sigs(docs(60, "beta")), "doc_id", 8, 4, store, numBuckets = 16)
    val allIdb = spark.read.parquet(store + "/ids")
      .select("idb").distinct().as[Int].collect().sorted.toSeq
    val touched = allIdb.take(2)
    val scan = SignatureStore.readIds(spark, store, touched)
      .queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }.head
    assert(scan.selectedPartitions.partitionCount == touched.size)
  }

  test("bucket count is pinned at creation; a mismatched later call uses the pinned value") {
    val store = freshStore()
    SignatureStore.append(sigs(docs(10, "gamma")), "doc_id", 8, 4, store, numBuckets = 16)
    assert(SignatureStore.resolveBuckets(spark, store, 999) == 16)
    // append with a different requested modulus must still land in the
    // pinned bucketing (otherwise later pruned reads would miss rows)
    SignatureStore.append(sigs(docs(20, "delta")), "doc_id", 8, 4, store, numBuckets = 8)
    val bad = spark.read.parquet(store + "/bands")
      .filter(pmod(col("band_hash"), lit(16L)).cast("int") =!= col("bucket"))
    assert(bad.count() == 0, "every row must sit in its pmod-16 bucket")
  }

  test("a legacy FLAT store fails fast instead of silently reading as absent") {
    val store = freshStore()
    // round-3 layout: (id, minhash) parquet files directly under the root
    sigs(docs(20, "leg")).write.parquet(store)
    assert(SignatureStore.isLegacyLayout(spark, store))
    val e = intercept[IllegalStateException] { SignatureStore.exists(spark, store) }
    assert(e.getMessage.contains("migrateLegacy"), e.getMessage)
    intercept[IllegalStateException] {
      SignatureStore.append(sigs(docs(5, "new")), "doc_id", 8, 4, store)
    }
    // dedupAgainstStore goes through exists() -> same fail-fast, no silent
    // re-admission of stored ids
    intercept[IllegalStateException] {
      Dedup.dedupAgainstStore(docs(5, "leg"), "doc_id", "text", store)
    }
  }

  test("migrateLegacy re-bands a flat store in place; result == fresh banded append") {
    val store = freshStore()
    val d = docs(40, "mig")
    sigs(d).write.parquet(store)
    SignatureStore.migrateLegacy(spark, store, "doc_id", 8, 4, numBuckets = 16)
    assert(SignatureStore.exists(spark, store))
    assert(!new java.io.File(store + "/_legacy_migrating").exists())
    // content check: identical to appending the same signatures fresh
    val fresh = freshStore()
    SignatureStore.append(sigs(d), "doc_id", 8, 4, fresh, numBuckets = 16)
    def rows(s: String) = spark.read.parquet(s + "/bands")
      .select("id", "band_id", "band_hash", "bucket")
      .as[(Long, Int, Long, Int)].collect().sorted.toSeq
    assert(rows(store) == rows(fresh) && rows(store).nonEmpty)
    // a rerun is a no-op (no duplicate rows)
    SignatureStore.migrateLegacy(spark, store, "doc_id", 8, 4, numBuckets = 16)
    assert(rows(store) == rows(fresh))
    // and the migrated store now serves the replay guard: re-ingesting a
    // stored id drops it
    val survivors = Dedup.dedupAgainstStore(d.limit(3), "doc_id", "text", store,
      bands = 8, rowsPerBand = 4)
    assert(survivors.count() == 0, "already-stored ids must be rejected")
  }

  test("migrateLegacy resumes after a simulated crash, discarding orphan partials") {
    val store = freshStore()
    val d = docs(25, "res")
    sigs(d).write.parquet(store)
    // simulate a crash mid-migration: files already staged, a partial
    // (wrong-modulus) bands subtree orphaned, no marker
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(store + "/_legacy_migrating")
    fs.mkdirs(staging)
    new java.io.File(store).listFiles().filter(f => f.isFile &&
      (f.getName.startsWith("part-") || f.getName == "_SUCCESS")).foreach { f =>
      fs.rename(new org.apache.hadoop.fs.Path(f.getPath),
        new org.apache.hadoop.fs.Path(staging, f.getName))
    }
    Seq((999L, 0, 123L, 0)).toDF("id", "band_id", "band_hash", "bucket")
      .write.partitionBy("bucket").parquet(store + "/bands")
    // the half-migrated store is still invisible, not readable-but-wrong
    intercept[IllegalStateException] { SignatureStore.exists(spark, store) }
    SignatureStore.migrateLegacy(spark, store, "doc_id", 8, 4, numBuckets = 16)
    val ids = SignatureStore.allIds(spark, store).as[Long].collect().toSet
    assert(ids == (1 to 25).map(_.toLong).toSet, "orphan row gone, all legacy ids in")
  }

  test("orphaned markerless subtrees are replaced on append (modulus re-pin safety)") {
    val store = freshStore()
    SignatureStore.append(sigs(docs(10, "o1")), "doc_id", 8, 4, store, numBuckets = 16)
    // simulate a crash before the marker landed
    assert(new java.io.File(store + "/_graft_buckets").delete())
    // the replayed first batch arrives with a DIFFERENT modulus
    SignatureStore.append(sigs(docs(12, "o2")), "doc_id", 8, 4, store, numBuckets = 8)
    assert(SignatureStore.resolveBuckets(spark, store, 999) == 8)
    val ids = SignatureStore.allIds(spark, store).as[Long].collect().toSeq
    assert(ids.sorted == (1 to 12).map(_.toLong),
      "orphan rows under the old modulus must not survive")
    val bad = spark.read.parquet(store + "/bands")
      .filter(pmod(col("band_hash"), lit(8L)).cast("int") =!= col("bucket"))
    assert(bad.count() == 0, "every surviving row sits in its pmod-8 bucket")
  }

  test("compact rewrites each bucket directory to one file, preserving content") {
    val store = freshStore()
    // three appends -> >= 3 files in any bucket hit three times
    SignatureStore.append(sigs(docs(30, "e1")), "doc_id", 8, 4, store, numBuckets = 4)
    SignatureStore.append(sigs(docs(30, "e2")), "doc_id", 8, 4, store, numBuckets = 4)
    SignatureStore.append(sigs(docs(30, "e3")), "doc_id", 8, 4, store, numBuckets = 4)
    def bandRows() = spark.read.parquet(store + "/bands")
      .select("id", "band_id", "band_hash", "bucket")
      .as[(Long, Int, Long, Int)].collect().sorted.toSeq
    def filesPerDir(sub: String): Map[String, Int] =
      new java.io.File(store + sub).listFiles().filter(_.isDirectory).map { d =>
        d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))
      }.toMap
    val before = bandRows()
    assert(filesPerDir("/bands").values.max >= 3, "appends must accumulate files")
    SignatureStore.compact(spark, store)
    assert(filesPerDir("/bands").values.forall(_ == 1),
      s"each bucket dir must compact to one file: ${filesPerDir("/bands")}")
    assert(filesPerDir("/ids").values.forall(_ == 1))
    assert(bandRows() == before, "compaction must not change content")
    // store stays readable through the normal pruned path
    val allIds = SignatureStore.allIds(spark, store).as[Long].collect()
    assert(allIds.length == 90)
  }
}
