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
