package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ErStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmpStore() = java.nio.file.Files
    .createTempDirectory("er-store").toString + "/s"

  private lazy val customers = spark.read
    .parquet(sf("sf0.01") + "/customer.parquet")
    .select(col("c_custkey"), col("c_name"), col("c_nationkey"))

  private val Tau = 0.97

  /** Ground truth: full-corpus bounded self-join + CC, member-min ids. */
  private def fullRecompute(df: org.apache.spark.sql.DataFrame) = {
    val edges = JwJoin.jaroWinklerSelfJoin(df, "c_custkey", "c_name", Tau,
        blockCols = Seq("c_nationkey"))
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    Graph.connectedComponents(edges, "src", "dst",
        nodes = Some((df.select(col("c_custkey")), "c_custkey")))
      .select(col("id").as("c_custkey"), col("component").as("entity"))
      .as[(Long, Long)].collect().toMap
  }

  private def served(store: String) =
    ErStore.entities(spark, store)
      .as[(Long, Long)].collect().toMap

  test("incremental registry ≡ full recompute after build and after " +
    "every append; replayed batch id no-ops; compaction is " +
    "content-invariant and retires replay ids") {
    val store = tmpStore()
    val b0 = customers.filter($"c_custkey" % 3 === 0)
    val b1 = customers.filter($"c_custkey" % 3 === 1)
    val b2 = customers.filter($"c_custkey" % 3 === 2)
    ErStore.build(b0, "c_custkey", "c_name", store, Tau,
      blockCols = Seq("c_nationkey"))
    assert(served(store) == fullRecompute(b0), "build labeling")
    ErStore.append(b1, store, batchId = 1L)
    assert(served(store) == fullRecompute(b0.unionByName(b1)),
      "labeling after first append")
    ErStore.append(b2, store, batchId = 2L)
    val full = fullRecompute(customers)
    assert(served(store) == full, "labeling after second append")
    // replay: same batch id again must not change anything
    ErStore.append(b2, store, batchId = 2L)
    assert(served(store) == full, "replayed append must no-op")
    // compaction folds layers; labels identical; replay still no-ops
    ErStore.compact(spark, store)
    assert(served(store) == full, "compaction must not change labels")
    ErStore.append(b1, store, batchId = 1L)
    assert(served(store) == full,
      "replay of a compacted-away batch must no-op")
    for (layer <- Seq("records", "keys", "entities")) {
      val dirs = new java.io.File(s"$store/$layer").listFiles()
        .filter(_.isDirectory).map(_.getName).filter(_.startsWith("ab="))
        .toSet
      assert(dirs == Set("ab=-1"), s"$layer must fold to one gen: $dirs")
    }
  }

  test("incremental ≡ full recompute at a FINER composite blocking key " +
    "(nation × name-band — the measured density knob, SCALE.md r17)") {
    // the scale rule: block cardinality must grow with the corpus to
    // keep per-block density (and so per-batch append cost) constant;
    // this pins that the incremental contract is key-shape-agnostic
    val banded = customers
      .withColumn("c_nameband", substring(col("c_name"), 10, 7))
    val blocks = Seq("c_nationkey", "c_nameband")
    def truth(df: org.apache.spark.sql.DataFrame) = {
      val edges = JwJoin.jaroWinklerSelfJoin(df, "c_custkey", "c_name",
          Tau, blockCols = blocks)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      Graph.connectedComponents(edges, "src", "dst",
          nodes = Some((df.select(col("c_custkey")), "c_custkey")))
        .select(col("id").as("c_custkey"), col("component").as("entity"))
        .as[(Long, Long)].collect().toMap
    }
    val store = tmpStore()
    val b0 = banded.filter($"c_custkey" % 2 === 0)
    val b1 = banded.filter($"c_custkey" % 2 === 1)
    ErStore.build(b0, "c_custkey", "c_name", store, Tau,
      blockCols = blocks)
    assert(served(store) == truth(b0), "composite-key build labeling")
    ErStore.append(b1, store, batchId = 1L)
    assert(served(store) == truth(banded),
      "composite-key labeling after append")
  }

  test("labels are STABLE: an append that cannot touch a component " +
    "leaves its id unchanged, and merges adopt the member minimum") {
    val store = tmpStore()
    val base = Seq(
      (10L, "martha washington", 1L), (11L, "martha washingtno", 1L),
      (20L, "benjamin franklin", 2L))
      .toDF("id", "name", "blk")
    ErStore.build(base, "id", "name", store, Tau, blockCols = Seq("blk"))
    val before = served(store)
    assert(before(10L) == 10L && before(11L) == 10L && before(20L) == 20L)
    // the new record links only to 20's component — 10/11 untouched
    val batch = Seq((5L, "benjamin franklyn", 2L)).toDF("id", "name", "blk")
    ErStore.append(batch, store, batchId = 1L)
    val after = served(store)
    assert(after(10L) == 10L && after(11L) == 10L, "untouched id stable")
    assert(after(20L) == 5L && after(5L) == 5L,
      "merged component adopts the member minimum")
  }

  test("append probes only the batch's key buckets — the stored-keys " +
    "scan is partition-pruned") {
    val store = tmpStore()
    ErStore.build(customers.filter($"c_custkey" < 700), "c_custkey",
      "c_name", store, Tau)
    val plan = ErStore.storedKeys(spark, store, Some(Seq(3L, 7L)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"expected bucket partition filters in:\n${plan.take(1500)}")
  }

  test("envelope and contract guards fail fast") {
    val store = tmpStore()
    val df = Seq((1L, "x", 0L)).toDF("id", "name", "blk")
    // threshold too low for the pinned maxLen
    val e1 = intercept[IllegalArgumentException] {
      ErStore.build(df, "id", "name", store, threshold = 0.85, maxLen = 40)
    }
    assert(e1.getMessage.contains("deletionDepth"))
    // a name over the pinned maxLen
    ErStore.build(df, "id", "name", store, Tau, maxLen = 4)
    val e2 = intercept[IllegalArgumentException] {
      ErStore.append(Seq((2L, "waytoolong", 0L)).toDF("id", "name", "blk"),
        store, batchId = 1L)
    }
    assert(e2.getMessage.contains("maxLen"))
    // double-build refused; bad batch ids refused
    intercept[IllegalArgumentException] {
      ErStore.build(df, "id", "name", store, Tau, maxLen = 4)
    }
    intercept[IllegalArgumentException] {
      ErStore.append(df, store, batchId = 0L)
    }
    // non-monotonic fresh id refused (entities() folds latest-id-wins);
    // replaying an APPLIED lower id stays a silent no-op
    ErStore.append(Seq((3L, "y", 0L)).toDF("id", "name", "blk"),
      store, batchId = 5L)
    val e3 = intercept[IllegalArgumentException] {
      ErStore.append(Seq((4L, "z", 0L)).toDF("id", "name", "blk"),
        store, batchId = 3L)
    }
    assert(e3.getMessage.contains("monotonically increasing"))
    ErStore.append(Seq((3L, "y", 0L)).toDF("id", "name", "blk"),
      store, batchId = 5L) // replay: returns before the guard
  }

  test("a batch of all-novel names lands as singletons; empty-name and " +
    "null-name rows never register") {
    val store = tmpStore()
    ErStore.build(Seq((1L, "alpha one", 0L)).toDF("id", "name", "blk"),
      "id", "name", store, Tau, maxLen = 12)
    ErStore.append(Seq((2L, "beta two", 0L), (3L, null.asInstanceOf[String], 0L),
        (4L, "", 0L)).toDF("id", "name", "blk"),
      store, batchId = 1L)
    val out = served(store)
    assert(out == Map(1L -> 1L, 2L -> 2L),
      s"novel singleton + dropped null/empty rows, got $out")
  }
}
