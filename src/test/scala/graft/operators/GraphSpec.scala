package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents labels every node with its component minimum") {
    // two chains and a triangle: {1-2-3-4}, {10-11}, {20-21-22 triangle}, isolated 99
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 20L))
      .toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L, 21L, 22L, 99L).toDF("id")
    val out = Graph.connectedComponents(edges, nodes = Some((nodes, "id")))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L,
      99L -> 99L))
  }

  test("connectedComponents tolerates self-loops, duplicates, and reversed edges") {
    val edges = Seq((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L))
      .toDF("src", "dst")
    val out = Graph.connectedComponents(edges).as[(Long, Long)].collect().toMap
    // 5 appears only in a self-loop -> drops out of the edge set entirely
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("connectedComponents handles a long path (transitivity chain)") {
    // path 0-1-2-...-63: one component, root 0; converges in O(log n) rounds
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("src", "dst")
    val out = Graph.connectedComponents(edges).as[(Long, Long)].collect()
    assert(out.length == 64)
    assert(out.forall(_._2 == 0L))
  }

  test("connectedComponents on an empty edge list returns singletons for nodes") {
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val nodes = Seq(7L, 8L).toDF("id")
    val out = Graph.connectedComponents(edges, nodes = Some((nodes, "id")))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(7L -> 7L, 8L -> 8L))
  }

  test("keepClusterCanonical keeps exactly one doc per cluster (the root)") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (9L, "z")).toDF("doc_id", "text")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val comps = Graph.connectedComponents(edges,
      nodes = Some((docs.select("doc_id"), "doc_id")))
    val kept = Graph.keepClusterCanonical(docs, comps, "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 9L))
  }

  test("reliable checkpoint path yields identical components (and requires a dir)") {
    val edges = ((0L until 63L).map(i => (i, i + 1)) ++ Seq((100L, 101L)))
      .toDF("src", "dst")
    val expected = Graph.connectedComponents(edges).as[(Long, Long)].collect().toMap
    val sc = spark.sparkContext
    // without a checkpoint dir the reliable path must fail fast, not fall
    // back to non-durable truncation
    if (sc.getCheckpointDir.isEmpty) {
      intercept[IllegalStateException] {
        Graph.connectedComponents(edges, reliable = true)
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("cc-ckpt").toString
    sc.setCheckpointDir(dir)
    val out = Graph.connectedComponents(edges, reliable = true)
      .as[(Long, Long)].collect().toMap
    assert(out == expected, "reliable and local checkpointing must agree")
    // rounds actually hit durable storage
    assert(new java.io.File(dir).listFiles().nonEmpty)
  }

  test("pipeline: LSH candidate pairs -> components -> canonical docs") {
    // three identical docs + one unrelated: the cluster collapses to one
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta"),
      (4L, "totally different content with other words entirely here now"))
      .toDF("doc_id", "text")
    val sig = Dedup.minHashSignature(docs, "text", shingleSize = 3, numHashes = 32)
    val pairs = Dedup.minHashCandidatePairs(sig, "doc_id", bands = 8, rowsPerBand = 4)
    val comps = Graph.connectedComponents(pairs, "id_a", "id_b",
      nodes = Some((docs.select("doc_id"), "doc_id")))
    val kept = Graph.keepClusterCanonical(docs, comps, "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L))
  }
}
