package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("keepFirst keeps the row that sorts first per key, deterministically") {
    val df = Seq(
      (1, "b", 20), (1, "a", 10), (2, "c", 30), (2, "d", 5), (3, "e", 1))
      .toDF("k", "v", "ord")
    val out = Dedup.keepFirst(df, Seq("k"), Seq(col("ord")))
      .orderBy("k").select("k", "v").as[(Int, String)].collect()
    assert(out.toSeq == Seq((1, "a"), (2, "d"), (3, "e")))
  }

  test("keepFirst handles key = 0 (the reference's truthiness bug, not replicated)") {
    val df = Seq((0, "zero", 1), (0, "zero2", 2)).toDF("k", "v", "ord")
    val out = Dedup.keepFirst(df, Seq("k"), Seq(col("ord"))).collect()
    assert(out.length == 1 && out(0).getString(1) == "zero")
  }

  test("keepFirstAgg (min_by form) equals the window form") {
    val df = Seq(
      (1, "b", 20), (1, "a", 10), (2, "c", 30), (2, "d", 5), (3, "e", 1),
      (0, "zero", 2), (0, "z2", 7))
      .toDF("k", "v", "ord")
    val win = Dedup.keepFirst(df, Seq("k"), Seq(col("ord")))
      .orderBy("k").select("k", "v", "ord").collect().toSeq
    val agg = Dedup.keepFirstAgg(df, Seq("k"), "ord")
      .orderBy("k").select("k", "v", "ord").collect().toSeq
    assert(win == agg)
  }

  test("keepFirstAgg: null ords sort first, schema order preserved, bad key fails fast") {
    // null ord must win (nulls-first, matching the window form's default)
    val withNulls = Seq(
      (1, "null-ord", None: Option[Int]), (1, "five", Some(5)),
      (2, "only-null", None))
      .toDF("k", "v", "ord")
    val aggOut = Dedup.keepFirstAgg(withNulls, Seq("k"), "ord")
      .orderBy("k").select("k", "v").as[(Int, String)].collect().toSeq
    val winOut = Dedup.keepFirst(withNulls, Seq("k"), Seq(col("ord").asc_nulls_first))
      .orderBy("k").select("k", "v").as[(Int, String)].collect().toSeq
    assert(aggOut == winOut)
    assert(aggOut == Seq((1, "null-ord"), (2, "only-null")))
    // schema order: input (v, k, ord) must come back as (v, k, ord)
    val odd = Seq(("a", 1, 10)).toDF("v", "k", "ord")
    assert(Dedup.keepFirstAgg(odd, Seq("k"), "ord").columns.toSeq == Seq("v", "k", "ord"))
    // unknown key -> immediate error, not silent duplication
    intercept[IllegalArgumentException] {
      Dedup.keepFirstAgg(odd, Seq("K"), "ord")
    }
  }

  test("keepFirst is idempotent") {
    val df = Seq((1, "a", 1), (1, "b", 2), (2, "c", 1)).toDF("k", "v", "ord")
    val once = Dedup.keepFirst(df, Seq("k"), Seq(col("ord")))
    val twice = Dedup.keepFirst(once, Seq("k"), Seq(col("ord")))
    assert(once.orderBy("k").collect().toSeq == twice.orderBy("k").collect().toSeq)
  }

  test("exactByContent collapses identical content to the smallest id") {
    val df = Seq((10L, "same text"), (3L, "same text"), (7L, "other"))
      .toDF("id", "text")
    val out = Dedup.exactByContent(df, "text", "id")
      .select("id").as[Long].collect().sorted
    assert(out.toSeq == Seq(3L, 7L))
  }

  test("minhash: identical docs always share every band; near-dups pair up") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "the quick brown fox jumps over the lazy dog again and again tomorrow"),
      (4L, "completely different words nothing shared here at all whatsoever ever done"))
      .toDF("doc_id", "text")
    val sig = Dedup.minHashSignature(docs, "text", shingleSize = 3, numHashes = 32)
    val pairs = Dedup.minHashCandidatePairs(sig, "doc_id", bands = 8, rowsPerBand = 4)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"identical docs must be candidates, got $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated doc must not pair, got $pairs")
  }

  test("minHashCandidatePairs drops buckets above maxBucketSize (blowup guard)") {
    // 6 identical docs: every band bucket has all 6 members
    val docs = (1L to 6L).map(i => (i, "alpha beta gamma delta epsilon zeta eta"))
      .toDF("doc_id", "text")
    val sig = Dedup.minHashSignature(docs, "text", shingleSize = 3, numHashes = 32)
    val uncapped = Dedup.minHashCandidatePairs(sig, "doc_id", bands = 8, rowsPerBand = 4)
    assert(uncapped.count() == 15, "6 identical docs -> C(6,2) pairs")
    val capped = Dedup.minHashCandidatePairs(sig, "doc_id", bands = 8, rowsPerBand = 4,
      maxBucketSize = 5)
    assert(capped.count() == 0, "all buckets oversized -> no pairs emitted")
    intercept[IllegalArgumentException] {
      Dedup.minHashCandidatePairs(sig, "doc_id", bands = 8, rowsPerBand = 4,
        maxBucketSize = 1)
    }
  }

  test("native and builtin-agg minhash signatures are bit-identical (ADVICE r1)") {
    // the two formulations must share one hash family or banding across
    // them is meaningless — includes short docs (< shingleSize tokens),
    // single token, repeated whitespace, and mixed case
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "two tokens"),
      (3L, "one"),
      (4L, "  padded   with   extra   spaces  "),
      (5L, "MiXeD Case TOKENS here"),
      (6L, "\tleading tab and trailing newline\n"),   // ADVICE r2: non-space edge ws
      (7L, "inner\ttabs\nand\nnewlines between"),
      (8L, ""))
      .toDF("doc_id", "text")
    val native = Dedup.minHashSignature(docs, "text", shingleSize = 3, numHashes = 16)
      .select("doc_id", "minhash").as[(Long, Seq[Long])].collect().toMap
    val agg = Dedup.minHashSignatureAgg(docs, "text", shingleSize = 3, numHashes = 16)
      .select("doc_id", "minhash").as[(Long, Seq[Long])].collect().toMap
    assert(native.keySet == agg.keySet)
    native.foreach { case (id, sig) =>
      assert(sig == agg(id), s"doc $id: native $sig != agg ${agg(id)}")
    }
  }

  test("dedupAgainstStore: store growth, cross-batch dedup, replay guard, keep-first") {
    val dir = java.nio.file.Files.createTempDirectory("store").toString
    val store = dir + "/sigs"
    val b1 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // dup of 1
      (3L, "completely different other content sharing no phrases with anything"))
      .toDF("doc_id", "text")
    val k1 = Dedup.dedupAgainstStore(b1, "doc_id", "text", store)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(k1 == Seq(1L, 3L), "within-batch dup drops, keep-first by id")
    val b2 = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // dup of stored 1
      (11L, "brand new unique material resembling nothing stored before now"))
      .toDF("doc_id", "text")
    val k2 = Dedup.dedupAgainstStore(b2, "doc_id", "text", store)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(k2 == Seq(11L), "batch doc near-dup of STORED doc drops")
    // replay of b2 (stream restart): 11 re-ingests a stored id, 10 still
    // band-matches stored 1 — nothing survives, output stays exact
    val k3 = Dedup.dedupAgainstStore(b2, "doc_id", "text", store)
      .select("doc_id").as[Long].collect().toSeq
    assert(k3.isEmpty, "replayed batch must add nothing to the store")
    // store holds exactly the survivors' ids
    val storedIds = SignatureStore.allIds(spark, store)
      .as[Long].collect().sorted.toSeq
    assert(storedIds == Seq(1L, 3L, 11L))
  }

  test("crash between output landing and store append: replay lands output exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("store-crash").toString
    val store = dir + "/sigs"
    val out = dir + "/out"
    def landAs(batchId: Long): org.apache.spark.sql.DataFrame => Unit =
      kept => graft.sources.Sinks.overwritePartitions(
        kept.withColumn("ingest_batch", lit(batchId)), out, Seq("ingest_batch"))
    def outIds(): Seq[(Long, Long)] = spark.read.parquet(out)
      .select(col("doc_id"), col("ingest_batch").cast("long"))
      .as[(Long, Long)].collect().sorted.toSeq
    val b1 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "completely different other content sharing no phrases with anything"))
      .toDF("doc_id", "text")
    Dedup.dedupAgainstStore(b1, "doc_id", "text", store, land = landAs(0L))
    assert(outIds() == Seq((1L, 0L), (3L, 0L)))
    // batch 2 "crashes" between the two writes: the output landed, the
    // store append never ran (the exact window the r3 ordering lost data in)
    class Boom extends RuntimeException("crash after landing, before store append")
    val b2 = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // dup of stored 1
      (11L, "brand new unique material resembling nothing stored before now"))
      .toDF("doc_id", "text")
    intercept[Boom] {
      Dedup.dedupAgainstStore(b2, "doc_id", "text", store,
        land = kept => { landAs(1L)(kept); throw new Boom })
    }
    assert(outIds() == Seq((1L, 0L), (3L, 0L), (11L, 1L)),
      "output landed before the crash")
    assert(SignatureStore.allIds(spark, store).as[Long].collect().sorted.toSeq
      == Seq(1L, 3L), "store must NOT have advanced")
    // replay of batch 2 (stream restart): same survivors recomputed against
    // the unchanged store, partition overwritten with the same rows, store
    // append finally lands — the r3 ordering would have dropped 11 forever
    Dedup.dedupAgainstStore(b2, "doc_id", "text", store, land = landAs(1L))
    assert(outIds() == Seq((1L, 0L), (3L, 0L), (11L, 1L)),
      "replay must land the survivors exactly once")
    assert(SignatureStore.allIds(spark, store).as[Long].collect().sorted.toSeq
      == Seq(1L, 3L, 11L))
    // replay after FULL success (crash before offset commit): id guard
    // empties the batch, the empty dynamic overwrite touches no partitions
    Dedup.dedupAgainstStore(b2, "doc_id", "text", store, land = landAs(1L))
    assert(outIds() == Seq((1L, 0L), (3L, 0L), (11L, 1L)),
      "post-success replay must change nothing")
  }

  test("batch-internal chain A~B, B~C (no A~C): transitive drop keeps only A (documented policy)") {
    // B = A's text ++ C's text: with 32 bands x 1 row a band matches iff one
    // minhash slot matches (P = Jaccard ~ 0.44 per slot for A-in-B), so
    // A~B and B~C are candidates with P(miss) ~ (1-J)^32 ~ 1e-8, while
    // J(A,C) = 0 keeps A~C out. Deterministic in practice: fixed inputs,
    // fixed hash family.
    val a = "apple banana cherry date elderberry fig grape honeydew kiwi lemon"
    val c = "table chair lamp sofa desk shelf rug curtain mirror clock"
    val docs = Seq((1L, a), (2L, a + " " + c), (3L, c)).toDF("doc_id", "text")
    val sig = Dedup.minHashSignature(docs, "text", shingleSize = 3, numHashes = 32)
    val pairs = Dedup.minHashCandidatePairs(sig, "doc_id", bands = 32, rowsPerBand = 1)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (2L, 3L)),
      s"scenario needs exactly A~B and B~C as candidates, got $pairs")
    val store = java.nio.file.Files.createTempDirectory("store-chain").toString + "/sigs"
    val kept = Dedup.dedupAgainstStore(docs, "doc_id", "text", store,
      bands = 32, rowsPerBand = 1)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // sequential one-at-a-time ingestion would keep C (its only similar doc
    // B was itself dropped); the engine's candidate-level TRANSITIVE drop
    // removes every larger-id endpoint of every pair — stricter, by policy
    assert(kept == Seq(1L),
      s"transitive drop must remove both B and C, kept $kept")
  }

  test("native band hashes are bit-identical to builtin xxhash64 over signature slices") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "two tokens"), (3L, "one"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val sig = Dedup.minHashSignature(docs, "text", 3, 32)
    // builtin twin: xxhash64 applied to the sliced ARRAY hashes elements
    // left-to-right with the running hash as seed — the same fold
    val native = sig.select($"doc_id",
      graft.plans.BandHashes($"minhash", 8, 4).as("n"))
    val builtin = sig.select($"doc_id", expr(
      "transform(sequence(0, 7), b -> xxhash64(slice(minhash, b * 4 + 1, 4))) AS bi"))
    val joined = native.join(builtin, "doc_id")
      .as[(Long, Seq[Long], Seq[Long])].collect()
    joined.foreach { case (id, n, bi) =>
      assert(n == bi, s"doc $id: native $n != builtin $bi")
    }
    // clipping: a short signature folds only available elements
    val short = Seq((1L, Seq(7L, 8L, 9L))).toDF("doc_id", "minhash")
    val clipped = short.select(graft.plans.BandHashes($"minhash", 2, 2).as("h"))
      .as[Seq[Long]].collect().head
    val twin = short.select(expr(
      "transform(sequence(0, 1), b -> xxhash64(slice(minhash, b * 2 + 1, 2)))"))
      .as[Seq[Long]].collect().head
    assert(clipped == twin)
  }

  test("incrementalCandidatePairs finds batch-vs-corpus and batch-internal dups only") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // corpus-internal dup
      (3L, "totally unrelated corpus content with different words here entirely"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // dup of 1 and 2
      (11L, "brand new content unseen anywhere else in any corpus at all"),
      (12L, "brand new content unseen anywhere else in any corpus at all")) // batch-internal dup
      .toDF("doc_id", "text")
    val sigC = Dedup.minHashSignature(corpus, "text", 3, 32)
    val sigB = Dedup.minHashSignature(batch, "text", 3, 32)
    val pairs = Dedup.incrementalCandidatePairs(sigB, sigC, "doc_id",
      bands = 8, rowsPerBand = 4)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 10L)) && pairs.contains((2L, 10L)),
      s"batch doc must pair with its corpus twins: $pairs")
    assert(pairs.contains((11L, 12L)), s"batch-internal dup must pair: $pairs")
    assert(!pairs.contains((1L, 2L)),
      s"corpus-internal pairs must NOT be re-derived: $pairs")
    assert(pairs.forall { case (a, b) => b >= 10L },
      s"every pair involves at least one batch doc: $pairs")
  }

  test("chunkFirstOccurrence: repeated chunks owned by first occurrence, within and across docs") {
    // chunkTokens = 2: doc 1 = [a b][c d], doc 2 repeats [a b] twice then
    // adds a new chunk, doc 3 re-uses doc 1's [c d]; doc 4 is token-less
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b a b x y"),
      (3L, "c d"),
      (4L, "   "))
      .toDF("doc_id", "text")
    val out = Dedup.chunkFirstOccurrence(docs, "doc_id", "text", chunkTokens = 2)
      .select("doc_id", "chunk_id", "is_first")
      .as[(Long, Int, Boolean)].collect().toSet
    assert(out == Set(
      (1L, 0, true), (1L, 1, true),            // first owners of [a b], [c d]
      (2L, 0, false), (2L, 1, false), (2L, 2, true), // both [a b] repeats drop
      (3L, 0, false),                          // cross-doc repeat of [c d]
      (4L, 0, true)))                          // token-less -> one empty chunk
  }

  test("duplicateSpans: planted shared run found at exact positions; within-doc repeats not flagged") {
    // docs 1 and 2 share a 6-token run at different offsets; k=4 →
    // windows at the 3 alignments inside the run merge to one span
    val shared = "alpha bravo charlie delta echo foxtrot"
    val docs = Seq(
      (1L, s"u1 u2 $shared u3 u4"),                 // run at tokens 2..8
      (2L, s"$shared v1 v2 v3"),                    // run at tokens 0..6
      (3L, "w1 w2 w3 w1 w2 w3 w1 w2 w3 w1 w2 w3"), // self-repetition only
      (4L, "x1 x2 x3 x4 x5 x6 x7 x8"))              // unique
      .toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(docs, "doc_id", "text", k = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    // 3 windows each (starts 2,3,4 / 0,1,2), span = [start, start+6)
    assert(out == Set((1L, 2L, 8L, 3L), (2L, 0L, 6L, 3L)),
      s"exact span positions and window counts: $out")

    // two shared runs in one doc separated by > k unique tokens stay
    // two spans; a doc pair sharing everything collapses to one
    val again = Seq(
      (1L, s"$shared g1 g2 g3 g4 g5 $shared"),
      (2L, s"$shared h1 h2 h3 h4 h5 $shared"))
      .toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(again, "doc_id", "text", k = 4)
      .as[(Long, Long, Long, Long)].collect()
    // the full 17-token docs share NOTHING besides the two runs; gap
    // g1..g5 vs h1..h5 breaks every bridging window
    assert(spans.length == 4 &&
      spans.forall { case (_, s0, e0, _) => (s0, e0) == (0L, 6L) || (s0, e0) == (11L, 17L) },
      s"two maximal spans per doc: ${spans.toSeq}")

    // unique corpus → empty; guards
    val none = Dedup.duplicateSpans(
      Seq((1L, "a b c d e"), (2L, "f g h i j")).toDF("doc_id", "text"),
      "doc_id", "text", k = 3)
    assert(none.count() == 0)
    intercept[IllegalArgumentException](
      Dedup.duplicateSpans(docs, "doc_id", "text", k = 1))
    intercept[IllegalArgumentException](
      Dedup.duplicateSpans(docs, "doc_id", "text", minDocs = 1))
  }

  test("exciseSpans: listed token ranges cut, untouched docs re-normalized, fully-cut doc survives empty") {
    val shared = "alpha bravo charlie delta echo foxtrot"
    val docs = Seq(
      (1L, s"u1 u2 $shared u3 u4"),
      (2L, s"$shared v1 v2 v3"),
      (4L, "x1  x2   x3"))
      .toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, "doc_id", "text", k = 4)
    val out = Dedup.exciseSpans(docs, "doc_id", "text", spans)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == (("u1 u2 u3 u4", 4L, 6L)), s"run excised: ${out(1L)}")
    assert(out(2L) == (("v1 v2 v3", 3L, 6L)))
    // no spans → text passes through (whitespace re-normalized)
    assert(out(4L) == (("x1 x2 x3", 3L, 0L)))

    // a doc that is ONE big duplicated span comes back empty, not lost;
    // overlapping caller-supplied spans don't double-drop
    val twin = Seq((1L, shared), (2L, shared)).toDF("doc_id", "text")
    val manual = Seq((1L, 0L, 4L), (1L, 2L, 6L), (2L, 0L, 6L))
      .toDF("doc_id", "span_start", "span_end")
    val o2 = Dedup.exciseSpans(twin, "doc_id", "text", manual)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(o2(1L) == (("", 0L, 6L)) && o2(2L) == (("", 0L, 6L)))
  }

  test("incremental ingest composition: batched pairs + incrementalComponents == full-corpus clustering") {
    // the production ingest loop: per batch, candidate pairs vs the
    // growing corpus (incrementalCandidatePairs), folded into the evolving
    // clustering (incrementalComponents) — must equal clustering the
    // final corpus in one shot
    val b1 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "totally unrelated corpus content with different words here entirely"))
      .toDF("doc_id", "text")
    val b2 = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // joins {1,2}
      (11L, "fresh singleton material matching nothing else in this corpus"))
      .toDF("doc_id", "text")
    def sigs(df: org.apache.spark.sql.DataFrame) =
      Dedup.minHashSignature(df, "text", 3, 32).select(col("doc_id"), col("minhash"))
    // incremental path
    val pairs1 = Dedup.minHashCandidatePairs(sigs(b1), "doc_id", 8, 4)
    val comps1 = Graph.connectedComponents(pairs1, "id_a", "id_b",
      nodes = Some((b1.select("doc_id"), "doc_id")))
    val pairs2 = Dedup.incrementalCandidatePairs(sigs(b2), sigs(b1), "doc_id", 8, 4)
    val inc = Graph.incrementalComponents(comps1, pairs2, "id_a", "id_b",
      newNodes = Some((b2.select("doc_id"), "doc_id")))
      .as[(Long, Long)].collect().toMap
    // one-shot path over the final corpus
    val all = b1.unionByName(b2)
    val full = Graph.connectedComponents(
      Dedup.minHashCandidatePairs(sigs(all), "doc_id", 8, 4), "id_a", "id_b",
      nodes = Some((all.select("doc_id"), "doc_id")))
      .as[(Long, Long)].collect().toMap
    assert(inc == full, s"\nincremental: $inc\nfull:        $full")
    assert(inc(10L) == 1L, "new near-dup joins the existing cluster's root")
    assert(inc(11L) == 11L, "novel doc stays a singleton")
  }

  test("jaccardVerify: identical docs have jaccard 1.0") {
    val docs = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"), (3L, "x y z q r s t u"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.jaccardVerify(pairs, docs, "doc_id", "text")
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => ((a, b), j) }.toMap
    assert(out((1L, 2L)) == 1.0)
    assert(out((1L, 3L)) == 0.0)
  }

  test("containmentVerify: a contained snippet scores 1.0 from its side, " +
    "fractionally from the container's") {
    // doc 1 has 8 tokens → 6 distinct 3-shingles; doc 2 is tokens 1-5
    // (3 shingles, all present in doc 1)
    val docs = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e"), (3L, "x y z w"))
      .toDF("doc_id", "text")
    val pairs = Seq((2L, 1L), (3L, 1L)).toDF("id_a", "id_b")
    val out = Dedup.containmentVerify(pairs, docs, "doc_id", "text")
      .select("id_a", "id_b", "n_shingles_a", "n_shingles_b",
        "containment_a", "containment_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(out((2L, 1L)) == ((3L, 6L, 1.0, 0.5)))
    assert(out((3L, 1L)) == ((2L, 6L, 0.0, 0.0)))
  }

  test("containmentVerify: short docs use the 1-truncated-shingle convention") {
    // "xy" is below shingleSize → ONE truncated shingle (the q88
    // ShingleHashSet contract), so containment stays defined: 0/1
    val docs = Seq((1L, "a b c d"), (2L, "xy")).toDF("doc_id", "text")
    val pairs = Seq((2L, 1L)).toDF("id_a", "id_b")
    val r = Dedup.containmentVerify(pairs, docs, "doc_id", "text")
      .select("n_shingles_a", "containment_a", "containment_b")
      .collect().head
    assert(r.getLong(0) == 1L)
    assert(r.getDouble(1) == 0.0)
    assert(r.getDouble(2) == 0.0)
  }

  test("embeddingNearDupClusters groups near-identical vectors transitively") {
    def vec(base: Array[Double], eps: Double, at: Int): Seq[Double] = {
      val v = base.clone(); v(at) = v(at) + eps; v.toSeq
    }
    val a = Array(1.0, 0.02, 0.0, 0.01)
    val b = Array(0.0, 1.0, 0.03, 0.0)
    val rows = Seq(
      (1L, vec(a, 0.0, 0)), (2L, vec(a, 0.01, 1)), (3L, vec(a, 0.02, 2)),
      (4L, vec(b, 0.0, 0)), (5L, vec(b, 0.01, 3)),
      (9L, Seq(0.5, -0.5, 0.5, -0.5))) // unrelated direction
    val df = rows.toDF("vid", "emb")
    val out = Dedup.embeddingNearDupClusters(df, "emb", "vid",
      threshold = 0.995, numPlanes = 4, numTables = 3)
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == out(2L) && out(2L) == out(3L), s"group A must cluster: $out")
    assert(out(4L) == out(5L), s"group B must cluster: $out")
    assert(out(1L) != out(4L) && out(9L) == 9L, s"distinct directions stay apart: $out")
  }

  test("crossCorpusOverlap flags candidates sharing shingles with the reference") {
    val reference = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (101L, "lambda mu nu xi omicron pi rho sigma tau upsilon"))
      .toDF("doc_id", "text")
    val candidates = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // exact copy
      (2L, "intro words alpha beta gamma delta epsilon and some tail content here"), // partial
      (3L, "fully original content with no shared phrases at all anywhere"))
      .toDF("doc_id", "text")
    val out = Dedup.crossCorpusOverlap(candidates, reference, "doc_id", "text",
      shingleSize = 3)
      .select("doc_id", "overlap_frac").as[(Long, Double)].collect().toMap
    assert(out(1L) == 1.0, s"verbatim copy must be fully contaminated: $out")
    assert(out(2L) > 0.0 && out(2L) < 1.0, s"partial overlap in (0,1): $out")
    assert(out(3L) == 0.0, s"original content must not match: $out")
  }

  test("native and aggregate simhash are bit-identical") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "one"),
      (3L, "  spaced   out   tokens  "),
      (4L, "MiXeD Case text HERE"),
      (5L, "\tleading tab, trailing newline\n"),      // ADVICE r2: non-space edge ws
      (6L, ""))                                       // token-less -> 0L on both paths
      .toDF("doc_id", "text")
    val native = Dedup.simHash(docs, "text").select("doc_id", "simhash")
      .as[(Long, Long)].collect().toMap
    val agg = Dedup.simHashAgg(docs, "text").select("doc_id", "simhash")
      .as[(Long, Long)].collect().toMap
    assert(native == agg)
  }

  test("simHashCandidatePairs equals brute-force Hamming pairs (pigeonhole exactness)") {
    // a corpus with real near-dup structure: 12 base docs, each with a
    // lightly-perturbed twin, plus unrelated fillers — then verify the
    // bucketed algorithm returns EXACTLY the brute-force pair set
    val base = (0 until 12).map(i =>
      s"document number $i talks about spark shuffles partitions codegen and storage layer topic$i")
    val docs = (base.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      base.zipWithIndex.map { case (t, i) => (100L + i, t + " extra") } ++
      (0 until 8).map(i => (200L + i,
        s"completely different filler text about cooking recipe $i garden flowers weather")))
      .toDF("doc_id", "text")
    val sig = Dedup.simHash(docs, "text").select("doc_id", "simhash")
    val local = sig.as[(Long, Long)].collect().toSeq
    for (k <- Seq(0, 3, 6)) {
      val expected = (for {
        (a, ha) <- local; (b, hb) <- local if a < b
        if java.lang.Long.bitCount(ha ^ hb) <= k
      } yield (a, b, java.lang.Long.bitCount(ha ^ hb))).toSet
      val got = Dedup.simHashCandidatePairs(sig, "doc_id", maxHamming = k)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == expected,
        s"k=$k:\n missing=${expected -- got}\n spurious=${got -- expected}")
    }
    // Manku combination tables: same EXACT pair set at radius 6 with 8
    // blocks (28 tables of 16-bit keys) as with the direct 7-block split
    val k6expected = (for {
      (a, ha) <- local; (b, hb) <- local if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 6
    } yield (a, b, java.lang.Long.bitCount(ha ^ hb))).toSet
    val k6combo = Dedup.simHashCandidatePairs(sig, "doc_id", maxHamming = 6,
      blocks = 8).as[(Long, Long, Int)].collect().toSet
    assert(k6combo == k6expected,
      s"combination tables must stay exact:\n missing=${k6expected -- k6combo}")
    // blowup guard: identical docs all share every block; capping drops them
    val same = (1L to 6L).map(i => (i, "same text everywhere always"))
      .toDF("doc_id", "text")
    val sameSig = Dedup.simHash(same, "text").select("doc_id", "simhash")
    assert(Dedup.simHashCandidatePairs(sameSig, "doc_id", 3).count() == 15)
    assert(Dedup.simHashCandidatePairs(sameSig, "doc_id", 3, maxBucketSize = 5)
      .count() == 0)
    // guard: combination blowup fails fast
    intercept[IllegalArgumentException] {
      Dedup.simHashCandidatePairs(sameSig, "doc_id", maxHamming = 6, blocks = 20)
    }
  }

  test("simhash: identical text -> hamming 0; perturbed -> small; unrelated -> large") {
    val docs = Seq(
      (1L, "spark catalyst tungsten whole stage codegen shuffle exchange partition"),
      (2L, "spark catalyst tungsten whole stage codegen shuffle exchange partition"),
      (3L, "spark catalyst tungsten whole stage codegen shuffle exchange partitions"),
      (4L, "entirely unrelated vocabulary about cooking recipes and garden flowers"))
      .toDF("doc_id", "text")
    val h = Dedup.simHash(docs, "text").select("doc_id", "simhash")
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(h(a) ^ h(b))
    assert(ham(1L, 2L) == 0)
    assert(ham(1L, 3L) < ham(1L, 4L),
      s"near-dup ${ham(1L, 3L)} should be closer than unrelated ${ham(1L, 4L)}")
  }

  test("winnowingFingerprints ≡ an independent reference winnowing " +
    "(rightmost-min ties), shared-run guarantee, short/null docs " +
    "emit nothing, guards") {
    import org.apache.spark.sql.functions._
    // independent reference implementation
    def refWinnow(text: String, k: Int, w: Int): Set[(Long, Long)] = {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.length < k) Set.empty
      else {
        val hashes = (0 to toks.length - k).map { p =>
          val g = toks.slice(p, p + k).mkString(" ")
          val md5 = java.security.MessageDigest.getInstance("MD5")
            .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
          (p.toLong, java.lang.Long.parseLong(md5.take(13), 16))
        }
        (w - 1 until hashes.length).flatMap { i =>
          val win = hashes.slice(i - w + 1, i + 1)
          val m = win.map(_._2).min
          Seq(win.filter(_._2 == m).maxBy(_._1)) // rightmost min
        }.toSet
      }
    }
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "a b"),                                // < k tokens
      (4L, null.asInstanceOf[String]),            // null text
      (5L, "x y z w"))                            // 2 shingles < window
    val out = Dedup.winnowingFingerprints(texts.toDF("doc_id", "text"),
        "doc_id", "text", k = 3, window = 4)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (id, rs) =>
        id -> rs.map(r => (r._2, r._3)).toSet }
    assert(out.getOrElse(1L, Set.empty) ==
      refWinnow(texts.head._2, 3, 4), s"doc 1: ${out.get(1L)}")
    assert(out.getOrElse(2L, Set.empty) == refWinnow(texts(1)._2, 3, 4))
    assert(!out.contains(3L) && !out.contains(4L) && !out.contains(5L))

    // guarantee: a shared token run of length >= w + k - 1 = 6 yields
    // at least one shared fingerprint HASH between the two docs
    val shared = "one two three four five six"
    val pair = Seq(
      (10L, s"aa bb cc $shared dd ee ff"),
      (11L, s"zz yy $shared xx ww vv uu tt")).toDF("doc_id", "text")
    val fps = Dedup.winnowingFingerprints(pair, "doc_id", "text",
        k = 3, window = 4)
      .as[(Long, Long, Long)].collect().groupBy(_._1)
      .map { case (id, rs) => id -> rs.map(_._3).toSet }
    assert((fps(10L) & fps(11L)).nonEmpty, "shared run must fingerprint")

    intercept[IllegalArgumentException] {
      Dedup.winnowingFingerprints(pair, "doc_id", "text", k = 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.winnowingFingerprints(pair, "doc_id", "text", window = 0)
    }
  }
}
