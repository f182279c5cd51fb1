package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark merge spark window"),
    (2L, "window table row"),
    (3L, "spark spark spark"),
    (4L, "nothing relevant here")).toDF("doc_id", "text")

  test("postings: tf and 1-based positions per (token, doc)") {
    val out = TextIndex.postings(docs, "doc_id", "text")
      .select($"token", $"doc_id", $"tf", $"positions")
      .as[(String, Long, Long, Seq[Int])].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out(("spark", 1L)) == (2L, Seq(1, 3)))
    assert(out(("merge", 1L)) == (1L, Seq(2)))
    assert(out(("window", 1L)) == (1L, Seq(4)))
    assert(out(("spark", 3L)) == (3L, Seq(1, 2, 3)))
    assert(!out.contains(("spark", 2L)))
    // total postings = distinct (token, doc) pairs
    assert(out.size == 3 + 3 + 1 + 3)
  }

  test("bm25 matches an independent in-memory reference computation") {
    val q = Seq("spark", "window")
    val out = TextIndex.bm25(docs, "doc_id", "text", q)
      .as[(Long, Double)].collect().toMap

    // independent reference: plain Scala over the same corpus
    val corpus = Map(
      1L -> Seq("spark", "merge", "spark", "window"),
      2L -> Seq("window", "table", "row"),
      3L -> Seq("spark", "spark", "spark"),
      4L -> Seq("nothing", "relevant", "here"))
    val n = corpus.size.toDouble
    val avgdl = corpus.values.map(_.length).sum / n
    def score(d: Seq[String]): Double = q.distinct.map { t =>
      val tf = d.count(_ == t).toDouble
      if (tf == 0) 0.0
      else {
        val df = corpus.values.count(_.contains(t)).toDouble
        val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * d.length / avgdl))
      }
    }.sum
    corpus.foreach { case (id, toks) =>
      assert(math.abs(out(id) - score(toks)) < 1e-12, s"doc $id")
    }
    assert(out(4L) == 0.0, "no-match docs score 0 and stay in the output")
    // the all-spark doc must out-rank the no-match doc, and doc 1 (both
    // terms) must beat doc 2 (one rarer-term occurrence only)
    assert(out(1L) > out(2L) && out(3L) > out(4L))
  }

  test("rrfFuse: integer ranks, full-outer universes, known fusion values") {
    val a = Seq((1L, 10.0), (2L, 5.0), (3L, 1.0)).toDF("doc_id", "sa")
    val b = Seq((2L, 0.9), (3L, 0.8), (4L, 0.7)).toDF("doc_id", "sb")
    val out = TextIndex.rrfFuse(a, "sa", b, "sb", k = 60)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(out(1L) - 1.0 / 61) < 1e-15)          // rank 1 in a only
    assert(math.abs(out(2L) - (1.0 / 62 + 1.0 / 61)) < 1e-15)
    assert(math.abs(out(3L) - (1.0 / 63 + 1.0 / 62)) < 1e-15)
    assert(math.abs(out(4L) - 1.0 / 63) < 1e-15)          // b only
    // equal scores tie-break by id: both get consecutive ranks
    val ties = Seq((7L, 1.0), (5L, 1.0)).toDF("doc_id", "sa")
    val tied = TextIndex.rrfFuse(ties, "sa", ties.limit(0), "sa")
      .as[(Long, Double)].collect().toMap
    assert(tied(5L) > tied(7L), "lower id wins the tie (rank 1)")
  }

  test("persisted postings reads are PARTITION-PRUNED to the query terms' buckets") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val store = java.nio.file.Files.createTempDirectory("postings").toString + "/idx"
    // enough vocabulary to spread over many buckets
    val corpus = (1 to 80).map(i =>
      (i.toLong, s"common filler text t$i u$i v$i w${i % 7}")).toDF("doc_id", "text")
    TextIndex.persistPostings(corpus, "doc_id", "text", store, numBuckets = 16)
    assert(TextIndex.indexExists(spark, store))

    val all = spark.read.parquet(store + "/postings")
    val allBuckets = all.select("tb").distinct().as[Int].collect().toSeq
    assert(allBuckets.size >= 8, s"vocabulary should spread over many buckets: $allBuckets")

    val terms = Seq("t3", "u17")
    val pruned = TextIndex.readPostings(spark, store, terms)
    val scan = pruned.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    val expectBuckets = terms.map(TextIndex.tokenBucket(_, 16)).distinct
    assert(scan.selectedPartitions.partitionCount == expectBuckets.size,
      s"expected ${expectBuckets.size} selected partitions, " +
        s"got ${scan.selectedPartitions.partitionCount} of ${allBuckets.size}")
    assert(scan.selectedPartitions.totalNumberOfFiles < all.inputFiles.length,
      "pruned scan must list fewer files than the full index")
    // and the pruned read returns exactly the direct computation's rows
    val direct = TextIndex.postings(corpus, "doc_id", "text")
      .filter(col("token").isin(terms: _*))
      .select($"token", $"doc_id", $"tf").as[(String, Long, Long)].collect().toSet
    val got = pruned.select($"token", $"doc_id", $"tf")
      .as[(String, Long, Long)].collect().toSet
    assert(got == direct && got.nonEmpty)
  }

  test("bm25FromIndex scores the persisted corpus identically to bm25") {
    val store = java.nio.file.Files.createTempDirectory("postings").toString + "/idx"
    TextIndex.persistPostings(docs, "doc_id", "text", store, numBuckets = 8)
    val q = Seq("spark", "window")
    val direct = TextIndex.bm25(docs, "doc_id", "text", q)
      .as[(Long, Double)].collect().toMap
    val indexed = TextIndex.bm25FromIndex(spark, store, q)
      .as[(Long, Double)].collect().toMap
    assert(indexed.keySet == direct.keySet)
    direct.foreach { case (id, s) =>
      assert(math.abs(indexed(id) - s) < 1e-12, s"doc $id: ${indexed(id)} vs $s")
    }
    // the marker is written last: a store without it reads as absent
    val fresh = java.nio.file.Files.createTempDirectory("postings").toString + "/nope"
    assert(!TextIndex.indexExists(spark, fresh))
    intercept[IllegalArgumentException] {
      TextIndex.readPostings(spark, fresh, Seq("spark"))
    }
  }

  test("appendToIndex: incremental batches score identically to a full rebuild") {
    val store = java.nio.file.Files.createTempDirectory("postings").toString + "/idx"
    val all = (1 to 80).map(i =>
      (i.toLong, s"common filler text spark t$i u$i w${i % 7}")).toDF("doc_id", "text")
    val base = all.filter($"doc_id" <= 40)
    val batch = all.filter($"doc_id" > 40)
    TextIndex.persistPostings(base, "doc_id", "text", store, numBuckets = 8)
    TextIndex.appendToIndex(batch, "doc_id", "text", store, batchId = 1L)

    val q = Seq("spark", "t3", "u57")
    val direct = TextIndex.bm25(all, "doc_id", "text", q)
      .as[(Long, Double)].collect().toMap
    val indexed = TextIndex.bm25FromIndex(spark, store, q)
      .as[(Long, Double)].collect().toMap
    assert(indexed.keySet == direct.keySet && indexed.size == 80)
    direct.foreach { case (id, s) =>
      assert(math.abs(indexed(id) - s) < 1e-12, s"doc $id")
    }

    // replaying a completed batch is a no-op (idempotency key: batchId)
    TextIndex.appendToIndex(batch, "doc_id", "text", store, batchId = 1L)
    assert(TextIndex.readMeta(spark, store).nDocs == 80)
    assert(TextIndex.bm25FromIndex(spark, store, q)
      .as[(Long, Double)].collect().toMap == indexed)

    // un-manifested data (a crashed append's orphan) is invisible
    all.filter($"doc_id" === 1L)
      .select(lit("spark").as("token"), $"doc_id", lit(999L).as("tf"),
        array(lit(1)).as("positions"), lit(7L).as("ab"),
        lit(TextIndex.tokenBucket("spark", 8)).as("tb"))
      .write.mode("append").partitionBy("ab", "tb").parquet(store + "/postings")
    val afterOrphan = TextIndex.readPostings(spark, store, Seq("spark"))
      .filter($"tf" === 999L).count()
    assert(afterOrphan == 0, "orphan batch rows must not be readable")
  }

  test("phraseMatch: consecutive positions only, with occurrence counts") {
    val corpus = Seq(
      (1L, "new york city is the new york of cities"),
      (2L, "york new haven"),
      (3L, "new and also york but never adjacent"),
      (4L, "new new york york")).toDF("doc_id", "text")
    val post = TextIndex.postings(corpus, "doc_id", "text")
    val out = TextIndex.phraseMatch(post, Seq("new", "york"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 4L -> 1L),
      s"docs 2 (reversed) and 3 (non-adjacent) must not match: $out")
    // single-token phrase degenerates to term occurrence counts
    val one = TextIndex.phraseMatch(post, Seq("new")).as[(Long, Long)].collect().toMap
    assert(one == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
    // three-token phrase
    val three = TextIndex.phraseMatch(post, Seq("new", "york", "city"))
      .as[(Long, Long)].collect().toMap
    assert(three == Map(1L -> 1L))
    // a pruned persisted read feeds the same result — via the wrappers
    val store = java.nio.file.Files.createTempDirectory("postings").toString + "/idx"
    TextIndex.persistPostings(corpus, "doc_id", "text", store, numBuckets = 8)
    val viaStore = TextIndex.phraseMatchFromIndex(spark, store, Seq("new", "york"))
      .as[(Long, Long)].collect().toMap
    assert(viaStore == Map(1L -> 2L, 4L -> 1L))
    val slopStore = TextIndex.slopPhraseMatchFromIndex(spark, store,
      Seq("new", "york"), slop = 0).as[(Long, Long)].collect().toMap
    assert(slopStore == viaStore, "slop 0 over the index ≡ phrase over the index")
    val proxStore = TextIndex.proximityMatchFromIndex(spark, store,
      "new", "york", window = 1).as[(Long, Long)].collect().toMap
    assert(proxStore.keySet == Set(1L, 2L, 4L),
      "unordered window-1 admits the reversed doc 2 the phrase forms reject")
  }

  test("tfidf + cosine-to-doc match an independent reference; no shared token → no row") {
    val corpus = Map(
      1L -> "spark window merge spark",
      2L -> "window table row",
      3L -> "spark spark spark",
      4L -> "nothing shared here")
    val cdf = corpus.toSeq.toDF("doc_id", "text")
    val n = corpus.size.toDouble
    val dfs = corpus.values.flatMap(_.split(" ").distinct).toSeq
      .groupBy(identity).view.mapValues(_.size.toDouble).toMap
    def vec(s: String): Map[String, Double] =
      s.split(" ").toSeq.groupBy(identity).map { case (t, o) =>
        t -> o.size * math.log(n / dfs(t))
      }

    val w = TextIndex.tfidf(cdf, "doc_id", "text")
    val got = w.as[(Long, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    corpus.foreach { case (id, s) =>
      vec(s).foreach { case (t, x) =>
        assert(math.abs(got((id, t)) - x) < 1e-12, s"w($id, $t)")
      }
    }
    assert(got.size == corpus.values.map(_.split(" ").distinct.size).sum)

    def grid9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def cosRef(a: Map[String, Double], b: Map[String, Double]): Double = {
      val dot = a.keySet.intersect(b.keySet).toSeq.sorted
        .map(t => grid9(a(t) * b(t))).sum
      (dot.toDouble / (math.sqrt(a.values.toSeq.sorted.map(x => grid9(x * x)).sum.toDouble) *
        math.sqrt(b.values.toSeq.sorted.map(x => grid9(x * x)).sum.toDouble)))
    }
    val cos = TextIndex.tfidfCosineToDoc(w, queryDocId = 1L)
      .as[(Long, Double)].collect().toMap
    // doc 4 shares no token with doc 1: absent, not zero
    assert(cos.keySet == Set(2L, 3L))
    Seq(2L, 3L).foreach { id =>
      val ref = cosRef(vec(corpus(1L)), vec(corpus(id)))
      assert(math.abs(cos(id) - ref) < 1e-9, s"cos(1, $id): ${cos(id)} vs $ref")
    }
    // doc 3 (pure spark) beats doc 2 (one shared common term)
    assert(cos(3L) > cos(2L))
  }

  test("tfidfCosineBatch: single query ≡ tfidfCosineToDoc; topK per query; no self-pairs") {
    val corpus = Seq(
      (0L, "spark window merge spark"),
      (1L, "window table row"),
      (2L, "spark spark spark"),
      (3L, "merge window table"),
      (4L, "nothing shared here")).toDF("doc_id", "text")
    val w = TextIndex.tfidf(corpus, "doc_id", "text")
    val single = TextIndex.tfidfCosineToDoc(w, queryDocId = 0L)
      .as[(Long, Double)].collect().toMap
    val batch = TextIndex.tfidfCosineBatch(w, Seq(0L, 1L))
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(r => r._2 -> r._3).toMap }
    assert(batch(0L).keySet == single.keySet)
    single.foreach { case (d, c) =>
      assert(batch(0L)(d) == c, s"doc $d: bit-equal to the single-query form")
    }
    // query 1 candidates: docs sharing window/table/row; never itself;
    // doc 4 shares nothing with anyone
    assert(batch(1L).keySet == Set(0L, 3L))
    assert(!batch.values.exists(_.keySet.exists(d => batch.contains(d) &&
      batch(d).contains(d))), "self-pairs excluded")
    val top1 = TextIndex.tfidfCosineBatch(w, Seq(0L, 1L), topK = 1)
      .as[(Long, Long, Double)].collect()
    assert(top1.length == 2 && top1.map(_._1).toSet == Set(0L, 1L))
  }

  test("proximityMatch: unordered window co-occurrence with pair counts") {
    val corpus = Seq(
      (1L, "spark is a fast engine and merge works"),   // spark@1, merge@7: |d|=6
      (2L, "merge spark"),                              // adjacent, both orders
      (3L, "spark alone here"),
      (4L, "spark x x x x x merge spark")               // spark@{1,8}, merge@7
    ).toDF("doc_id", "text")
    val post = TextIndex.postings(corpus, "doc_id", "text")
    def prox(w: Int) = TextIndex.proximityMatch(post, "spark", "merge", w)
      .as[(Long, Long)].collect().toMap
    // window 1: only adjacency — doc 2 (|1-2|=1) and doc 4 (|8-7|=1)
    assert(prox(1) == Map(2L -> 1L, 4L -> 1L))
    // window 6: doc 1 joins (|1-7|=6); doc 4 now has both spark positions
    assert(prox(6) == Map(1L -> 1L, 2L -> 1L, 4L -> 2L))
    intercept[IllegalArgumentException] {
      TextIndex.proximityMatch(post, "spark", "spark", 3)
    }
  }

  test("manifest swap never leaves zero visible manifests; readMeta picks the highest version") {
    val store = java.nio.file.Files.createTempDirectory("postings").toString + "/idx"
    TextIndex.persistPostings(docs, "doc_id", "text", store, numBuckets = 8)
    val dir = new java.io.File(store)
    def markers = dir.listFiles().map(_.getName)
      .filter(n => n.startsWith("_graft_index_meta.") && !n.endsWith("__tmp")).sorted.toSeq
    assert(markers == Seq("_graft_index_meta.1"))
    // an append swaps to version 2 and cleans version 1
    TextIndex.appendToIndex(docs.select($"doc_id" + 100 as "doc_id", $"text"),
      "doc_id", "text", store, batchId = 1L)
    assert(markers == Seq("_graft_index_meta.2"))
    val meta2 = TextIndex.readMeta(spark, store)
    assert(meta2.nDocs == 8 && meta2.batches == Seq(0L, 1L))
    // simulate a crash BETWEEN write-new and delete-old: plant a stale
    // LOWER version alongside — readers must pick the highest, and the
    // next swap must sweep the stale one
    java.nio.file.Files.write(
      java.nio.file.Paths.get(store, "_graft_index_meta.1"),
      "8 999 999 0".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(markers.size == 2)
    assert(TextIndex.readMeta(spark, store) == meta2,
      "highest version wins over the stale survivor")
    TextIndex.appendToIndex(docs.select($"doc_id" + 200 as "doc_id", $"text"),
      "doc_id", "text", store, batchId = 2L)
    assert(markers == Seq("_graft_index_meta.3"),
      "a swap sweeps every older version")
    assert(TextIndex.readMeta(spark, store).nDocs == 12)
  }

  test("guards: append batchId 0 is rejected; absent store fails friendly everywhere") {
    val store = java.nio.file.Files.createTempDirectory("postings").toString + "/idx"
    TextIndex.persistPostings(docs, "doc_id", "text", store, numBuckets = 8)
    val e = intercept[IllegalArgumentException] {
      TextIndex.appendToIndex(docs, "doc_id", "text", store, batchId = 0L)
    }
    assert(e.getMessage.contains("batchId must be > 0"),
      "batch 0 would silently read as a completed replay of the base build")
    val absent = java.nio.file.Files.createTempDirectory("postings").toString + "/nope"
    Seq(
      () => TextIndex.bm25FromIndex(spark, absent, Seq("spark")),
      () => TextIndex.bm25BatchFromIndex(spark, absent,
        Seq((1L, "spark")).toDF("query_id", "token")),
      () => TextIndex.compactIndex(spark, absent)
    ).foreach { f =>
      val err = intercept[IllegalArgumentException](f())
      assert(err.getMessage.contains("no persisted index"), err.getMessage)
    }
  }

  test("bm25Batch: one job scores all queries; single query ≡ bm25; topK per query") {
    val queries = Seq(
      (1L, "spark"), (1L, "window"),
      (2L, "table"), (2L, "row"),
      (3L, "spark")).toDF("query_id", "token")
    val out = TextIndex.bm25Batch(docs, "doc_id", "text", queries)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // per-query reference: the single-query operator, zero-score docs dropped
    Seq(Seq("spark", "window"), Seq("table", "row"), Seq("spark"))
      .zipWithIndex.foreach { case (terms, qi) =>
        val single = TextIndex.bm25(docs, "doc_id", "text", terms)
          .filter($"score" > 0).as[(Long, Double)].collect().toMap
        val batch = out.collect { case ((q, d), s) if q == qi + 1 => d -> s }
        assert(batch.keySet == single.keySet, s"query ${qi + 1} candidate sets")
        single.foreach { case (d, s) =>
          assert(math.abs(batch(d) - s) < 1e-12, s"query ${qi + 1} doc $d")
        }
      }
    // topK = 1 keeps exactly each query's best doc (rounded grid, id tie-break)
    val top1 = TextIndex.bm25Batch(docs, "doc_id", "text", queries, topK = 1)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(top1.keySet == Set(1L, 2L, 3L))
    assert(top1(3L) == 3L, "the all-spark doc wins the pure-spark query")
  }

  test("bm25BatchFromIndex ≡ bm25Batch over the indexed corpus (pruned read, manifest stats)") {
    val store = java.nio.file.Files.createTempDirectory("postings").toString + "/idx"
    val corpus = (1 to 60).map(i =>
      (i.toLong, s"common filler spark text t$i u$i w${i % 7}")).toDF("doc_id", "text")
    TextIndex.persistPostings(corpus.filter($"doc_id" <= 30), "doc_id", "text",
      store, numBuckets = 8)
    TextIndex.appendToIndex(corpus.filter($"doc_id" > 30), "doc_id", "text",
      store, batchId = 1L)
    val queries = Seq(
      (10L, "spark"), (10L, "t3"),
      (20L, "w2"), (20L, "u17"),
      (30L, "filler")).toDF("query_id", "token")
    val direct = TextIndex.bm25Batch(corpus, "doc_id", "text", queries)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val indexed = TextIndex.bm25BatchFromIndex(spark, store, queries)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(indexed.keySet == direct.keySet && indexed.nonEmpty)
    direct.foreach { case (k, s) =>
      assert(math.abs(indexed(k) - s) < 1e-12, s"$k: ${indexed(k)} vs $s")
    }
    // topK flows through the index path too
    val top2 = TextIndex.bm25BatchFromIndex(spark, store, queries, topK = 2)
    assert(top2.groupBy($"query_id").count().as[(Long, Long)].collect()
      .forall(_._2 <= 2))
  }

  test("phraseMatchBatch: per query ≡ single phraseMatch, incl. one-term " +
      "and repeated-term phrases, on the sf0.001 corpus") {
    val corpus = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select($"doc_id", $"text")
    val post = TextIndex.postings(corpus, "doc_id", "text")
    val phrases = Seq(
      Seq("table", "window"), Seq("row"), Seq("value", "value"),
      Seq("spark", "merge"))
    val batch = TextIndex.phraseMatchBatch(post,
        phrases.zipWithIndex.map { case (p, i) => ((i + 1).toLong, p) }
          .toDF("query_id", "terms"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    phrases.zipWithIndex.foreach { case (p, i) =>
      val single = TextIndex.phraseMatch(post, p)
        .as[(Long, Long)].collect().toMap
      assert(batch.getOrElse((i + 1).toLong, Map.empty) == single,
        s"phrase $p")
    }
  }

  test("snippetBatch: per query ≡ single snippet on the sf0.001 corpus") {
    val corpus = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select($"doc_id", $"text")
    val terms = Seq("vector", "table", "stream")
    val batch = TextIndex.snippetBatch(corpus, "doc_id", "text",
        terms.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
          .toDF("query_id", "token"), width = 2)
      .as[(Long, Long, Int, String)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => r._2 -> (r._3, r._4)).toMap).toMap
    terms.zipWithIndex.foreach { case (t, i) =>
      val single = TextIndex.snippet(corpus, "doc_id", "text", t, width = 2)
        .as[(Long, Int, String)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(batch.getOrElse((i + 1).toLong, Map.empty) == single, s"term $t")
    }
  }

  test("fuzzyTermQueryBatch: per query ≡ single fuzzyTermQuery on the " +
      "sf0.001 corpus") {
    val corpus = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select($"doc_id", $"text")
    val post = TextIndex.postings(corpus, "doc_id", "text")
    val needles = Seq("vektor", "tabel", "streem")
    val batch = TextIndex.fuzzyTermQueryBatch(post,
        needles.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
          .toDF("query_id", "term"), maxDist = 1)
      .as[(Long, Long, String, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => (r._2, r._3) -> (r._4, r._5)).toSet).toMap
    needles.zipWithIndex.foreach { case (t, i) =>
      val single = TextIndex.fuzzyTermQuery(post, t, maxDist = 1)
        .as[(Long, String, Long, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toSet
      assert(batch.getOrElse((i + 1).toLong, Set.empty) == single,
        s"needle $t")
    }
  }

  test("slopPhraseMatch: in-order window matches; slop 0 ≡ phraseMatch; repeated terms") {
    val corpus = Seq(
      (1L, "new york city is the new york of cities"),
      (2L, "york new haven"),                     // wrong order
      (3L, "new big york"),                       // one gap: slop >= 1
      (4L, "new a b york"),                       // two gaps: slop >= 2
      (5L, "new new york york")).toDF("doc_id", "text")
    val post = TextIndex.postings(corpus, "doc_id", "text")
    def slopMap(s: Int) = TextIndex.slopPhraseMatch(post, Seq("new", "york"), s)
      .as[(Long, Long)].collect().toMap
    // slop 0 ≡ exact phrase
    val exact = TextIndex.phraseMatch(post, Seq("new", "york"))
      .as[(Long, Long)].collect().toMap
    assert(slopMap(0) == exact)
    // slop 1 admits doc 3 (one interleaved token) and doc 5's (2,3) pair +
    // (1,3): tuples are counted — new@1,new@2 × york@3,york@4 within slack
    val s1 = slopMap(1)
    assert(s1(3L) == 1L && !s1.contains(4L) && !s1.contains(2L))
    // doc 5: new@{1,2}, york@{3,4}; slack(p1,p2)=p2-p1-1<=1 admits
    // (1,3), (2,3), (2,4) but not (1,4)
    assert(s1(5L) == 3L)
    assert(slopMap(2)(4L) == 1L, "two interleaved tokens need slop 2")
    // three terms in order, bounded total slack
    val corpus3 = Seq(
      (1L, "alpha x beta gamma"),                 // slack 1
      (2L, "alpha beta x x gamma"),               // slack 2
      (3L, "gamma beta alpha")).toDF("doc_id", "text")
    val post3 = TextIndex.postings(corpus3, "doc_id", "text")
    val t1 = TextIndex.slopPhraseMatch(post3, Seq("alpha", "beta", "gamma"), 1)
      .as[(Long, Long)].collect().toMap
    assert(t1 == Map(1L -> 1L), "total slack across the whole span, in order only")
    val t2 = TextIndex.slopPhraseMatch(post3, Seq("alpha", "beta", "gamma"), 2)
      .as[(Long, Long)].collect().toMap
    assert(t2 == Map(1L -> 1L, 2L -> 1L))
  }

  test("compactIndex folds batches into one generation: fewer files, identical scores") {
    val store = java.nio.file.Files.createTempDirectory("postings").toString + "/idx"
    val all = (1 to 90).map(i =>
      (i.toLong, s"common filler spark text t$i u$i w${i % 7}")).toDF("doc_id", "text")
    TextIndex.persistPostings(all.filter($"doc_id" <= 30), "doc_id", "text",
      store, numBuckets = 8)
    TextIndex.appendToIndex(all.filter($"doc_id" > 30 && $"doc_id" <= 60),
      "doc_id", "text", store, batchId = 1L)
    TextIndex.appendToIndex(all.filter($"doc_id" > 60), "doc_id", "text",
      store, batchId = 2L)
    val q = Seq("spark", "t3", "u57")
    val before = TextIndex.bm25FromIndex(spark, store, q)
      .as[(Long, Double)].collect().toMap
    def abDirs = new java.io.File(store + "/postings").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("ab=")).map(_.getName).sorted.toSeq
    def fileCount = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(store))
    }
    assert(abDirs == Seq("ab=0", "ab=1", "ab=2"))
    val filesBefore = fileCount

    TextIndex.compactIndex(spark, store)
    assert(abDirs == Seq("ab=-1"), "superseded generations are swept")
    assert(fileCount < filesBefore, s"$fileCount vs $filesBefore")
    val meta = TextIndex.readMeta(spark, store)
    assert(meta.batches == Seq(-1L) && meta.nDocs == 90)
    val after = TextIndex.bm25FromIndex(spark, store, q)
      .as[(Long, Double)].collect().toMap
    assert(after == before, "compaction moves bytes, not content")

    // the index stays appendable and re-compactable after compaction
    TextIndex.appendToIndex(
      all.select($"doc_id" + 1000 as "doc_id", $"text"), "doc_id", "text",
      store, batchId = 3L)
    assert(TextIndex.readMeta(spark, store).nDocs == 180)
    TextIndex.compactIndex(spark, store)
    assert(abDirs == Seq("ab=-2") && TextIndex.readMeta(spark, store).nDocs == 180)
    assert(TextIndex.bm25FromIndex(spark, store, q).count() == 180)
  }

  test("rrfFuse topM prunes each candidate list before ranking") {
    val a = Seq((1L, 10.0), (2L, 5.0), (3L, 1.0)).toDF("doc_id", "sa")
    val b = Seq((2L, 0.9), (3L, 0.8), (4L, 0.7)).toDF("doc_id", "sb")
    val out = TextIndex.rrfFuse(a, "sa", b, "sb", k = 60, topM = 2)
      .as[(Long, Double)].collect().toMap
    // doc 3 falls outside a's top 2 (rank would be 3) but holds b's rank 2;
    // doc 4 falls outside b's top 2 entirely and vanishes from the fusion
    assert(math.abs(out(1L) - 1.0 / 61) < 1e-15)
    assert(math.abs(out(2L) - (1.0 / 62 + 1.0 / 61)) < 1e-15)
    assert(math.abs(out(3L) - 1.0 / 62) < 1e-15)
    assert(!out.contains(4L), "a doc outside both top-M lists must not appear")
  }

  test("snippet: window clamps at both document edges; first occurrence wins; width 0") {
    val got = TextIndex.snippet(docs, "doc_id", "text", "spark", width = 1)
      .as[(Long, Int, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 1: first occurrence at pos 1 (left edge clamps), not pos 3
    assert(got(1L) == ((1, "spark merge")))
    assert(got(3L) == ((1, "spark spark")))
    assert(!got.contains(2L) && !got.contains(4L), "non-matching docs drop out")
    val right = TextIndex.snippet(docs, "doc_id", "text", "row", width = 5)
      .as[(Long, Int, String)].collect().head
    assert(right == ((2L, 3, "window table row")), "right edge clamps")
    val w0 = TextIndex.snippet(docs, "doc_id", "text", "table", width = 0)
      .as[(Long, Int, String)].collect().head
    assert(w0 == ((2L, 2, "table")), "width 0 = just the match")
  }

  test("booleanQuery: must/should/mustNot semantics; index form ≡ docs form; degenerate rejected") {
    val docs = Seq(
      (1L, "alpha beta gamma"),        // must + 2 should
      (2L, "alpha beta"),              // must + 1 should
      (3L, "alpha delta"),             // must, 0 should
      (4L, "alpha beta banned"),       // excluded by mustNot
      (5L, "beta gamma"))              // missing must
      .toDF("doc_id", "text")
    val post = TextIndex.postings(docs, "doc_id", "text")
    val out = TextIndex.booleanQuery(post, must = Seq("alpha"),
        should = Seq("beta", "gamma"), mustNot = Seq("banned"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 1L, 3L -> 0L), s"$out")

    // minShould turns optional into a threshold; multi-term must is AND
    val th = TextIndex.booleanQuery(post, must = Seq("alpha"),
        should = Seq("beta", "gamma"), minShould = 2)
      .as[(Long, Long)].collect().toMap
    assert(th == Map(1L -> 2L))
    val and2 = TextIndex.booleanQuery(post, must = Seq("alpha", "beta"))
      .as[(Long, Long)].collect().toMap
    assert(and2.keySet == Set(1L, 2L, 4L), s"$and2")
    // should-only with a threshold works without any must
    val shouldOnly = TextIndex.booleanQuery(post, must = Nil,
        should = Seq("beta", "gamma"), minShould = 2)
      .as[(Long, Long)].collect().toMap
    assert(shouldOnly.keySet == Set(1L, 5L))

    // persisted-index form answers identically off the pruned buckets
    val store = java.nio.file.Files.createTempDirectory("bq-idx").toString + "/s"
    TextIndex.persistPostings(docs, "doc_id", "text", store, numBuckets = 4)
    val fromIdx = TextIndex.booleanQueryFromIndex(spark, store,
        must = Seq("alpha"), should = Seq("beta", "gamma"),
        mustNot = Seq("banned"))
      .as[(Long, Long)].collect().toMap
    assert(fromIdx == out, "index form ≡ docs form")

    intercept[IllegalArgumentException](
      TextIndex.booleanQuery(post, must = Nil, should = Seq("beta")))
    intercept[IllegalArgumentException](
      TextIndex.booleanQuery(post, must = Seq("alpha"),
        mustNot = Seq("alpha")))
  }

  test("fuzzyTermQuery: distance-banded vocab gate, exact match at 0, length pruning") {
    val docs = Seq(
      (1L, "vector vector store"),   // exact, tf 2
      (2L, "vectr index"),           // deletion, d=1
      (3L, "victor writes"),         // substitution, d=1
      (4L, "vectorize all"),         // 3 edits + length out of band
      (5L, "nothing here"))
      .toDF("doc_id", "text")
    val post = TextIndex.postings(docs, "doc_id", "text")
    val out = TextIndex.fuzzyTermQuery(post, "vector", maxDist = 1)
      .select($"doc_id", $"matched_token", $"distance", $"tf".cast("long"))
      .as[(Long, String, Long, Long)].collect().toSet
    assert(out == Set((1L, "vector", 0L, 2L), (2L, "vectr", 1L, 1L),
      (3L, "victor", 1L, 1L)), s"$out")

    // widening the band admits more ('vectorize' = 3 insertions);
    // guards reject nonsense
    val wide = TextIndex.fuzzyTermQuery(post, "vector", maxDist = 3)
      .select($"matched_token").distinct().as[String].collect().toSet
    assert(wide.contains("vectorize"), s"d=3 admits the 3-insert token: $wide")
    intercept[IllegalArgumentException](
      TextIndex.fuzzyTermQuery(post, "", maxDist = 1))
    intercept[IllegalArgumentException](
      TextIndex.fuzzyTermQuery(post, "vector", maxDist = 4))
  }

  test("prefixComplete: frequency ranking, token tiebreak, k cap") {
    val docs = Seq(
      (1L, "query queue query quest"),
      (2L, "query queue quick"),
      (3L, "quota other words"))
      .toDF("doc_id", "text")
    val post = TextIndex.postings(docs, "doc_id", "text")
    val out = TextIndex.prefixComplete(post, "qu", k = 3)
      .as[(String, Long, Long)].collect().toList
    // freq: query 3 (df 2), queue 2 (df 2), quest/quick/quota 1 each —
    // k=3 cuts at the tie-break (quest < quick < quota)
    assert(out == List(("query", 3L, 2L), ("queue", 2L, 2L),
      ("quest", 1L, 1L)), s"$out")
    // narrower prefix; no matches -> empty
    assert(TextIndex.prefixComplete(post, "que", k = 10)
      .as[(String, Long, Long)].collect().toSet ==
      Set(("query", 3L, 2L), ("queue", 2L, 2L), ("quest", 1L, 1L)))
    assert(TextIndex.prefixComplete(post, "zz", k = 5).isEmpty)
    intercept[IllegalArgumentException](TextIndex.prefixComplete(post, "", 5))
    intercept[IllegalArgumentException](TextIndex.prefixComplete(post, "q", 0))
  }

  test("persistVocab: range-clustered prefix serving, disjoint file ranges, staleness guard") {
    val store = java.nio.file.Files.createTempDirectory("vocab").toString + "/idx"
    // 120 distinct tokens + a high-frequency one for ranking
    val corpus = (0 until 120).map(i =>
      (i.toLong, f"tok$i%03d common")).toDF("doc_id", "text")
    TextIndex.persistPostings(corpus, "doc_id", "text", store, numBuckets = 8)
    TextIndex.persistVocab(spark, store, files = 6)

    // served prefix ≡ direct postings computation
    val served = TextIndex.prefixCompleteFromVocab(spark, store, "tok0", 5)
      .as[(String, Long, Long)].collect().toList
    val direct = TextIndex.prefixComplete(
        TextIndex.postings(corpus, "doc_id", "text"), "tok0", 5)
      .as[(String, Long, Long)].collect().toList
    assert(served == direct && served.size == 5, s"$served")

    // each vocab file covers a DISJOINT token range (what makes parquet
    // min/max stats skip files for a prefix predicate)
    val files = new java.io.File(store + "/vocab").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
    assert(files.size >= 4, s"expected several range files: ${files.size}")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min($"token"), max($"token")).collect()(0)
      (r.getString(0), r.getString(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"file ranges overlap: $ranges")
      case _ =>
    }

    // growth past the vocab snapshot fails LOUD, not silently stale
    TextIndex.appendToIndex(
      Seq((500L, "tokzzz fresh")).toDF("doc_id", "text"),
      "doc_id", "text", store, batchId = 1L)
    val ex = intercept[IllegalArgumentException](
      TextIndex.prefixCompleteFromVocab(spark, store, "tok0", 5))
    assert(ex.getMessage.contains("STALE"), ex.getMessage)
    TextIndex.persistVocab(spark, store, files = 6)
    assert(TextIndex.prefixCompleteFromVocab(spark, store, "tokz", 5)
      .as[(String, Long, Long)].collect().toList == List(("tokzzz", 1L, 1L)))
  }
}
