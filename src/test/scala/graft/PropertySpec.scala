package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Dedup, Merge}

/** Algebraic invariants (SURVEY.md §5.3) checked over ScalaCheck-generated
  * inputs with fixed seeds (deterministic CI). Row counts are small — the
  * properties are about semantics, not scale. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(Int, Int, Int)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0, 5), Gen.choose(0, 100), Gen.choose(0, 1000)))

  private def samples(n: Int): Seq[List[(Int, Int, Int)]] =
    (1 to n).map(i => rowsGen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("union-all count additivity") {
    for (Seq(a, b) <- samples(6).grouped(2)) {
      val da = a.toDF("k", "v", "ord")
      val db = b.toDF("k", "v", "ord")
      assert(da.unionByName(db).count() == a.length + b.length)
    }
  }

  test("keepFirst dedup is idempotent and keys are unique after") {
    for (rows <- samples(4)) {
      val df = rows.toDF("k", "v", "ord")
      val once = Dedup.keepFirst(df, Seq("k"), Seq(col("ord"), col("v")))
      val twice = Dedup.keepFirst(once, Seq("k"), Seq(col("ord"), col("v")))
      assert(once.select("k").distinct().count() == once.count())
      assert(once.orderBy("k").collect().toSeq == twice.orderBy("k").collect().toSeq)
    }
  }

  test("sum aggregation is invariant to repartitioning") {
    for (rows <- samples(4)) {
      val df = rows.toDF("k", "v", "ord")
      val a = df.groupBy("k").agg(sum("v")).orderBy("k").collect().toSeq
      val b = df.repartition(7).groupBy("k").agg(sum("v")).orderBy("k").collect().toSeq
      assert(a == b)
    }
  }

  test("upsert applied twice equals once (idempotence)") {
    for (Seq(t, u) <- samples(6).grouped(2)) {
      val target = Dedup.keepFirst(t.toDF("k", "v", "ord"), Seq("k"), Seq(col("ord"), col("v")))
      val updates = u.toDF("k", "v", "ord")
      val tb = Seq(col("ord"), col("v"))
      val once = Merge.upsert(target, updates, Seq("k"), tb)
      val twice = Merge.upsert(once, updates, Seq("k"), tb)
      assert(once.orderBy("k", "v", "ord").collect().toSeq ==
        twice.orderBy("k", "v", "ord").collect().toSeq)
    }
  }

  test("insertIfAbsent never changes existing rows and never duplicates keys") {
    for (Seq(t, u) <- samples(6).grouped(2)) {
      val target = Dedup.keepFirst(t.toDF("k", "v", "ord"), Seq("k"), Seq(col("ord"), col("v")))
      val inserts = u.toDF("k", "v", "ord")
      val out = Merge.insertIfAbsent(target, inserts, Seq("k"), Seq(col("ord"), col("v")))
      assert(out.select("k").distinct().count() == out.count())
      val changed = target.as("t").join(out.as("o"), Seq("k"))
        .filter($"t.v" =!= $"o.v").count()
      assert(changed == 0)
    }
  }

  test("connectedComponents is invariant to edge order, direction, and partitioning") {
    import graft.operators.Graph
    for (rows <- samples(4)) {
      // random small graph: node ids 0..5, edges from (k, v%6)
      val edges = rows.map { case (a, b, _) => (a.toLong, (b % 6).toLong) }
      val base = Graph.connectedComponents(edges.toDF("src", "dst"))
        .orderBy("id").collect().toSeq
      val shuffled = Graph.connectedComponents(
        scala.util.Random.javaRandomToRandom(new java.util.Random(42))
          .shuffle(edges.map { case (a, b) => (b, a) }) // reversed + reordered
          .toDF("src", "dst").repartition(7))
        .orderBy("id").collect().toSeq
      assert(base == shuffled)
    }
  }

  test("scd2FromChanges output intervals tile each key's timeline") {
    import graft.operators.Merge
    for (rows <- samples(4)) {
      // unique ts per key for a total order
      val changes = rows.zipWithIndex
        .map { case ((k, _, v), i) => (k.toLong, i.toLong, (v % 3).toLong) }
        .toDF("k", "ts", "attr")
      val out = Merge.scd2FromChanges(changes, Seq("k"), "ts", Seq("attr"))
        .select($"k", $"attr", $"valid_from", $"valid_to")
        .as[(Long, Long, Long, Option[Long])].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._3)).toMap
      out.foreach { case (_, vers) =>
        // exactly one open interval per key, and valid_to chains to the
        // next version's valid_from with no gaps or overlaps
        assert(vers.count(_._4.isEmpty) == 1)
        vers.sliding(2).foreach {
          case Array(a, b) =>
            assert(a._4.contains(b._3), s"intervals must tile: $vers")
            assert(a._2 != b._2, s"consecutive versions must differ: $vers")
          case _ => ()
        }
      }
    }
  }

  private val textGen: Gen[List[(Long, String)]] = {
    val word = Gen.oneOf("alpha", "beta", "user@example.com", "+1-555-0000",
      "10.0.0.1", "café", "café", "plain", "x1")
    Gen.listOfN(12, Gen.listOfN(8, word).map(_.mkString(" ")))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
  }

  test("redactPii is idempotent (a redacted corpus re-redacts to itself)") {
    import graft.functions.TextFunctions
    for (i <- 1 to 3) {
      val rows = textGen.pureApply(Gen.Parameters.default, Seed(100L + i))
      val df = rows.toDF("id", "text")
      val once = df.select($"id", TextFunctions.redactPii($"text").as("r"))
      val twice = once.select($"id", TextFunctions.redactPii($"r").as("r"))
      assert(once.orderBy("id").collect().toSeq ==
        twice.orderBy("id").collect().toSeq)
    }
  }

  test("NFC normalization is idempotent and stable on ASCII") {
    for (i <- 1 to 3) {
      val rows = textGen.pureApply(Gen.Parameters.default, Seed(200L + i))
      val df = rows.toDF("id", "text")
      val once = df.select($"id", graft.plans.NfcNormalize($"text").as("n"))
      val twice = once.select($"id", graft.plans.NfcNormalize($"n").as("n"))
      assert(once.orderBy("id").collect().toSeq ==
        twice.orderBy("id").collect().toSeq)
      // pure-ASCII rows pass through unchanged
      val ascii = df.filter(!$"text".contains("caf"))
      assert(ascii.select(graft.plans.NfcNormalize($"text") === $"text")
        .as[Boolean].collect().forall(identity))
    }
  }

  test("chunk dedup conserves chunks: one owner per distinct chunk, counts additive") {
    for (i <- 1 to 3) {
      val rows = textGen.pureApply(Gen.Parameters.default, Seed(300L + i))
      val df = rows.toDF("doc_id", "text")
      val chunks = Dedup.chunkFirstOccurrence(df, "doc_id", "text", chunkTokens = 3)
      val total = chunks.count()
      val owners = chunks.filter($"is_first").count()
      val distinctHashes = chunks.select("chunk_hash").distinct().count()
      assert(owners == distinctHashes,
        "exactly one is_first owner per distinct chunk")
      // every doc is represented (token-less included) and counts add up
      assert(chunks.select("doc_id").distinct().count() == rows.length)
      assert(chunks.filter(!$"is_first").count() == total - owners)
    }
  }

  test("GoldenStore: any batch partition of the rows folds to the " +
    "same golden records as the one-shot batch merge") {
    val gen = Gen.listOfN(40, Gen.zip(Gen.choose(0, 6),
      Gen.oneOf("F", "O", "P"), Gen.choose(1, 9), Gen.choose(0, 500)))
    for (i <- 1 to 3) {
      val rows = gen.pureApply(Gen.Parameters.default, Seed(400L + i))
        .zipWithIndex.map { case ((e, st, d, p), j) =>
          (e.toLong, st, d, p.toDouble, j.toLong)
        }
      val df = rows.toDF("eid", "status", "day", "price", "rowid")
      val store = java.nio.file.Files
        .createTempDirectory("prop-golden").toString + "/s"
      // partition rows into i+1 batches by rowid modulus
      (0 to i).foreach { b =>
        graft.operators.GoldenStore.append(
          df.filter($"rowid" % (i + 1) === b), "eid", store, b.toLong,
          mostFrequent = Seq("status"), minOf = Seq("day"),
          maxOf = Seq("price"),
          latestBy = Some(("day", Seq("rowid"))))
      }
      val served = graft.operators.GoldenStore.serve(spark, store)
        .select("eid", "status", "day", "price", "rowid")
        .orderBy("eid").collect().toSeq
      val batch = Merge.goldenRecord(df, "eid",
          mostFrequent = Seq("status"), minOf = Seq("day"),
          maxOf = Seq("price"), latestBy = Some(("day", Seq("rowid"))))
        .select("eid", "status", "day", "price", "rowid")
        .orderBy("eid").collect().toSeq
      assert(served == batch, s"split into ${i + 1} batches")
    }
  }

  test("Ranks.globalSuffixMin ≡ single-window suffix min on random " +
    "values across bucket counts") {
    val gen = Gen.listOfN(120, Gen.choose(-500, 500))
    for (i <- 1 to 3) {
      val vals = gen.pureApply(Gen.Parameters.default, Seed(500L + i))
        .zipWithIndex.map { case (v, r) => (r.toLong + 1L, v.toDouble) }
      val df = vals.toDF("rank", "v")
      val expected = vals.map { case (r, _) =>
        (r, vals.filter(_._1 >= r).map(_._2).min)
      }.toSet
      for (b <- Seq(3, 32)) {
        val got = graft.operators.Ranks
          .globalSuffixMin(df, "rank", "v", "sm", buckets = b)
          .select("rank", "sm").as[(Long, Double)].collect().toSet
        assert(got == expected, s"seed $i buckets $b")
      }
    }
  }

  test("Ranks.globalNtile ANSI invariants on random inputs: tile sizes " +
    "differ by at most 1, larger tiles first, order-monotone") {
    val gen = Gen.listOfN(90, Gen.choose(-10000, 10000))
    for (i <- 1 to 3; tiles <- Seq(3, 7, 13)) {
      val keys = gen.pureApply(Gen.Parameters.default, Seed(900L + i))
        .distinct.map(_.toLong)
      val df = keys.toDF("k")
      val got = graft.operators.Ranks.globalNtile(df, "k", tiles, "t")
        .as[(Long, Long)].collect().sortBy(_._1)
      val sizes = got.groupBy(_._2).map { case (t, xs) => t -> xs.length }
      val n = keys.length
      // every tile 1..min(tiles, n) non-empty, sizes within 1,
      // larger tiles first
      assert(sizes.keySet == (1 to math.min(tiles, n)).map(_.toLong).toSet)
      assert(sizes.values.max - sizes.values.min <= 1, s"$sizes")
      val ordered = (1 to math.min(tiles, n)).map(t => sizes(t.toLong))
      assert(ordered == ordered.sorted.reverse, s"big tiles first: $ordered")
      assert(sizes.values.sum == n)
      // tile is monotone in key order
      assert(got.map(_._2).sliding(2).forall(p =>
        p.length < 2 || p(0) <= p(1)))
    }
  }

  test("Ranks.globalRankStats invariants on random tied inputs: " +
    "cume_dist in (0,1] and monotone, percent_rank in [0,1) with 0 at " +
    "the minimum, both constant within a tie level") {
    val gen = Gen.listOfN(150, Gen.choose(0, 12))
    for (i <- 1 to 3) {
      val vals = gen.pureApply(Gen.Parameters.default, Seed(1300L + i))
        .map(_.toLong)
      val df = vals.toDF("v")
      val got = graft.operators.Ranks.globalRankStats(df, "v")
        .as[(Long, Double, Double)].collect()
      val byLevel = got.groupBy(_._1)
      byLevel.foreach { case (_, xs) =>
        assert(xs.map(x => (x._2, x._3)).distinct.length == 1,
          "stats must be constant within a tie level")
      }
      val levels = byLevel.keys.toSeq.sorted
      val cds = levels.map(l => byLevel(l).head._3)
      val prs = levels.map(l => byLevel(l).head._2)
      assert(cds.forall(c => c > 0.0 && c <= 1.0) && cds.last == 1.0)
      assert(cds == cds.sorted && prs == prs.sorted)
      assert(prs.head == 0.0 && prs.forall(p => p >= 0.0 && p < 1.0))
    }
  }
}
