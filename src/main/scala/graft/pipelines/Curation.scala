package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.operators.{Dedup, Quality, Splits, Pack}

/** End-to-end training-data curation: markup strip → quality gates
  * (length + within-doc repetition) → exact dedup → near dedup →
  * temperature-scaled source mixing → optional chunking — every stage an
  * operator this engine already ships, composed as ONE LAZY PLAN (the
  * [[TsePipelines]] discipline): nothing materializes until the caller
  * acts, so Catalyst sees the whole chain — column pruning reaches the
  * scan (a gate that only needs token counts never reads dropped docs'
  * text downstream), and the narrow stages (strip, gates, mixing filter)
  * fuse into the same codegen'd pass.
  *
  * Stage order is the standard curation recipe: cheap narrow gates first
  * (strip, length — per-row, no shuffle), then the repetition gate (two
  * doc-keyed shuffles), then exact dedup (hash shuffle), then MinHash
  * near-dup over the ALREADY exact-deduped corpus (the expensive stage
  * runs on the smallest surviving set), then mixing (broadcast rate
  * filter — must run last so rates reflect the post-dedup distribution).
  *
  * Near-dup semantics are GREEDY KEEP-LOWEST-ID: a document is dropped
  * iff a verified near-duplicate (Jaccard >= threshold) with a smaller
  * id exists — deterministic and single-plan (no iterative connected
  * components; for transitive cluster-level dedup use
  * [[graft.operators.Graph.connectedComponents]] as in q77). In a chain
  * a ~ b ~ c with a ≁ c, greedy drops b AND c; CC-based dedup would
  * keep c in its own right. That over-drop is the documented trade for
  * a one-pass plan — both are accepted curation policies.
  */
object Curation {

  /** Gate thresholds and stage knobs. `nearDup = false` skips the
    * MinHash stage (its candidates depend on engine hash seeds, so the
    * oracled q130 runs strip→gates→exact→mix; the near-dup stage is
    * value-checked in CurationSpec against a step-by-step reference).
    * `chunkSize > 0` emits (id, chunk_id, n_tokens, chunk_text) chunks
    * instead of whole documents. */
  final case class Config(
      minTokens: Int = 10,
      maxTokens: Int = 10000,
      maxDupBigramFrac: Double = 0.2,
      shingleSize: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      nearDupJaccard: Double = 0.8,
      nearDup: Boolean = true,
      mixAlpha: Double = 0.5,
      chunkSize: Int = 0,
      chunkStride: Int = 0,
      boilerplateMinCount: Int = 0,
      boilerplateDelimiter: String = "\n",
      dupSpanK: Int = 0)

  /** The composed plan. Output: (idCol, groupCol, clean_text, n_tokens)
    * — or chunk rows when `cfg.chunkSize > 0`. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             groupCol: String, cfg: Config = Config()): DataFrame = {
    // 0. boilerplate line removal (optional) — BEFORE the markup strip:
    //    stripMarkup normalizes all whitespace and would destroy the
    //    line delimiter. Verbatim-repeat matching is well-defined on raw
    //    lines; the op returns (id, clean_text, counts), groupCol rides
    //    back via a narrow id-keyed join.
    val preStripped =
      if (cfg.boilerplateMinCount <= 0)
        docs.select(col(idCol), col(groupCol), col(textCol).as("__raw"))
      else Quality.removeBoilerplateLines(docs, idCol, textCol,
          cfg.boilerplateMinCount, cfg.boilerplateDelimiter)
        .select(col(idCol), col("clean_text").as("__raw"))
        .join(docs.select(col(idCol), col(groupCol)), Seq(idCol))
        .select(col(idCol), col(groupCol), col("__raw"))
    // 1. markup strip — narrow codegen'd projection
    val clean = preStripped.select(col(idCol), col(groupCol),
      TF.stripMarkup(col("__raw")).as("clean_text"))
    // 1c. cross-doc substring excision (optional, Lee et al.): duplicated
    //     spans cut everywhere so newly-identical remnants fall to the
    //     exact-dedup stage below. The detect subtree is referenced
    //     twice (spans + excise input) — Catalyst plans it twice; the
    //     trade for staying one lazy plan, same as any self-join.
    val afterSpans =
      if (cfg.dupSpanK <= 0) clean
      else {
        val spans = Dedup.duplicateSpans(clean, idCol, "clean_text",
          cfg.dupSpanK)
        Dedup.exciseSpans(clean, idCol, "clean_text", spans)
          .select(col(idCol), col("clean_text"))
          // groupCol passes through cleaning untouched — recover it from
          // the RAW docs, not from `clean`, which would re-plan the
          // whole boilerplate+strip chain a third time just for one
          // pass-through column
          .join(docs.select(col(idCol), col(groupCol)), Seq(idCol))
          .select(col(idCol), col(groupCol), col("clean_text"))
      }
    // 2a. length gate — narrow
    val lenGated = afterSpans.filter(TF.tokenCount(col("clean_text"))
      .between(cfg.minTokens, cfg.maxTokens))
    // 2b. repetition gate: dup-bigram fraction (Gopher-family signal);
    //     both engines compute it as ratios of small integers, so the
    //     threshold compare is exact cross-engine
    val rep = Quality.repetitionSignals(
      lenGated.select(col(idCol), col("clean_text")), idCol, "clean_text", n = 2)
    val gated = lenGated.join(
      rep.filter(col("dup_ngram_frac") <= cfg.maxDupBigramFrac).select(col(idCol)),
      Seq(idCol), "left_semi")
    // 3. exact dedup: sha2 of content, keep lowest id — hashes shuffle,
    //    not documents
    val exact = Dedup.exactByContent(gated, "clean_text", idCol)
      .drop("content_hash")
    // 4. near dedup (greedy keep-lowest-id; see object doc)
    val deduped =
      if (!cfg.nearDup) exact
      else {
        val sigs = Dedup.minHashSignature(
          exact.select(col(idCol), col("clean_text")), "clean_text",
          cfg.shingleSize)
        val cand = Dedup.minHashCandidatePairs(sigs, idCol, cfg.bands,
          cfg.rowsPerBand)
        val verified = Dedup.jaccardVerify(cand, exact, idCol, "clean_text",
          cfg.shingleSize)
          .filter(col("jaccard") >= cfg.nearDupJaccard)
        exact.join(verified.select(col("id_b").as(idCol)).distinct(),
          Seq(idCol), "left_anti")
      }
    // 5. temperature mixing — rates reflect the POST-dedup distribution
    val mixed = Splits.temperatureKeep(deduped, idCol, groupCol, cfg.mixAlpha)
      .select(col(idCol), col(groupCol), col("clean_text"),
        TF.tokenCount(col("clean_text")).cast("long").as("n_tokens"))
    // 6. optional chunking for embedding/training ingest — narrow fan-out
    if (cfg.chunkSize <= 0) mixed
    else Pack.chunkTokens(mixed, idCol, "clean_text", cfg.chunkSize,
      if (cfg.chunkStride > 0) cfg.chunkStride else cfg.chunkSize)
  }
}
