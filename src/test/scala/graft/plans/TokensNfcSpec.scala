package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.operators.Dedup

class TokensNfcSpec extends SparkSpec {
  import spark.implicits._

  // U+00E9 (precomposed) vs e + U+0301 (combining acute): canonically
  // equal, byte-different — the exact pair a multilingual corpus mixes
  private val composed   = "café crème brûlée dessert menu paris bistro corner"
  // derived programmatically so editor/tooling Unicode normalization can
  // never silently collapse the two literals into one form
  private val decomposed =
    java.text.Normalizer.normalize(composed, java.text.Normalizer.Form.NFD)

  test("tokenizer: NFC mode unifies composed/decomposed; default mode preserves bytes") {
    val nfcA = Tokens.whitespaceNfc(UTF8String.fromString(composed)).toSeq
    val nfcB = Tokens.whitespaceNfc(UTF8String.fromString(decomposed)).toSeq
    assert(nfcA == nfcB, "canonically-equal texts must tokenize identically under NFC")
    val rawA = Tokens.whitespace(UTF8String.fromString(composed)).toSeq
    val rawB = Tokens.whitespace(UTF8String.fromString(decomposed)).toSeq
    assert(rawA != rawB, "default mode is byte-faithful (oracle-parity contract)")
    // uppercase accents lowercase codepoint-correctly in both modes
    assert(Tokens.whitespace(UTF8String.fromString("CAFÉ")).toSeq == Seq("café"))
  }

  test("composed and decomposed accents dedup together under nfc = true (VERDICT r3 #4)") {
    val docs = Seq((1L, composed), (2L, decomposed)).toDF("doc_id", "text")
    // default mode: byte-different -> different signatures, no pair
    val sigRaw = Dedup.minHashSignature(docs, "text", shingleSize = 3, numHashes = 32)
    assert(Dedup.minHashCandidatePairs(sigRaw, "doc_id", 8, 4).count() == 0,
      "without NFC the pair must NOT band together")
    // NFC mode: identical signatures -> every band matches
    val sigNfc = Dedup.minHashSignature(docs, "text", shingleSize = 3, numHashes = 32,
      nfc = true)
    val sigs = sigNfc.select("minhash").as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1), "NFC-equal texts must have identical signatures")
    assert(Dedup.minHashCandidatePairs(sigNfc, "doc_id", 8, 4)
      .as[(Long, Long)].collect().toSeq == Seq((1L, 2L)))
    // same for simhash (hamming 0) and exact shingle sets (jaccard 1.0)
    val h = Dedup.simHash(docs, "text", nfc = true).select("simhash")
      .as[Long].collect()
    assert(h(0) == h(1), "NFC simhash fingerprints must match")
    val j = Dedup.jaccardVerify(Seq((1L, 2L)).toDF("id_a", "id_b"), docs,
      "doc_id", "text", nfc = true)
      .select("jaccard").as[Double].collect().head
    assert(j == 1.0)
    // and decontamination sees the verbatim (modulo normalization) copy
    val overlap = Dedup.crossCorpusOverlap(docs.filter($"doc_id" === 1L),
      docs.filter($"doc_id" === 2L), "doc_id", "text", shingleSize = 3, nfc = true)
      .select("overlap_frac").as[Double].collect().head
    assert(overlap == 1.0)
  }

  test("NFC mode runs inside whole-stage codegen (no interpreted fallback)") {
    // a parquet scan keeps the projection out of ConvertToLocalRelation
    // (a local Seq folds to LocalTableScan with nothing left to codegen)
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val plan = Dedup.minHashSignature(docs, "text", nfc = true)
      .select("minhash").queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project \\[.*minhash".r.findFirstIn(plan).isDefined,
      s"expected minhash inside a codegen'd (*-prefixed) Project in:\n$plan")
    assert(!plan.contains("CodegenFallback"), s"must not fall back:\n$plan")
  }
}
