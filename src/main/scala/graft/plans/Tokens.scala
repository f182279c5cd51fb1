package graft.plans

import org.apache.spark.unsafe.types.UTF8String

/** The ONE whitespace tokenizer shared by every native dedup expression
  * ([[MinHashSignature]], [[SimHash64]], [[ShingleHashSet]]), defined to be
  * bit-reproducible by pure Spark builtins:
  *
  *   `filter(split(lower(text), '\\s+'), x -> x <> '')`
  *
  * i.e. lowercase, split on runs of whitespace, drop empty tokens. Dropping
  * empties (rather than trimming first) makes the two sides agree on edge
  * whitespace: Java `String.trim` strips all chars <= U+0020 while Spark
  * `trim` strips only ' ', and Spark `split` keeps leading/trailing empty
  * strings — the round-2 divergence (ADVICE r2) where text with a leading
  * tab produced an extra empty token on the builtin path only.
  * A token-less text (empty or all-whitespace) yields an empty array on
  * both paths.
  *
  * ==NFC mode (multilingual corpora)==
  * [[whitespaceNfc]] additionally applies Unicode NFC normalization before
  * lowercasing, so canonically-equal but byte-different strings (é as
  * U+00E9 vs e + combining acute U+0301) tokenize — and therefore
  * MinHash/SimHash/shingle-dedup — identically. Real LLM corpora mix
  * producers that emit either form; without normalization such pairs never
  * band together. NFC is OPT-IN (`nfc = true` on the native expressions):
  * the default mode stays the engine's oracle-parity contract, because
  * Spark has no builtin NFC function — the pure-builtin cross-check
  * formulations (`minHashSignatureAgg`, `simHashAgg`) cannot express it,
  * and the DuckDB oracle side would need `nfc_normalize()` glue. The
  * bit-identical-to-builtin claim therefore applies to the DEFAULT mode
  * only; NFC mode is value-checked by its own spec (composed and
  * decomposed é dedup together).
  */
object Tokens {

  /** Lowercase + split + drop-empties over a pre-processed string. */
  private def splitNonEmpty(lowered: String): Array[String] = {
    val raw = lowered.split("\\s+")
    var empties = 0
    var i = 0
    while (i < raw.length) { if (raw(i).isEmpty) empties += 1; i += 1 }
    if (empties == 0) raw
    else {
      val out = new Array[String](raw.length - empties)
      var j = 0
      i = 0
      while (i < raw.length) {
        if (raw(i).nonEmpty) { out(j) = raw(i); j += 1 }
        i += 1
      }
      out
    }
  }

  def whitespace(text: UTF8String): Array[String] =
    splitNonEmpty(text.toString.toLowerCase(java.util.Locale.ROOT))

  /** NFC-normalize, then lowercase (locale-independent), then split.
    * `Normalizer.isNormalized` short-circuits the common all-ASCII row to
    * a cheap scan — NFC mode costs nothing on ASCII corpora. */
  def whitespaceNfc(text: UTF8String): Array[String] = {
    val s = text.toString
    val normalized =
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    splitNonEmpty(normalized.toLowerCase(java.util.Locale.ROOT))
  }

  /** Mode dispatch used by the native expressions (and their codegen). */
  def tokens(text: UTF8String, nfc: Boolean): Array[String] =
    if (nfc) whitespaceNfc(text) else whitespace(text)

  /** The builtin-SQL twin of [[whitespace]] for agg-form cross-checks
    * (default mode only — Spark has no builtin NFC). */
  def whitespaceSql(textCol: String): String =
    s"filter(split(lower($textCol), '\\\\s+'), x -> x <> '')"
}
