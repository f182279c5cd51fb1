package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for document pipelines: tokenization, counts,
  * quality scoring, language-ID heuristics, fingerprinting. All are
  * narrow per-row column expressions (codegen'd builtins / higher-order
  * functions) — no UDFs, no shuffles.
  */
object TextFunctions {

  /** Whitespace tokenization. Empty tokens are filtered so empty /
    * whitespace-only text yields zero tokens (Spark's split returns [""]
    * there) — keeps ratios null-propagating and matches the SQL-engine
    * convention (`string_split_regex` + empty filter). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  /** BPE-ish subword split: words plus punctuation runs as separate tokens
    * (regexp-based approximation of a byte-pair pre-tokenizer). */
  def subwordTokens(text: Column): Column =
    filter(split(text, "(?<=\\W)|(?=\\W)"), t => trim(t) =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  def charCount(text: Column): Column = length(text)

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** ANSI-safe division: null (not DIVIDE_BY_ZERO) on a zero denominator,
    * so ratios null-propagate on empty/degenerate text. */
  private def safeDiv(num: Column, den: Column): Column =
    num / nullif(den.cast("double"), lit(0.0))

  /** Mean token length (characters per token, whitespace excluded). */
  def avgTokenLength(text: Column): Column =
    safeDiv(length(regexp_replace(text, "\\s+", "")).cast("double"),
      tokenCount(text))

  /** Type-token ratio — a standard lexical-diversity quality signal. */
  def typeTokenRatio(text: Column): Column =
    safeDiv(distinctTokenCount(text).cast("double"), tokenCount(text))

  /** Fraction of tokens found in `stopwords` (lowercased comparison). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val sw = array(stopwords.map(s => lit(s.toLowerCase)): _*)
    safeDiv(size(filter(tokens(lower(text)), t => array_contains(sw, t))).cast("double"),
      tokenCount(text))
  }

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column =
    safeDiv((length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double"),
      length(text))

  /** Character-level Shannon entropy (nats): −Σ_c p_c · ln p_c over the
    * text's character distribution — the gibberish/compression quality
    * signal (near 0 for repeated-char junk, ≈ ln(alphabet) for uniform
    * noise; natural prose sits in between). Zero-shuffle per-row HOF
    * chain: distinct chars sorted, per-char counts via a nested filter
    * (O(distinct × len) per row, distinct ≲ alphabet size), terms
    * rounded to the 9-grid and accumulated in DECIMAL so the sum is
    * order-independent and engine-exact. Empty text → 0.0. */
  def charEntropy(text: Column): Column =
    charEntropyFromChars(filter(split(text, ""), c => c =!= ""))

  /** [[charEntropy]] over an already-split char array. HOFs are
    * INTERPRETED in Spark (no codegen), so every reference to the array
    * argument re-evaluates its expression tree per row — pass a
    * MATERIALIZED column (`.withColumn("chars", split(...))`, then this
    * over `col("chars")`) and each reference is an O(1) bound read
    * instead of a fresh split; measured 5× on q152. The entropy itself:
    * distinct chars sorted, per-char counts via a nested filter
    * (O(distinct × len) array scans per row), terms rounded to the
    * 9-grid and accumulated in DECIMAL so the sum is order-independent
    * and engine-exact. Empty array → 0.0. */
  def charEntropyFromChars(chars: Column): Column = {
    val n = size(chars).cast("double")
    val counts = transform(array_sort(array_distinct(chars)),
      c => size(filter(chars, x => x === c)).cast("double"))
    val acc = aggregate(counts,
      lit(java.math.BigDecimal.ZERO).cast("decimal(28,9)"),
      (a, nc) => (a + round((nc / n) * log(nc / n), 9).cast("decimal(28,9)"))
        .cast("decimal(28,9)"))
    when(n > 0, -acc.cast("double")).otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: rewards moderate length, lexical
    * diversity and low punctuation noise. Deterministic and documented so
    * it can be reproduced in any SQL engine. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(tokenCount(text).cast("double") / lit(100.0), lit(1.0))
    val diversity = typeTokenRatio(text)
    val punctPenalty = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val swr = stopwordRatio(text, stopwords)
    // stopword ratio ~0.4 is natural prose; score peaks there
    val swScore = lit(1.0) - abs(swr - lit(0.4)) / lit(0.6)
    (lenScore + diversity + punctPenalty + greatest(swScore, lit(0.0))) / lit(4.0)
  }

  /** N-gram-profile language-ID heuristic: scores text against small
    * per-language marker-token sets and returns the argmax language code.
    * Tiny marker lists keep this a pure column expression; swap in real
    * profiles for production. Ties resolve by list order (deterministic). */
  def langIdHeuristic(text: Column,
                      profiles: Seq[(String, Seq[String])] = defaultProfiles): Column = {
    val toks = tokens(lower(text))
    val scored = profiles.map { case (lang, markers) =>
      val m = array(markers.map(lit(_)): _*)
      struct(size(filter(toks, t => array_contains(m, t))).as("score"), lit(lang).as("lang"))
    }
    // argmax by (score, reverse list position) — greatest favors later
    // elements on tie, so reverse order to make EARLIER profiles win ties
    val best = scored.zipWithIndex.map { case (s, i) =>
      struct(s.getField("score").as("score"), lit(profiles.size - i).as("prio"),
        s.getField("lang").as("lang"))
    }
    greatest(best: _*).getField("lang")
  }

  val defaultProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不"))

  /** Order-insensitive document fingerprint: sha2-256 over the sorted
    * distinct lowercase token set. Two documents with the same vocabulary
    * share a fingerprint regardless of word order — a cheap near-dup
    * bucket key. */
  def vocabFingerprint(text: Column): Column =
    sha2(array_join(array_sort(array_distinct(tokens(lower(text)))), " "), 256)

  /** Rolling (polynomial) hash over the token sequence — order-sensitive
    * fingerprint: h = (h * 31 + hash(token)) mod p, p = 1e9+7. Modular at
    * every step so it is ANSI-overflow-safe at any document length. */
  def rollingFingerprint(text: Column): Column = {
    val p = lit(1000000007L)
    aggregate(
      tokens(lower(text)),
      lit(0L),
      (acc, t) => pmod(acc * 31L + pmod(xxhash64(t), p), p))
  }

  /** All 0-based character offsets of a literal `needle` in `text`, as
    * an array<bigint> in left-to-right order — the span-locate primitive
    * under contamination auditing ("where exactly does the benchmark
    * string appear?") and snippet anchoring. Matching is literal (the
    * needle is regex-quoted) and NON-OVERLAPPING left-to-right: after a
    * match the scan resumes past it, so `"aaaa"` with needle `"aa"`
    * yields [0, 2] — the `string_split` convention every engine shares,
    * which is what makes the offsets SQL-oracle-able.
    *
    * Shape: one codegen'd `split` plus a per-row `aggregate` fold over
    * the parts (offset of occurrence i = Σ len(parts ≤ i) + (i−1)·|needle|)
    * — a narrow projection, no shuffle, no UDF; null text → null. */
  def occurrenceOffsets(text: Column, needle: String): Column = {
    require(needle.nonEmpty, "needle must be non-empty")
    val nl = lit(needle.length.toLong)
    val parts = split(text, java.util.regex.Pattern.quote(needle), -1)
    aggregate(
      parts,
      struct(lit(Array.empty[Long]).as("offs"), lit(0L).as("pos")),
      (acc, p) => struct(
        concat(acc.getField("offs"),
          array(acc.getField("pos") + length(p).cast("long"))).as("offs"),
        (acc.getField("pos") + length(p).cast("long") + nl).as("pos")),
      // the fold appends one candidate per part; the last part ends at
      // end-of-string, not at a needle — drop it
      acc => slice(acc.getField("offs"), lit(1),
        size(acc.getField("offs")) - 1))
  }

  /** PII pattern masks shared by the Spark column and the SQL oracle.
    * RE2-safe subset (no lookaround/backrefs) so the same pattern strings
    * run identically on Java regex (Spark) and RE2 (DuckDB/production
    * scanners) — cross-engine redaction parity is part of the contract. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\+\\d{1,2}-\\d{3}-\\d{4}", "<PHONE>"),
    ("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** Redact common PII (emails, phone numbers, IPv4 addresses) with typed
    * mask tokens — the pre-training scrub pass. Chained `regexp_replace`
    * stays inside whole-stage codegen; order matters (emails first, so an
    * address's digits are never half-eaten by the phone pattern). At
    * 100 TB this is a narrow per-row projection: no shuffle, no UDF. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (acc, (pat, mask)) =>
      regexp_replace(acc, pat, mask)
    }

  /** HTML entities decoded by [[stripMarkup]], in application order.
    * `&amp;` must decode LAST (the standard rule — otherwise
    * `&amp;lt;` would double-decode into `<`). */
  private val MarkupEntities = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")

  /** Strip markup from web-crawled text (the extraction pass before any
    * dedup/quality scoring): drop tags, decode the common entities,
    * collapse runs of whitespace. Tag removal is the RE2-safe
    * `<[^>]*>` → space (a tag boundary never glues two words together);
    * this is deliberately a TEXT-layer scrub, not an HTML parser — no
    * DOM, no script/style content model — which is exactly the
    * trafilatura-lite fast path a 100 TB crawl wants as its first
    * narrow projection. Chained codegen `regexp_replace`/`replace`:
    * no shuffle, no UDF. */
  def stripMarkup(text: Column): Column = {
    val untagged = regexp_replace(text, "<[^>]*>", " ")
    val decoded = MarkupEntities.foldLeft(untagged) {
      case (acc, (ent, repl)) => replace(acc, lit(ent), lit(repl))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}
