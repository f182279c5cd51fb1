package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** In-flight data-quality observation — `df.observe` metrics computed
  * DURING the main job, not by a second scan.
  *
  * The naive quality gate (`df.count()`, `df.filter(bad).count()`, then
  * the real write) reads a 100 TB input three times; `observe` attaches
  * aggregates to the plan itself, so row counts, null rates and range
  * violations are collected as a side product of the action that was
  * running anyway. The reference logs row counts per pipeline stage
  * (load.py logging); this is that, at zero extra passes.
  */
object Quality {

  /** Attach standard quality metrics for `cols` to the frame: total row
    * count plus a null count per column. Returns the (unchanged) frame
    * and the [[Observation]] to read AFTER an action has run:
    * {{{
    *   val (df2, obs) = Quality.observeNulls(df, Seq("id", "text"))
    *   df2.write.parquet(out)                    // the one and only pass
    *   val nullIds = obs.get("null_id").asInstanceOf[Long]
    * }}} */
  def observeNulls(df: DataFrame, cols: Seq[String],
                   name: String = "graft_quality"): (DataFrame, Observation) = {
    require(cols.nonEmpty, "observeNulls needs at least one column")
    val obs = Observation(name)
    val metrics: Seq[Column] = count(lit(1)).as("n_rows") +:
      cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Observation with caller-supplied aggregate expressions (each must be
    * aliased). Same single-pass contract. */
  def observed(df: DataFrame, name: String, metrics: Column*): (DataFrame, Observation) = {
    require(metrics.nonEmpty, "observed needs at least one metric")
    val obs = Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Token-length histogram per group: fixed-width bins over each doc's
    * token count — the corpus-profile view behind length-based quality
    * cuts (too-short fragments, runaway concatenations). Output:
    * (groupCols…, bin, bin_lo, n_docs) with bin_lo = bin · binWidth.
    * One narrow projection + one (group, bin) aggregation. */
  def lengthHistogram(docs: DataFrame, textCol: String,
                      groupCols: Seq[String], binWidth: Int): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val g = groupCols.map(col)
    docs
      .select(g :+ size(graft.functions.TextFunctions.tokens(col(textCol)))
        .cast("long").as("__len"): _*)
      .groupBy(g :+ floor(col("__len") / binWidth).as("bin"): _*)
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("bin_lo", col("bin") * binWidth)
      .select(g ++ Seq(col("bin"), col("bin_lo"), col("n_docs")): _*)
  }

  /** Within-document repetition signals (the Gopher-repetition family of
    * pre-training quality filters, token-level): for each doc with at
    * least `n` tokens,
    *
    *  - `dup_ngram_frac` = 1 − distinct n-grams / total n-grams — the
    *    share of n-gram slots occupied by a repeat (0 = no repetition);
    *  - `top_ngram_frac` = occurrences-of-most-frequent-n-gram × n /
    *    token count — the share of tokens attributable to the single
    *    most repeated n-gram (loops/boilerplate push this toward 1).
    *
    * Both are ratios of small integers, so the doubles are
    * engine-exact. Output: (idCol, dup_ngram_frac, top_ngram_frac).
    *
    * Scale shape: one narrow n-gram expansion (sequence + explode +
    * slice + concat_ws, codegen'd), one (doc, gram) count with map-side
    * partial aggregation, one per-doc roll-up — two shuffles keyed by
    * doc-sized groups, nothing corpus-wide. */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String,
                        n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val tk = graft.functions.TextFunctions.tokens(col(textCol))
    val grams = docs
      .select(col(idCol), tk.as("__tk"))
      .filter(size(col("__tk")) >= n)
      .select(col(idCol), size(col("__tk")).as("__len"),
        explode(sequence(lit(1), size(col("__tk")) - n + 1, lit(1))).as("__i"),
        col("__tk"))
      .select(col(idCol), col("__len"),
        concat_ws(" ", slice(col("__tk"), col("__i"), lit(n))).as("__gram"))
    grams
      .groupBy(col(idCol), col("__len"), col("__gram"))
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(col(idCol), col("__len"))
      .agg(
        (lit(1.0) - count(lit(1)).cast("double") / sum(col("__cnt")))
          .as("dup_ngram_frac"),
        (max(col("__cnt")).cast("double") * n / col("__len").cast("double"))
          .as("top_ngram_frac"))
      .select(col(idCol), col("dup_ngram_frac"), col("top_ngram_frac"))
  }

  /** Character-level Shannon entropy per document, table form — the
    * gibberish/compression quality signal at corpus scale. Same value
    * as [[graft.functions.TextFunctions.charEntropy]] (bit-equal on the
    * 9-grid DECIMAL term accumulation), different execution: explode +
    * two WHOLE-STAGE-CODEGEN hash aggregations instead of interpreted
    * nested HOFs — measured 5.3 s → sub-second at sf0.1. Use the Column
    * form only for one-off per-row composition; this for corpus sweeps.
    *
    * Scale shape: one narrow char explode, one (doc, char) count with
    * map-side partial agg, a doc-keyed window for the total (the
    * following per-doc roll-up reuses the window's partitioning — no
    * third exchange). Every doc survives: empty text → 0.0. */
  def charEntropies(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val dec9 = (c: Column) => round(c, 9).cast("decimal(28,9)")
    val cnt = docs
      .select(col(idCol),
        explode(filter(split(col(textCol), ""), c => c =!= "")).as("__c"))
      .groupBy(col(idCol), col("__c"))
      .agg(count(lit(1)).cast("double").as("__nc"))
    val withTot = cnt.withColumn("__n",
      sum(col("__nc")).over(Window.partitionBy(col(idCol))))
    val ent = withTot
      .groupBy(col(idCol))
      .agg((-sum(dec9((col("__nc") / col("__n")) *
        log(col("__nc") / col("__n")))).cast("double")).as("char_entropy"))
    docs.select(col(idCol)).join(ent, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("char_entropy"), lit(0.0)).as("char_entropy"))
  }

  /** Per-document lexical statistics — the vocabulary-shape quality
    * signals beside [[charEntropies]] (character-level) and
    * [[repetitionSignals]] (n-gram level): type-token ratio (lexical
    * diversity — machine-generated spam runs low), stopword ratio (real
    * prose carries function words; keyword-stuffed or non-linguistic
    * text doesn't), hapax ratio (share of the vocabulary used exactly
    * once), and mean token length. Tokens are the engine's ONE
    * whitespace contract ([[graft.plans.Tokens]]: lowercase, split on
    * whitespace runs, drop empties); `stopwords` are matched lowercase.
    *
    * Scale shape: one narrow token explode, one (doc, token) count with
    * map-side partial aggregation, one doc-keyed roll-up — the
    * [[charEntropies]] table form (codegen hash aggs, not interpreted
    * per-row HOFs). Ratios are integer-over-integer doubles rounded 6.
    * Every doc survives: token-less text → zero counts with null
    * ratios (unjudgeable, not perfect). Output: (idCol, n_tokens,
    * n_types, ttr, stopword_ratio, hapax_ratio, mean_token_len). */
  def lexicalStats(docs: DataFrame, idCol: String, textCol: String,
                   stopwords: Seq[String]): DataFrame = {
    require(stopwords.nonEmpty, "lexicalStats needs a stopword list")
    val stopArr = array(stopwords.map(s => lit(s.toLowerCase)): _*)
    val toks = expr(
      s"filter(split(lower($textCol), '\\\\s+'), x -> x <> '')")
    val cells = docs
      .select(col(idCol), explode(toks).as("__t"))
      .groupBy(col(idCol), col("__t"))
      .agg(count(lit(1)).as("__c"))
    val per = cells.groupBy(col(idCol)).agg(
      sum(col("__c")).as("n_tokens"),
      count(lit(1)).as("n_types"),
      sum(when(col("__c") === 1L, 1L).otherwise(0L)).as("__hapax"),
      sum(when(array_contains(stopArr, col("__t")), col("__c"))
        .otherwise(0L)).as("__stop"),
      sum(length(col("__t")).cast("long") * col("__c")).as("__len"))
    docs.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        round(col("n_types").cast("double") / col("n_tokens"), 6)
          .as("ttr"),
        round(col("__stop").cast("double") / col("n_tokens"), 6)
          .as("stopword_ratio"),
        round(col("__hapax").cast("double") / col("n_types"), 6)
          .as("hapax_ratio"),
        round(col("__len").cast("double") / col("n_tokens"), 6)
          .as("mean_token_len"))
  }

  /** Boilerplate line removal — the C4/RefinedWeb corpus-frequency cut:
    * a LINE (navigation chrome, cookie banner, license header, template
    * footer) that repeats verbatim across the corpus at least `minCount`
    * times is boilerplate; every occurrence is excised and each document
    * reassembled from its surviving lines, in order. Complements
    * [[Dedup.duplicateSpans]] (any-alignment token runs): this is the
    * line-structured variant that keeps the DOCUMENT as the unit.
    *
    * Lines are `delimiter`-separated (literal, regex-quoted; '\n' for
    * real text), trimmed before counting and reassembly; whitespace-only
    * segments are dropped unconditionally. Output keeps EVERY input row:
    * (idCol, clean_text — surviving lines joined with '\n', '' when
    * everything was boilerplate — n_kept, n_dropped).
    *
    * Scale shape: the frequency count shuffles only (xxhash64(line),
    * 1) pairs with map-side partial aggregation; the flagged set (lines
    * at count ≥ minCount — rare by definition) joins back on the same
    * 8-byte key, AQE broadcasting when small. Line TEXT shuffles exactly
    * once, in the per-doc reassembly groupBy, which any text-out
    * transform pays. Line equality is by 64-bit hash (the hashed-key
    * discipline): collisions can only over-count a line's frequency,
    * never lose a document. */
  def removeBoilerplateLines(docs: DataFrame, idCol: String, textCol: String,
                             minCount: Int = 3,
                             delimiter: String = "\n"): DataFrame = {
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    require(delimiter.nonEmpty, "delimiter must be non-empty")
    val lines = docs
      .select(col(idCol),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(delimiter)))
          .as(Seq("__line_no", "__raw")))
      .select(col(idCol), col("__line_no"), trim(col("__raw")).as("__norm"))
      .filter(col("__norm") =!= "")
    val boiler = lines
      .groupBy(xxhash64(col("__norm")).as("__h"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minCount)
      .select(col("__h"), lit(true).as("__boiler"))
    val flagged = lines
      .withColumn("__h", xxhash64(col("__norm")))
      .join(boiler, Seq("__h"), "left")
      .withColumn("__drop", coalesce(col("__boiler"), lit(false)))
    val rebuilt = flagged
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(
            when(!col("__drop"), struct(col("__line_no"), col("__norm"))))),
          s => s.getField("__norm")), "\n").as("clean_text"),
        sum(when(col("__drop"), 0L).otherwise(1L)).as("n_kept"),
        sum(when(col("__drop"), 1L).otherwise(0L)).as("n_dropped"))
    docs.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
  }

  /** Character-class profile per document: total characters and how
    * many are ASCII letters / digits / whitespace — the cheap
    * script/markup composition signal beside [[charEntropies]]
    * (machine-generated text skews digit/punct-heavy, scraped markup
    * whitespace-heavy; non-Latin scripts show as a low letter ratio
    * against n_chars). Counts are EXACT integers (strip-and-diff
    * lengths over codegen'd regexp_replace — no float ratios inside
    * the engine, so the numbers cross engines bit-for-bit; derive
    * ratios downstream at whatever grid the consumer wants). One
    * narrow projection, no shuffle. */
  def charClassProfile(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val t = col(textCol)
    def stripped(re: String) =
      (length(t) - length(regexp_replace(t, re, ""))).cast("long")
    docs.select(col(idCol),
      length(t).cast("long").as("n_chars"),
      stripped("[A-Za-z]").as("n_letters"),
      stripped("[0-9]").as("n_digits"),
      stripped("[ \\t\\n\\r]").as("n_space"))
  }

  /** Deterministic token masking — the MLM-style data-augmentation
    * primitive: each token masks independently with probability
    * `rate`, where the coin is the engine's cross-engine md5 uniform
    * over (salt, doc id, token position) — so the SAME document always
    * masks the SAME way on any engine, any partitioning, any rerun
    * (the reproducible-manifest property an augmented corpus needs; a
    * `rand()` mask can never be audited). Position-keyed, not
    * token-keyed: two occurrences of one word draw independent coins.
    *
    * Runs as ONE per-row codegen-able expression chain (tokenize →
    * indexed transform → re-join), zero shuffle — an augmentation pass
    * over 100 TB is a map job, exactly as it should be. Tokens are the
    * engine's lowercase-whitespace contract. Output: (idCol,
    * n_tokens, n_masked, masked_text). */
  def maskTokens(docs: DataFrame, idCol: String, textCol: String,
                 rate: Double, maskToken: String = "[MASK]",
                 salt: String = "msk"): DataFrame = {
    require(rate > 0.0 && rate < 1.0, s"rate must be in (0,1), got $rate")
    require(!maskToken.contains("'") && !salt.contains("'"),
      "maskToken/salt must be quote-free (they ride a SQL literal)")
    // null text must read as zero tokens (the q268 oracle's (0, 0, '')
    // contract), not null-propagate through size/aggregate/array_join
    val toks = s"coalesce(${graft.plans.Tokens.whitespaceSql(textCol)}," +
      " CAST(array() AS ARRAY<STRING>))"
    // idCol is backtick-quoted inside the generated SQL (the psiSweep
    // escaping discipline)
    val u = s"((CAST(conv(substring(md5(concat('$salt'," +
      s" CAST(`$idCol` AS STRING), '#', CAST(i AS STRING))), 1, 13)," +
      s" 16, 10) AS DOUBLE) + 1.0D) / 4503599627370496.0D)"
    val masked = expr(
      s"transform($toks, (t, i) -> CASE WHEN $u < ${rate}D" +
        s" THEN '$maskToken' ELSE t END)")
    // count by the coin, not the emitted token — an original token
    // that happens to equal the mask literal must not inflate the count
    val nMasked = expr(
      s"aggregate(transform($toks, (t, i) -> CASE WHEN $u < ${rate}D" +
        s" THEN 1 ELSE 0 END), 0, (a, x) -> a + x)")
    docs.select(col(idCol),
      expr(s"size($toks)").cast("long").as("n_tokens"),
      nMasked.cast("long").as("n_masked"),
      array_join(masked, " ").as("masked_text"))
  }

  /** Deterministic SPAN corruption — the T5-style denoising pair
    * generator beside [[maskTokens]]' single-token MLM coin: tokens
    * partition into fixed `spanLen` blocks, each block drops with
    * probability `rate` (md5 coin over (salt, doc id, block index) —
    * same reproducible-manifest property as maskTokens), and the doc
    * renders BOTH training sides:
    *  - `corrupted_text`: surviving tokens with each dropped block
    *    replaced by one ordinal sentinel `<extra_id_k>` (k counts
    *    dropped blocks left-to-right);
    *  - `targets_text`: the dropped blocks in order, each prefixed by
    *    its sentinel — exactly the seq2seq target T5 trains on.
    *
    * One per-row codegen-able expression chain (the sentinel ordinal
    * is an O(blocks²) indexed filter-count, the maskTokens occurrence
    * discipline), zero shuffle. The quadratic per-doc shape carries a
    * fail-fast envelope (the [[graft.plans.TokenLcs]] discipline): a
    * doc whose block count exceeds `maxBlocksPerDoc` raises with a
    * remedy instead of burning one task for minutes — at the default
    * 10⁴ blocks the ordinal work is ≤ 10⁸ HOF steps per doc. Raise
    * `spanLen` or pre-chunk giant docs ([[Pack.chunkTokens]]) to stay
    * inside it. Tokens are the engine's lowercase-whitespace
    * contract; null/empty text yields (0, 0, 0, '', '').
    * Output: (idCol, n_tokens, n_spans, n_masked_tokens,
    * corrupted_text, targets_text). */
  def corruptSpans(docs: DataFrame, idCol: String, textCol: String,
                   rate: Double, spanLen: Int = 3,
                   salt: String = "spn",
                   maxBlocksPerDoc: Int = 10000): DataFrame = {
    require(rate > 0.0 && rate < 1.0, s"rate must be in (0,1), got $rate")
    require(spanLen >= 1, s"spanLen must be >= 1, got $spanLen")
    require(!salt.contains("'"), "salt must be quote-free")
    require(maxBlocksPerDoc >= 1,
      s"maxBlocksPerDoc must be >= 1, got $maxBlocksPerDoc")
    val toks = s"coalesce(${graft.plans.Tokens.whitespaceSql(textCol)}," +
      " CAST(array() AS ARRAY<STRING>))"
    // md5 uniform over the BLOCK index b
    def u(b: String) = s"((CAST(conv(substring(md5(concat('$salt'," +
      s" CAST(`$idCol` AS STRING), '#', CAST($b AS STRING))), 1, 13)," +
      s" 16, 10) AS DOUBLE) + 1.0D) / 4503599627370496.0D)"
    def masked(b: String) = s"${u(b)} < ${rate}D"
    val nBlocks = s"CAST(ceil(size($toks) / CAST($spanLen AS DOUBLE)) AS INT)"
    // per-row fail-fast envelope on the O(blocks²) ordinal work
    def guarded(inner: String) =
      s"CASE WHEN $nBlocks > $maxBlocksPerDoc THEN raise_error(concat(" +
        s"'corruptSpans: doc ', CAST(`$idCol` AS STRING), ' has ', " +
        s"CAST($nBlocks AS STRING), ' blocks > maxBlocksPerDoc " +
        s"$maxBlocksPerDoc (sentinel ordinals are O(blocks^2) per doc) " +
        s"— raise spanLen or pre-chunk giant docs (Pack.chunkTokens)')) " +
        s"ELSE $inner END"
    // sentinel ordinal of block b = dropped blocks before it.
    // sequence(0, b) with the b2 < b guard, NOT sequence(0, b-1):
    // Spark's auto-step DESCENDS to [0, -1] at b = 0 and a phantom
    // block -1 would draw a coin (the JwJoin d2 lesson)
    def sent(b: String) =
      s"concat('<extra_id_', CAST(size(filter(sequence(0, $b)," +
        s" b2 -> b2 < $b AND ${masked("b2")})) AS STRING), '>')"
    val corrupted = expr(guarded(
      s"array_join(filter(transform($toks, (t, i) -> CASE" +
        s" WHEN NOT ${masked(s"(i div $spanLen)")} THEN t" +
        s" WHEN i % $spanLen = 0 THEN ${sent(s"(i div $spanLen)")}" +
        s" ELSE CAST(NULL AS STRING) END), x -> x IS NOT NULL), ' ')"))
    val targets = expr(guarded(
      s"array_join(flatten(transform(sequence(0, $nBlocks - 1), b ->" +
        s" CASE WHEN ${masked("b")} THEN" +
        s" concat(array(${sent("b")})," +
        s" slice($toks, b * $spanLen + 1, $spanLen))" +
        s" ELSE CAST(array() AS ARRAY<STRING>) END)), ' ')"))
    val nSpans = expr(
      s"size(filter(sequence(0, $nBlocks - 1), b -> ${masked("b")}))")
    val nMaskedToks = expr(
      s"size(filter(transform($toks, (t, i) ->" +
        s" ${masked(s"(i div $spanLen)")}), x -> x))")
    docs.select(col(idCol),
      expr(s"size($toks)").cast("long").as("n_tokens"),
      // sequence(0, -1) descends: guard the empty-token case explicitly
      when(expr(s"size($toks)") === 0, lit(0L))
        .otherwise(nSpans.cast("long")).as("n_spans"),
      nMaskedToks.cast("long").as("n_masked_tokens"),
      when(expr(s"size($toks)") === 0, lit(""))
        .otherwise(corrupted).as("corrupted_text"),
      when(expr(s"size($toks)") === 0, lit(""))
        .otherwise(targets).as("targets_text"))
  }

  /** Flesch reading ease per document — the classic readability gate
    * (206.835 − 1.015·words/sentences − 84.6·syllables/words) on
    * fully ENGINE-EXACT counts: sentences = non-empty [.!?]+ splits,
    * words = the whitespace-token contract, syllables = the standard
    * vowel-GROUP heuristic ([aeiouy]+ runs per word — 'beautiful' →
    * 3, 'queue' → 2; a heuristic, but a deterministic one, which is
    * what a corpus-wide quality gate needs). All three are integer
    * counts from global regexp passes, so the formula is one double
    * expression from identical integers on any engine. Zero
    * sentences or words → null score. One narrow projection, no
    * shuffle. Output: (idCol, n_sentences, n_words, n_syllables,
    * flesch rounded 4). */
  def fleschReadingEase(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val t = col(textCol)
    val sentences = size(filter(split(t, "[.!?]+", -1),
      s => length(regexp_replace(s, "\\s+", "")) > 0))
    val toks = expr(s"coalesce(${graft.plans.Tokens.whitespaceSql(textCol)}," +
      " CAST(array() AS ARRAY<STRING>))")
    // vowel groups: collapse each [aeiouy]+ run to '#', count the '#'s
    val syl = expr(
      s"aggregate(transform(${graft.plans.Tokens.whitespaceSql(textCol)}," +
        " w -> length(regexp_replace(regexp_replace(w," +
        " '[aeiouy]+', '#'), '[^#]', ''))), 0L, (a, x) -> a + x)")
    docs.select(col(idCol),
      coalesce(when(t.isNotNull, sentences), lit(0)).cast("long")
        .as("n_sentences"),
      size(toks).cast("long").as("n_words"),
      coalesce(syl, lit(0L)).cast("long").as("n_syllables"),
      round(when(t.isNotNull && sentences > 0 && size(toks) > 0,
        lit(206.835) -
          lit(1.015) * size(toks).cast("double") / sentences -
          lit(84.6) * coalesce(syl, lit(0L)).cast("double") / size(toks)),
        4).as("flesch"))
  }
}
