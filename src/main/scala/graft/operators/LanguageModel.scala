package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Statistical language-model scoring over the corpus itself — the
  * KenLM-shaped quality signal (docs whose token transitions are
  * improbable under the corpus model are boilerplate, spam, or noise;
  * docs that are too probable are templates). A bigram model with
  * add-one smoothing is deliberately the floor: it exercises the full
  * distributed shape (n-gram extraction → count tables → per-occurrence
  * score join → per-doc reduction) that any higher-order model reuses.
  *
  * Determinism contract (the q73 discipline): each occurrence's
  * -ln p is rounded to a fixed 9-decimal grid and accumulated in
  * DECIMAL, so the per-doc mean is partition-order independent and
  * SQL-oracle-exact.
  */
object LanguageModel {

  /** (doc_id, prev, cur) — one row per within-doc bigram occurrence.
    * Array-native extraction (transform over index ranges): a narrow
    * projection, no window shuffle. Docs with fewer than 2 tokens yield
    * no rows. */
  def bigramOccurrences(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), TF.tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(2), size(col("__tk"))),
          i => struct(element_at(col("__tk"), i - 1).as("prev"),
            element_at(col("__tk"), i).as("cur")))).as("__bg"))
      .select(col("doc_id"), col("__bg.prev").as("prev"), col("__bg.cur").as("cur"))

  /** Per-document bigram cross-entropy under the corpus's own add-one-
    * smoothed bigram model: mean over the doc's bigrams of
    * -ln((C(prev,cur) + 1) / (C(prev) + V)), V = corpus vocabulary size.
    * Output: (doc_id, xent, n_bigrams) — low = templated, high = noise.
    *
    * Scale shape: the occurrence table shuffles once on (prev, cur) for
    * counts; context counts derive from the bigram table (one more tiny
    * agg), V is a broadcast scalar. The score join keys on (prev, cur) —
    * count tables are vocab-sized, not corpus-sized, so AQE broadcasts
    * them when they fit and shuffle-joins when a real vocabulary
    * doesn't. */
  def bigramCrossEntropy(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame = {
    val bg = bigramOccurrences(docs, idCol, textCol)
    val bgCounts = bg.groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).as("__cbg"))
    val ctx = bgCounts.groupBy(col("prev")).agg(sum(col("__cbg")).as("__cprev"))
    val vocab = docs
      .select(explode(TF.tokens(col(textCol))).as("__w"))
      .agg(countDistinct(col("__w")).as("__v"))
    bg.join(bgCounts, Seq("prev", "cur"))
      .join(ctx, Seq("prev"))
      .crossJoin(broadcast(vocab))
      .withColumn("__nll",
        round(-log((col("__cbg") + lit(1)).cast("double") /
          (col("__cprev") + col("__v")).cast("double")), 9)
          .cast("decimal(28,9)"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("__nll")).cast("double") / count(lit(1)), 4).as("xent"),
        count(lit(1)).as("n_bigrams"))
  }

  /** Collocation mining by pointwise mutual information over the corpus
    * bigram table: pmi(a,b) = ln(C(ab)·N / (C(a·)·C(·b))) with N the
    * total bigram count and the marginals taken over bigram starts/ends.
    * `minCount` floors C(ab) — PMI's known bias toward hapax pairs.
    * Output: (prev, cur, n, pmi). All factors cast to double BEFORE
    * multiplying (C·N overflows int64 on a real corpus). One bigram
    * shuffle + two vocab-sized marginal aggs + one broadcast scalar. */
  def bigramPmi(docs: DataFrame, idCol: String, textCol: String,
                minCount: Int = 5): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val bg = bigramOccurrences(docs, idCol, textCol)
    val cbg = bg.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("__c"))
    val ca = cbg.groupBy(col("prev")).agg(sum(col("__c")).as("__ca"))
    val cb = cbg.groupBy(col("cur")).agg(sum(col("__c")).as("__cb"))
    val n = bg.agg(count(lit(1)).as("__n"))
    cbg.filter(col("__c") >= minCount)
      .join(ca, "prev").join(cb, "cur").crossJoin(broadcast(n))
      .select(col("prev"), col("cur"), col("__c").as("n"),
        log((col("__c").cast("double") * col("__n").cast("double")) /
          (col("__ca").cast("double") * col("__cb").cast("double"))).as("pmi"))
  }

  /** (doc_id, w1, w2, w3) — one row per within-doc trigram occurrence. */
  def trigramOccurrences(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), TF.tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= 3)
      .select(col("doc_id"),
        explode(transform(sequence(lit(3), size(col("__tk"))),
          i => struct(element_at(col("__tk"), i - 2).as("w1"),
            element_at(col("__tk"), i - 1).as("w2"),
            element_at(col("__tk"), i).as("w3")))).as("__tg"))
      .select(col("doc_id"), col("__tg.w1").as("w1"), col("__tg.w2").as("w2"),
        col("__tg.w3").as("w3"))

  /** Per-document cross-entropy under an INTERPOLATED trigram model
    * (Jelinek–Mercer with fixed weights): for each trigram occurrence,
    * p = λ3·C(w1w2w3)/C(w1w2·) + λ2·C(w2w3)/C(w2·) + λ1·C(w3)/T, the
    * MLE estimates from the corpus's own trigram/bigram/unigram tables
    * (every component context is observed by construction, and the
    * unigram floor keeps p > 0, so no additive smoothing is needed).
    * Output: (doc_id, xent3, n_trigrams) — the higher-order sibling of
    * [[bigramCrossEntropy]] for sharper template/noise separation.
    *
    * Scale shape: three count tables (trigram / bigram / unigram — each
    * one shuffle over occurrences, each vocab-sized, AQE
    * broadcast-or-shuffle joins them back), T as one broadcast scalar.
    * Same q73 fixed-grid + DECIMAL determinism as the bigram form. */
  def trigramCrossEntropy(docs: DataFrame, idCol: String, textCol: String,
                          l3: Double = 0.6, l2: Double = 0.3,
                          l1: Double = 0.1): DataFrame = {
    require(math.abs(l1 + l2 + l3 - 1.0) < 1e-9, "lambdas must sum to 1")
    val tg = trigramOccurrences(docs, idCol, textCol)
    val c3 = tg.groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("__c3"))
    val ctx3 = c3.groupBy(col("w1"), col("w2")).agg(sum(col("__c3")).as("__c3x"))
    val bg = bigramOccurrences(docs, idCol, textCol)
      .select(col("prev").as("w2"), col("cur").as("w3"))
    val c2 = bg.groupBy(col("w2"), col("w3")).agg(count(lit(1)).as("__c2"))
    val ctx2 = c2.groupBy(col("w2")).agg(sum(col("__c2")).as("__c2x"))
    val uni = docs.select(explode(TF.tokens(col(textCol))).as("w3"))
      .groupBy(col("w3")).agg(count(lit(1)).as("__c1"))
    val total = docs
      .select(explode(TF.tokens(col(textCol))).as("__w"))
      .agg(count(lit(1)).as("__t"))
    tg.join(c3, Seq("w1", "w2", "w3"))
      .join(ctx3, Seq("w1", "w2"))
      .join(c2, Seq("w2", "w3"))
      .join(ctx2, Seq("w2"))
      .join(uni, Seq("w3"))
      .crossJoin(broadcast(total))
      .withColumn("__p",
        lit(l3) * (col("__c3").cast("double") / col("__c3x")) +
          lit(l2) * (col("__c2").cast("double") / col("__c2x")) +
          lit(l1) * (col("__c1").cast("double") / col("__t")))
      .withColumn("__nll", round(-log(col("__p")), 9).cast("decimal(28,9)"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("__nll")).cast("double") / count(lit(1)), 4).as("xent3"),
        count(lit(1)).as("n_trigrams"))
  }
}
