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
}
