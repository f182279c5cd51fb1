package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Lexical retrieval over a document corpus: postings, BM25 scoring, and
  * reciprocal-rank fusion with a dense ranking — the sparse half of a
  * hybrid search stack (the dense half is [[graft.plans.CosineSimilarity]]
  * / the ANN paths).
  *
  * Everything here is a DataFrame plan over the (token, doc) pair table —
  * the distributed form of an inverted index. At 100 TB the pair table is
  * the index: it shuffles once on token, partial-aggregates map-side, and
  * never materializes a posting array longer than one token's list on one
  * executor only when a caller explicitly asks for the export form.
  */
object TextIndex {

  /** Postings table: one row per (token, doc) with term frequency and
    * 1-based occurrence positions — the distributed inverted index
    * (sort/bucket by `token` when persisting; a query term then prunes to
    * its buckets). Positions ride along for phrase/proximity scoring. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(TF.tokens(col(textCol))).as(Seq("pos0", "token")))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos0") + 1)).as("positions"))

  /** Document frequency per token (the tiny side of BM25 — broadcast). */
  def docFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    postings(docs, idCol, textCol)
      .groupBy(col("token")).agg(count(lit(1)).as("df"))

  /** BM25 (Robertson/Lucene form) of every document against
    * `queryTokens`: idf = ln(1 + (N - df + 0.5)/(df + 0.5)), per-term
    * contribution idf · tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl)). Docs
    * sharing no term score 0 (kept — callers rank the full corpus or
    * filter, their choice). Output: (doc_id, score).
    *
    * Scale shape: tokenizing projection → one groupBy(doc) for lengths,
    * one (token, doc) aggregation filtered to the query's terms FIRST
    * (the pair table never exists for non-query tokens), corpus-size and
    * avgdl as one broadcast scalar row, df per term as a broadcast join.
    * No windows, no driver loops; every join side beyond the corpus scan
    * is O(|query|). */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTokens: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    require(queryTokens.nonEmpty, "queryTokens must be non-empty")
    val terms = queryTokens.distinct
    val base = docs.select(col(idCol).as("doc_id"),
      TF.tokens(col(textCol)).as("__tk"))
    val lens = base.select(col("doc_id"), size(col("__tk")).as("__dl"))
    // one row: corpus size + average doc length (exact: integer sum)
    val stats = lens.agg(count(lit(1)).as("__n"),
      (sum(col("__dl")).cast("double") / count(lit(1))).as("__avgdl"))
    val pairs = base
      .select(col("doc_id"), explode(col("__tk")).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).cast("double").as("__tf"))
    val dfs = pairs.groupBy(col("token"))
      .agg(count(lit(1)).cast("double").as("__df"))
    val contrib = pairs
      .join(broadcast(dfs), "token")
      .crossJoin(broadcast(stats))
      .join(lens, "doc_id")
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))))
      .withColumn("__c", col("__idf") * col("__tf") * lit(k1 + 1.0) /
        (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
    val scored = contrib.groupBy(col("doc_id")).agg(sum(col("__c")).as("score"))
    // docs with no query term score 0 — rank the whole corpus
    lens.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("score"), lit(0.0)).as("score"))
  }

  /** Reciprocal-rank fusion of two full rankings: rrf = Σ 1/(k + rank).
    * Each input is (doc_id, <scoreCol>); ranks are dense over
    * (round(score, 4) DESC, doc_id ASC) — the rounded grid keeps rank
    * boundaries off 1-ulp float disagreements (the q99 discipline), the
    * id tie-break makes ranks total. k = 60 is the published default.
    * Ranks are exact integers, so the fused score is bit-identical in any
    * engine. One window per ranking (single global sort each — fuse TOP-M
    * candidate lists, not whole corpora, when N is huge; both inputs here
    * are already score-pruned in that regime). */
  def rrfFuse(a: DataFrame, scoreColA: String, bdf: DataFrame,
              scoreColB: String, k: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def ranked(df: DataFrame, scoreCol: String, rankName: String) =
      df.select(col("doc_id"),
        row_number().over(Window.orderBy(
          round(col(scoreCol), 4).desc, col("doc_id").asc)).as(rankName))
    ranked(a, scoreColA, "rank_a")
      .join(ranked(bdf, scoreColB, "rank_b"), Seq("doc_id"), "full")
      .select(col("doc_id"),
        (coalesce(lit(1.0) / (lit(k) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k) + col("rank_b")), lit(0.0))).as("rrf"))
  }
}
