package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Unsupervised keyword extraction — TextRank (Mihalcea & Tarau 2004):
  * PageRank over each document's token co-occurrence graph, the
  * embedding-free way to tag a corpus with its own salient terms
  * (index enrichment, weak topic labels, dedup explainers).
  *
  * Distributed shape — chosen deliberately: a corpus is MILLIONS of
  * TINY graphs (a document's node count is its distinct-token count,
  * bounded by document length), so the whole extraction is ONE shuffle
  * (group tokens by document) followed by embarrassingly-parallel
  * per-document iteration inside tasks via `flatMapGroups` — zero
  * cross-iteration shuffles. This is the per-key-imperative case the
  * typed Dataset API exists for; the alternative bulk-join formulation
  * (scores as a (doc, node) table re-joined per iteration) pays
  * 2 exchanges × iterations over the whole corpus and only wins when a
  * SINGLE graph exceeds a task — that regime is
  * [[graft.operators.Graph.pageRank]]'s job, not this one's (measured
  * here: 5.6 s bulk-join vs 1.4 s grouped at sf0.1, and the gap widens
  * with iteration count).
  *
  * Determinism: uniform init; each contribution w/deg·score rounds to
  * the 9-grid and accumulates as exact INTEGER grid units (Long
  * 1e-9ths — the in-task equivalent of the DECIMAL(38,9) column
  * discipline; 9-grid inputs make the sum order-free AND bit-exactly
  * replayable as a SQL BIGINT sum, which is what the q208 DuckDB
  * oracle does), scores re-round per iteration — so KeywordsSpec
  * demands EXACT equality with an independent reference. Ties in the
  * final top-k break lexicographically.
  */
object Keywords {

  /** Collation-stable sort key: the string's UTF-8 bytes re-read as
    * ISO-8859-1, so each byte maps to one char 0–255 and Scala String
    * comparison on the result IS unsigned-byte (binary UTF-8) order —
    * the collation SQL engines use for ORDER BY on strings. */
  private def utf8Key(t: String): String =
    new String(t.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Top-k TextRank keywords per document. Co-occurrence window `w`
    * links each token to the next `w − 1` positions (classic window-2
    * links adjacent tokens); edges are undirected with co-occurrence
    * counts as weights; tokens shorter than `minTokenLen` drop before
    * the graph builds (the cheap stopword-ish gate — determinism over
    * a language-specific list). Gated tokens still OCCUPY their
    * positions: a dropped token blocks adjacency rather than splicing
    * its neighbors together (spec-pinned — the two conventions give
    * different graphs). Tokens with no edges get no rank row.
    *
    * The id column must be castable to long (the engine's document-id
    * convention). Output: (idCol, rank, token, score rounded 6),
    * rank 1 = highest. */
  def textRank(docs: DataFrame, idCol: String, textCol: String,
               window: Int = 2, iterations: Int = 5,
               damping: Double = 0.85, topK: Int = 5,
               minTokenLen: Int = 2): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val spark = docs.sparkSession
    import spark.implicits._

    val toks = docs
      .select(col(idCol).cast("long").as("__id"),
        posexplode(TF.tokens(col(textCol))).as(Seq("__pos", "__t")))
      .filter(length(col("__t")) >= minTokenLen)
      .as[(Long, Int, String)]

    val g9 = (x: Double) => math.rint(x * 1e9) / 1e9
    toks.groupByKey(_._1)
      .flatMapGroups { (id: Long, it: Iterator[(Long, Int, String)]) =>
        val byPos = new scala.collection.mutable.HashMap[Int, String]()
        it.foreach { case (_, p, t) => byPos(p) = t }
        // undirected weighted co-occurrence edges
        val wts = new scala.collection.mutable.HashMap[(String, String), Double]()
        for ((p, a) <- byPos; o <- 1 until window;
             b <- byPos.get(p + o) if a != b) {
          wts((a, b)) = wts.getOrElse((a, b), 0.0) + 1.0
          wts((b, a)) = wts.getOrElse((b, a), 0.0) + 1.0
        }
        if (wts.isEmpty) Iterator.empty
        else {
          val deg = new scala.collection.mutable.HashMap[String, Double]()
          for (((a, _), w) <- wts) deg(a) = deg.getOrElse(a, 0.0) + w
          var s = deg.keysIterator.map(_ -> 1.0).toMap
          for (_ <- 1 to iterations) {
            // contributions land on the 1e-9 grid, so they accumulate
            // as exact INTEGER grid units (order-free by construction,
            // and replayable in any SQL engine as a BIGINT sum — the
            // q208 oracle's seam): k = rint(x·1e9), Σk exact, back to
            // double by one division
            val acc = new scala.collection.mutable.HashMap[String, Long]()
            for (((a, b), w) <- wts) {
              val k = math.rint(w / deg(a) * s(a) * 1e9).toLong
              acc(b) = acc.getOrElse(b, 0L) + k
            }
            s = s.map { case (n, _) =>
              n -> g9((1.0 - damping) +
                damping * (acc.getOrElse(n, 0L).toDouble / 1e9))
            }
          }
          // tie-break on UTF-8 BYTES, not Scala String order (UTF-16
          // code units): the two diverge for supplementary-plane
          // tokens tied on score, and the SQL oracle's ORDER BY uses
          // binary UTF-8 collation (ADVICE r14) — byte order makes the
          // tie-break collation-stable cross-engine for any input
          s.toSeq.sortBy { case (t, sc) => (-sc, utf8Key(t)) }
            .take(topK).zipWithIndex
            .map { case ((t, sc), i) =>
              (id, i + 1, t, math.rint(sc * 1e6) / 1e6)
            }.iterator
        }
      }
      .toDF(idCol, "rank", "token", "score")
  }

  /** PMI collocations — corpus-level two-word phrases ("new york"
    * vs "of the"): pointwise mutual information
    * PMI(w1,w2) = ln( P(w1,w2) / (P(w1)·P(w2)) ) scores how much more
    * often a bigram occurs than its parts' frequencies predict, the
    * classic phrase-mining signal raw bigram counts (q81) bury under
    * stopword pairs. `minCount` guards the estimator's known failure
    * mode: a hapax pair of two hapax words maxes PMI on zero evidence.
    *
    * Scale shape: one doc-keyed shuffle for adjacent pairs (the q81
    * lag window — per-document partitions, never global), one
    * vocab-sized unigram agg, two broadcast-sized joins of the
    * SURVIVING bigrams (minCount prunes before any join) against the
    * unigram table, totals as a 1-row cross join. Top-k lands via
    * TakeOrderedAndProject — no global sort materializes.
    *
    * Determinism: the PMI ratio is built with pinned association —
    * (c12·Nu·Nu) / (Nb·c1·c2), each product folded left in DOUBLE,
    * one division, one ln, rounded 6 — so both engines walk the same
    * IEEE path (the q193 ln-parity convention); ties break on the
    * bigram text. Output: (bigram, n_pair, n_left, n_right, pmi)
    * top-k by (pmi desc, bigram asc). */
  def collocations(docs: DataFrame, idCol: String, textCol: String,
                   minCount: Int = 5, topK: Int = 50): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col(idCol).as("__id"), posexplode(TF.tokens(col(textCol))))
      .withColumnRenamed("pos", "__p").withColumnRenamed("col", "__tok")
    val uni = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__c"))
    // bigrams per doc = tokens − 1; Σ over docs = Nu − #docs-with-tokens
    val totals = toks.agg(count(lit(1)).as("__nu"),
      (count(lit(1)) - countDistinct(col("__id"))).as("__nb"))
    val w = Window.partitionBy(col("__id")).orderBy(col("__p"))
    val pairs = toks.withColumn("__prev", lag(col("__tok"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("__w1"), col("__tok").as("__w2"))
      .agg(count(lit(1)).as("__c12"))
      .filter(col("__c12") >= minCount)
    pairs
      .join(uni.select(col("__tok").as("__w1"), col("__c").as("__c1")), "__w1")
      .join(uni.select(col("__tok").as("__w2"), col("__c").as("__c2")), "__w2")
      .crossJoin(broadcast(totals))
      .select(concat_ws(" ", col("__w1"), col("__w2")).as("bigram"),
        col("__c12").as("n_pair"), col("__c1").as("n_left"),
        col("__c2").as("n_right"),
        round(log(
          col("__c12").cast("double") * col("__nu") * col("__nu") /
            (col("__nb").cast("double") * col("__c1") * col("__c2"))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("bigram").asc)
      .limit(topK)
  }
}
