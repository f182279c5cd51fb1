package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table profiling — the data-quality survey a pipeline runs before
  * trusting a new source: per-column null counts, exact distinct
  * cardinality, and the modal value. One operator, one pass, any
  * column mix (values profile through their STRING form, the
  * profiling convention — a profile compares shapes, not types).
  */
object Profile {

  /** Profile `cols` of `df` in one pass: (column, n_rows, n_null,
    * n_distinct, mode_value, mode_n) per column — exact distincts
    * (nulls excluded), mode with smallest-value tie-break (nulls never
    * the mode), `n_rows` repeated per column (it anchors null/distinct
    * ratios downstream). An all-null column profiles as n_distinct 0
    * with a null mode.
    *
    * Scale shape: one `stack` unpivot (narrow, |cols| rows per input
    * row) into a (column, value)-keyed count — map-side combined, so
    * the shuffle carries one row per DISTINCT (column, value), then a
    * |cols|-group rollup. Near-unique columns make that first shuffle
    * O(rows) — inherent to exact distinct counts; profile a sample or
    * switch to the HLL store ([[Sketches]]) when approximate
    * cardinality is enough. Beware profiling FLOAT columns across
    * engines: the string form is the engine's formatter, not a stable
    * contract. */
  def profileTable(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in the frame: $missing")
    val stacked = df.select(expr(
      s"stack(${cols.size}, " +
        cols.map(c => s"'$c', CAST(`$c` AS STRING)").mkString(", ") +
        ") AS (column, value)"))
    val counts = stacked.groupBy(col("column"), col("value"))
      .agg(count(lit(1)).as("__cnt"))
    val base = counts.groupBy(col("column"))
      .agg(sum(col("__cnt")).as("n_rows"),
        coalesce(sum(when(col("value").isNull, col("__cnt"))), lit(0L))
          .as("n_null"))
    val nonNull = counts.filter(col("value").isNotNull)
      .groupBy(col("column"))
      .agg(count(lit(1)).as("n_distinct"),
        min_by(struct(col("value"), col("__cnt")),
          struct((col("__cnt") * -1).as("nc"), col("value"))).as("__m"))
    base.join(nonNull, Seq("column"), "left")
      .select(col("column"), col("n_rows"), col("n_null"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("__m.value").as("mode_value"),
        col("__m.__cnt").as("mode_n"))
  }

  /** Pairwise Pearson correlation matrix over the named numeric
    * columns — the redundancy screen of a feature audit (two columns
    * at |r| ≈ 1 are one signal; a target leaking into a feature shows
    * up here first). Complements [[profileTable]]'s per-column facts
    * with the cross-column structure, and [[Features.spearman]] /
    * [[Features.kendallTau]] (rank/ordinal, one pair at a time) with
    * the all-pairs linear view.
    *
    * Shape: ONE map-side-combinable pass computes every pair's
    * sufficient statistics — d(d−1)/2 × 6 aggregate expressions over
    * the fact table, each pair's rows gated on BOTH values non-null
    * (pairwise deletion, the standard convention) — then the single
    * stats row explodes into one row per pair. No joins, no shuffle beyond the
    * one aggregation; meant for profiling-scale d (expression count
    * grows quadratically — at d ≳ 50 prefer
    * [[graft.functions.VectorFunctions.covarianceMatrix]]'s pair-table
    * form).
    *
    * Determinism: x, x², x·y terms round to the 9-grid into
    * DECIMAL(38,9) sums (the [[Features.olsFit]] discipline); the
    * closed form r = (n·Σxy − Σx·Σy) / (√(n·Σx² − Σx²̂) · √(…)) runs
    * in double with pinned association. Degenerate pairs (n < 2 or a
    * zero-variance side) yield null. Output: (col_a, col_b, n, corr
    * rounded 6) for each pair col_a < col_b in the given order. */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least 2 columns, got ${cols.size}")
    require(cols.distinct.size == cols.size, "columns must be distinct")
    val dec9 = (c: org.apache.spark.sql.Column) =>
      round(c, 9).cast("decimal(38,9)")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = pairs.zipWithIndex.flatMap { case ((a, b), p) =>
      val x = col(a).cast("double"); val y = col(b).cast("double")
      val both = x.isNotNull && y.isNotNull
      Seq(
        sum(when(both, 1L).otherwise(0L)).as(s"__n$p"),
        sum(when(both, dec9(x))).as(s"__sx$p"),
        sum(when(both, dec9(y))).as(s"__sy$p"),
        sum(when(both, dec9(x * y))).as(s"__sxy$p"),
        sum(when(both, dec9(x * x))).as(s"__sxx$p"),
        sum(when(both, dec9(y * y))).as(s"__syy$p"))
    }
    // spread the decimal accumulation across the cluster: a small
    // parquet source scans as ONE split, and 600k rows × 36 DECIMAL
    // sums on one core is the whole runtime (measured 18.8 → ~1.5 s at
    // sf0.1 — the covarianceMatrix repartition-before-CPU-bound fix);
    // the exchange ships only the projected columns
    val stats = df
      .select(cols.map(col): _*)
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .agg(aggs.head, aggs.tail: _*)
    val perPair = pairs.zipWithIndex.map { case ((a, b), p) =>
      val n = col(s"__n$p").cast("double")
      val sx = col(s"__sx$p").cast("double")
      val sy = col(s"__sy$p").cast("double")
      val sxy = col(s"__sxy$p").cast("double")
      val sxx = col(s"__sxx$p").cast("double")
      val syy = col(s"__syy$p").cast("double")
      val vx = n * sxx - sx * sx
      val vy = n * syy - sy * sy
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"__n$p").as("n"),
        round(when(col(s"__n$p") >= 2 && vx > 0 && vy > 0,
          (n * sxy - sx * sy) / (sqrt(vx) * sqrt(vy))), 6).as("corr"))
    }
    stats
      .select(explode(array(perPair: _*)).as("__r"))
      .select(col("__r.col_a"), col("__r.col_b"), col("__r.n"),
        col("__r.corr"))
  }

  /** Duplication audit histogram — the before/after readout every
    * dedup run owes its operator: exact-duplicate clusters by content
    * hash, folded to one row per CLUSTER SIZE (size, how many clusters
    * of that size, how many docs they hold). The dedup ratio falls out
    * as Σ n_docs / Σ n_clusters; a heavy tail at size ≥ 2 is the
    * boilerplate/mirror signal that decides whether near-dup passes
    * are worth their cost. Two count aggregations (docs → clusters →
    * sizes), both map-side combinable; hashes shuffle, text never
    * does (the q37 discipline). Null text is its own cluster level.
    * Output: (cluster_size, n_clusters, n_docs) ordered by size. */
  def duplicationHistogram(df: DataFrame, textCol: String): DataFrame =
    df.groupBy(sha2(col(textCol).cast("string"), 256).as("__h"))
      .agg(count(lit(1)).as("__sz"))
      .groupBy(col("__sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("__sz")).as("n_docs"))

  /** Blocking-quality report for record linkage — evaluate a blocking
    * key BEFORE paying for the matcher: candidate pairs = Σ n_b(n_b−1)/2
    * over block sizes, reduction ratio = 1 − candidates / allPairs
    * (how much of the n² swamp the key drains), plus the max block (the
    * task that will straggle: candidate work is quadratic in it —
    * the q191/q234 bounded-key discipline made measurable). Pair
    * counts compute as exact integers in DECIMAL(38,0) — n(n−1)/2
    * overflows long past n ≈ 4·10⁹, corpus territory — and RENDER as
    * strings: exact past 2^63, and raw DecimalType never reaches a
    * catalog output (the q174/q266 rule — a type-sensitive hash path
    * can diverge on value-identical decimals; CatalogSpec sweeps for
    * it). One block-keyed count agg + a 1-row fold; null block keys
    * form a real block (a null-keyed matcher still compares them).
    * A degenerate input (n_rows ≤ 1 → all_pairs = 0) yields a null
    * reduction_ratio — unmeasurable, not an error (the psiOverTime
    * contract). Output one row: (n_rows, n_blocks, max_block,
    * candidate_pairs, all_pairs, reduction_ratio rounded 6). */
  def blockingReport(df: DataFrame, blockCols: Seq[String]): DataFrame = {
    require(blockCols.nonEmpty, "blockCols must be non-empty")
    val sizes = df.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("__b"))
    val allPairs = (col("n_rows").cast("decimal(38,0)") *
      (col("n_rows") - 1L).cast("decimal(38,0)")) / 2
    sizes.agg(
        sum(col("__b")).as("n_rows"),
        count(lit(1)).as("n_blocks"),
        max(col("__b")).as("max_block"),
        sum((col("__b").cast("decimal(38,0)") *
          (col("__b") - 1L).cast("decimal(38,0)")) / 2).as("__cand"))
      .select(col("n_rows"), col("n_blocks"), col("max_block"),
        col("__cand").cast("decimal(38,0)").cast("string")
          .as("candidate_pairs"),
        allPairs.cast("decimal(38,0)").cast("string").as("all_pairs"),
        when(col("n_rows") > 1,
          round(lit(1.0) - col("__cand").cast("double") /
            allPairs.cast("decimal(38,0)").cast("double"), 6))
          .as("reduction_ratio"))
  }

  /** Embedding-column health profile per group — the vector hygiene
    * gate in front of every ANN/clustering pass: nulls, dimension
    * drift (ragged arrays break every fixed-dim operator), NaN/Inf
    * elements, exact-zero vectors (unnormalizable — they poison cosine
    * with nulls), and the L2-norm spread (min/median/max — a collapsed
    * or exploding norm distribution is the embedding-model regression
    * signal). One pass computes per-row health facts via codegen-able
    * HOFs (no shuffle), one group agg folds them; the median norm is
    * the exact interpolated percentile; raggedness reports as the
    * DISTINCT dimension count (n_dims > 1 = ragged, dim = the
    * smallest observed) — never a per-row collection. Output per
    * group: (groupCol, n, n_null, n_dims, dim, n_nonfinite, n_zero,
    * norm_min, norm_med, norm_max) rounded 6. */
  def vectorHealth(df: DataFrame, groupCol: String,
                   vecCol: String): DataFrame = {
    val v = col(vecCol)
    val sq = expr(
      s"aggregate($vecCol, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
    val nonfinite = expr(
      s"exists($vecCol, x -> isnan(CAST(x AS DOUBLE)) OR abs(CAST(x AS DOUBLE)) = CAST('Infinity' AS DOUBLE))")
    df.select(col(groupCol).as("__g"), v,
        when(v.isNotNull && !nonfinite, sqrt(sq)).as("__norm"),
        when(v.isNotNull, nonfinite).as("__bad"),
        when(v.isNotNull, size(v)).as("__dim"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n"),
        count(when(v.isNull, lit(1))).as("n_null"),
        countDistinct(col("__dim")).as("n_dims"),
        min(col("__dim")).as("dim"),
        count(when(col("__bad") === true, lit(1))).as("n_nonfinite"),
        count(when(col("__norm") === 0.0, lit(1))).as("n_zero"),
        min(col("__norm")).as("__nmin"),
        expr("percentile(__norm, 0.5)").as("__nmed"),
        max(col("__norm")).as("__nmax"))
      .select(col("__g").as(groupCol), col("n"), col("n_null"),
        col("n_dims"), col("dim"), col("n_nonfinite"), col("n_zero"),
        round(col("__nmin"), 6).as("norm_min"),
        round(col("__nmed"), 6).as("norm_med"),
        round(col("__nmax"), 6).as("norm_max"))
  }

  /** Benford first-digit profile — the fabrication/quality tripwire
    * for naturally-occurring positive quantities (amounts, counts,
    * populations): observed first-significant-digit fractions against
    * Benford's log₁₀(1 + 1/d), with the per-digit χ² term. A column
    * that was generated, capped, or unit-converted drifts off the
    * curve loudly.
    *
    * The digit is extracted from the STRING rendering (first char in
    * 1-9 of the absolute value) — exact on any engine, no
    * log10/floor float boundary (scientific-notation renderings of
    * extreme doubles still lead with their mantissa digit). Zeros,
    * nulls and values with no 1-9 digit drop. One digit-keyed count
    * agg; expected fractions are the engine's ln-based grid rounded 9
    * (the q226 log discipline). Output per digit 1..9: (digit, n,
    * observed_frac, expected_frac, chi2_term) rounded 6, every digit
    * present (0-count digits included — their χ² term is n·p_d). */
  def benfordProfile(df: DataFrame, valCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val digit = regexp_extract(abs(col(valCol)).cast("string"),
      "[1-9]", 0)
    val counts = df.filter(col(valCol).isNotNull)
      .select(digit.as("__d"))
      .filter(col("__d") =!= "")
      .groupBy(col("__d").cast("int").as("digit"))
      .agg(count(lit(1)).as("__c"))
    val n = counts.agg(sum(col("__c")).as("__n"))
    val digits = (1 to 9).toDF("digit")
    digits.join(counts, Seq("digit"), "left").crossJoin(broadcast(n))
      .select(col("digit"), coalesce(col("__c"), lit(0L)).as("n"),
        col("__n"),
        round(log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0)), 9)
          .as("__p"))
      .select(col("digit"), col("n"),
        round(when(col("__n") > 0,
          col("n").cast("double") / col("__n")), 6).as("observed_frac"),
        round(col("__p"), 6).as("expected_frac"),
        round(when(col("__n") > 0,
          (col("n").cast("double") - col("__n") * col("__p")) *
            (col("n").cast("double") - col("__n") * col("__p")) /
            (col("__n") * col("__p"))), 6).as("chi2_term"))
      .orderBy(col("digit"))
  }

  /** Key-skew report — the pre-join diagnostic that decides salting
    * ([[SkewJoin]]) and AQE skew thresholds BEFORE a shuffle
    * detonates: the `topK` heaviest key groups with their row counts,
    * corpus share and cumulative share, plus the global facts
    * (n_rows, n_keys, avg rows/key) on every row for one-glance
    * reading. A hot key holding 5% of a fact table is invisible in
    * samples and fatal in a shuffle; this is one keyed count + a
    * distributed top-k (TakeOrderedAndProject — no corpus-wide
    * window; the only ordered window walks the k result rows).
    * Composite keys render as one '|'-joined string (null → 'NULL').
    * Output: (rank, key, cnt, share_pct, cum_share_pct, n_rows,
    * n_keys, avg_per_key), rank by (cnt desc, key asc). */
  def keySkew(df: DataFrame, keyCols: Seq[String],
              topK: Int = 20): DataFrame = {
    require(keyCols.nonEmpty, "keySkew needs at least one key column")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val key = concat_ws("|",
      keyCols.map(c => coalesce(col(c).cast("string"), lit("NULL"))): _*)
    val counts = df.select(key.as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"))
    val top = counts.orderBy(col("cnt").desc, col("key").asc).limit(topK)
    val w = Window.orderBy(col("cnt").desc, col("key").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.crossJoin(broadcast(totals))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("key").asc)))
      .withColumn("cum", sum(col("cnt")).over(w))
      .select(col("rank"), col("key"), col("cnt"),
        round(col("cnt").cast("double") * 100.0 / col("n_rows"), 4)
          .as("share_pct"),
        round(col("cum").cast("double") * 100.0 / col("n_rows"), 4)
          .as("cum_share_pct"),
        col("n_rows"), col("n_keys"),
        round(col("n_rows").cast("double") / col("n_keys"), 4)
          .as("avg_per_key"))
  }
}
