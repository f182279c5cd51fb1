package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splits (train/validation/test) for training-data
  * pipelines.
  *
  * Membership is decided by a hash of the row's ID, never by position or
  * randomness: the same document lands in the same split across re-runs,
  * engines, data order, and incremental corpus growth — the leak-free
  * protocol (a random split re-shuffles on every run and leaks val docs
  * into train). The hash is md5 (the one hash both this engine and the
  * SQL-oracle engines share), truncated to 16 bits = 65536 buckets; a
  * weight is honored to ±1/65536.
  */
object Splits {

  /** Assign each row a `split` label from `splits` = ordered
    * (name, weight) with positive weights summing to ~1. Buckets are the
    * first 4 hex chars of md5(id); cut points are cumulative-weight
    * thresholds as fixed-width lowercase hex, so the comparison is a
    * plain string compare reproducible in any SQL engine. */
  def hashSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Double)]): DataFrame =
    df.withColumn("split", splitColumn(col(idCol), splits))

  /** The assignment expression alone (for use inside larger plans). */
  def splitColumn(id: Column, splits: Seq[(String, Double)]): Column = {
    require(splits.size >= 2, "need at least two splits")
    require(splits.forall(_._2 > 0), s"weights must be positive: $splits")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"weights must sum to 1, got $total")
    val h = substring(md5(id.cast("string")), 1, 4)
    val cuts = splits.init.scanLeft(0.0)(_ + _._2).tail
      .map(c => f"${math.floor(c * 65536).toLong}%04x")
    val first = when(h < lit(cuts.head), lit(splits.head._1))
    splits.init.tail.zip(cuts.tail).foldLeft(first) {
      case (acc, ((name, _), cut)) => acc.when(h < lit(cut), lit(name))
    }.otherwise(lit(splits.last._1))
  }

  /** Deterministic per-group downsampling — the data-mixing primitive: a
    * training mix keeps source A in full, source B at 50%, web crawl at
    * 10%. A row survives iff its md5 bucket falls under its group's
    * weight, so membership is a pure function of the id: stable across
    * re-runs, engines, data order, and corpus growth (a grown group keeps
    * every previously-kept row — no resampling churn), and exactly
    * reproducible in any SQL engine from the weight table alone.
    *
    * Buckets are `'0' || first-4-hex-of-md5(id)` compared against the
    * 5-hex-digit cut `floor(weight * 65536)`: the extra leading digit
    * makes weight 1.0 (cut 0x10000) a well-formed lexicographic compare
    * that keeps everything, weight 0.0 keeps nothing.
    *
    * Scale shape: a narrow filter projection — no shuffle, no UDF, and
    * the weights ride the plan as a CASE literal (no join against a
    * weight table needed at this cardinality). */
  def weightedKeep(df: DataFrame, idCol: String, groupCol: String,
                   weights: Map[String, Double],
                   defaultWeight: Double = 0.0): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0.0 && w <= 1.0),
      s"weights must be in [0,1]: $weights default=$defaultWeight")
    def cutHex(w: Double) = f"${math.floor(w * 65536).toLong}%05x"
    val bucket = concat(lit("0"), substring(md5(col(idCol).cast("string")), 1, 4))
    val cut = weights.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(""))) { case (acc, (g, w)) =>
        acc.when(col(groupCol) === g, lit(cutHex(w)))
      }
      .otherwise(lit(cutHex(defaultWeight)))
    df.filter(bucket < cut)
  }

  /** Deterministic weighted sampling WITHOUT replacement: keep exactly
    * `k` rows per stratum (fewer if the stratum is smaller), where a
    * row's chance of selection is proportional to `weightCol` — the
    * quality-weighted curation move ("keep 100k docs per source, biased
    * toward high quality") that [[weightedKeep]]'s independent Bernoulli
    * filter cannot express (it has no fixed-size guarantee and no
    * without-replacement semantics).
    *
    * Efraimidis–Spirakis exponential-jitter form: each row draws a
    * deterministic uniform u ∈ (0, 1] from md5(salt ‖ id) — 13 hex chars
    * = 52 bits, exactly representable in a double, identically
    * recomputable in any SQL engine — and is ranked by
    * `priority = -ln(u) / weight` ascending (an Exp(weight) variate: the
    * k smallest are a weighted sample without replacement). Ties (id)
    * ascending; null/non-positive weights are rejected up front.
    *
    * Scale shape: one narrow projection + one shuffle by stratum for the
    * per-stratum window top-k. The window sorts only within each
    * stratum's partition; at pathological single-stratum scale use
    * [[weightedSamplePerStratumAgg]] — same selection, heap aggregate
    * instead of a sort. */
  def weightedSamplePerStratum(df: DataFrame, idCol: String,
                               strataCol: String, weightCol: Column,
                               k: Int, salt: String = "wsr"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = uniformFromId(col(idCol), salt)
    val priority = -log(u) / weightCol
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(priority.asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** [[weightedSamplePerStratum]] as a MERGEABLE AGGREGATE — identical
    * selection (the k smallest (priority, id) pairs per stratum under
    * the same Efraimidis–Spirakis priority; spec asserts row equality),
    * different execution: [[graft.plans.TopKAgg]] keeps a k-capped heap
    * per stratum with map-side partial combine, so a SINGLE GIANT
    * stratum never funnels its full row set through one task's sort —
    * only k pairs per stratum cross the shuffle, and the winner set
    * (≤ strata × k ids) semi-joins back narrow (AQE broadcasts it).
    * The escape hatch the window form's scaladoc promises; prefer the
    * window form when strata are many and small (no heap overhead,
    * payload rides the sort). */
  def weightedSamplePerStratumAgg(df: DataFrame, idCol: String,
                                  strataCol: String, weightCol: Column,
                                  k: Int, salt: String = "wsr"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = uniformFromId(col(idCol), salt)
    val priority = (-log(u) / weightCol).cast("double")
    val winners = df
      .groupBy(col(strataCol))
      .agg(graft.plans.TopK.topK(priority, col(idCol).cast("long"), k)
        .as("__top"))
      .select(explode(col("__top.id")).as("__win_id"))
    df.join(winners, col(idCol).cast("long") === col("__win_id"), "left_semi")
  }

  /** Deterministic global shuffle for training-shard layout: every row
    * gets a `shard` in [0, numShards) and a dense `pos` ordinal within its
    * shard, both pure functions of (salt, id) — the reproducible-manifest
    * property pretraining needs (re-running the pipeline, or re-running it
    * on a grown corpus, never reorders the rows two shards already agreed
    * on relative to each other). Hash order, never input order: input
    * order is an accident of file listing.
    *
    * shard = 52 md5 bits mod numShards; pos = rank of the SAME hash key
    * within the shard (id tie-break — md5 52-bit collisions exist at
    * corpus scale). One shuffle on `shard`; the per-shard window sort is
    * distributed and spillable, and each shard is corpus/numShards — size
    * numShards so a shard fits an executor's spill budget. */
  def shardShuffle(df: DataFrame, idCol: String, numShards: Int,
                   salt: String = "shuf"): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val key = conv(substring(md5(concat(lit(salt), col(idCol).cast("string"))),
      1, 13), 16, 10).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__key").asc, col(idCol).asc)
    df.withColumn("__key", key)
      .withColumn("shard", pmod(col("__key"), lit(numShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__key")
  }

  /** Temperature-scaled source mixing (the multilingual-pretraining
    * recipe: upsample small sources, downsample huge ones). With
    * per-group count c and temperature α, a group's sampling rate is
    * `(c_min / c)^(1-α)` — α = 1 keeps the natural distribution,
    * α = 0 equalizes every group to the smallest. The rate is applied
    * with the same md5-bucket-under-cut filter as [[weightedKeep]], so
    * membership stays a pure function of the id.
    *
    * α = 0.5 (the default, and the common published choice) computes
    * rates via `sqrt` — correctly rounded per IEEE-754 in every engine,
    * so cut points are bit-identical cross-engine and the filter is
    * SQL-oracle-exact. Other α go through `pow`, which engines round
    * within 1 ulp of each other — fine in production, but a rate sitting
    * exactly on a bucket boundary could differ; hence the doc, not a
    * guard.
    *
    * Scale shape: one tiny per-group count aggregation, broadcast back;
    * the filter itself is narrow. */
  def temperatureKeep(df: DataFrame, idCol: String, groupCol: String,
                      alpha: Double = 0.5): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("double").as("__c"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy()
    val rates = counts
      .withColumn("__cmin", min(col("__c")).over(wAll))
      .withColumn("__rate",
        if (alpha == 0.5) sqrt(col("__cmin") / col("__c"))
        else pow(col("__cmin") / col("__c"), lit(1.0 - alpha)))
      .select(col(groupCol), col("__rate"))
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("long")
    df.join(broadcast(rates), groupCol)
      .filter(bucket < floor(col("__rate") * lit(65536.0)))
      .drop("__rate")
  }

  /** Temperature mixing by REPLICATION — the with-upsampling complement
    * of [[temperatureKeep]] (which can only drop rows): with per-group
    * count c and temperature α, a group's target rate is
    * `(c_max / c)^(1-α)` >= 1 — the LARGEST group stays at exactly one
    * copy and smaller groups replicate toward balance (α = 1 natural,
    * α = 0 every group matches the largest). Each row emits
    * `floor(rate)` copies plus one more iff its md5 bucket falls under
    * the fractional remainder's cut — membership and copy count are a
    * pure function of (id, group counts), reproducible across engines
    * and re-runs. Output adds `epoch` (0-based copy ordinal) so
    * downstream shard shuffles can spread replicas.
    *
    * α = 0.5 computes rates via `sqrt` (correctly rounded IEEE →
    * SQL-oracle-exact cut points); other α go through `pow` — the
    * [[temperatureKeep]] caveat applies.
    *
    * Scale shape: one tiny per-group count aggregation broadcast back,
    * then a narrow per-row sequence explode — no data shuffle. The
    * fan-out is the mixture's epoch factor (bounded by
    * `(c_max/c_min)^(1-α)`); feed [[shardShuffle]] afterwards so
    * replicas of a document land in different shards. */
  def temperatureEpochs(df: DataFrame, idCol: String, groupCol: String,
                        alpha: Double = 0.5): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("double").as("__c"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val rates = counts
      .withColumn("__cmax", max(col("__c")).over(wAll))
      .withColumn("__rate",
        if (alpha == 0.5) sqrt(col("__cmax") / col("__c"))
        else pow(col("__cmax") / col("__c"), lit(1.0 - alpha)))
      .select(col(groupCol), col("__rate"))
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("long")
    df.join(broadcast(rates), groupCol)
      .withColumn("__n", floor(col("__rate")).cast("long") +
        when(bucket < floor((col("__rate") - floor(col("__rate"))) * lit(65536.0)),
          lit(1L)).otherwise(lit(0L)))
      .filter(col("__n") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__n") - 1)))
      .drop("__rate", "__n")
  }

  /** Deterministic random negative sampling for contrastive training:
    * each anchor row gets `k` pseudo-random partner ids drawn from
    * [0, corpusSize) by hashing (salt, anchor, j) — reproducible across
    * re-runs and engines, no RNG state. A draw that hits the anchor
    * itself shifts by one (mod corpusSize), so a pair is never
    * self-paired; distinct draws may repeat for tiny corpora (sampling
    * WITH replacement — the standard contrastive recipe, and the
    * only shuffle-free form: without-replacement needs per-anchor
    * dedup state).
    *
    * The ids are drawn from the DENSE [0, n) space — join the result
    * back to the corpus on `neg_id` when ids are sparse (or map ids
    * through [[shardShuffle]]'s hash order first). Scale shape: one
    * broadcast 1-row count + a k-way explode — a narrow map, no
    * shuffle. */
  def negativeSample(anchors: DataFrame, idCol: String, corpus: DataFrame,
                     corpusIdCol: String, k: Int,
                     salt: String = "neg"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val n = corpus.agg(count(lit(1)).as("__n"))
    anchors.crossJoin(broadcast(n))
      .select(col(idCol).as("anchor_id"), col("__n"),
        explode(sequence(lit(0), lit(k - 1))).as("j"))
      .withColumn("__draw", pmod(
        conv(substring(md5(concat(lit(salt), col("anchor_id").cast("string"),
          lit("-"), col("j").cast("string"))), 1, 13), 16, 10).cast("long"),
        col("__n")))
      .withColumn("neg_id",
        when(col("__draw") === col("anchor_id"),
          pmod(col("__draw") + 1, col("__n"))).otherwise(col("__draw")))
      .select(col("anchor_id"), col("j").cast("long").as("j"), col("neg_id"))
  }

  /** The deterministic uniform in (0, 1]: 52 md5 bits scaled by 2⁻⁵², plus
    * one ulp so u is never 0 (ln(0) = -inf). Exact in both double and
    * int64, so any engine recomputes it bit-identically. */
  def uniformFromId(id: Column, salt: String): Column =
    (conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 13), 16, 10)
      .cast("double") + lit(1.0)) / lit(4503599627370496.0) // 2^52
}
