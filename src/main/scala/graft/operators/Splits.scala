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
}
