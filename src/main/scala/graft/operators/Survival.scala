package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-to-event analysis — the retention/churn reading of event logs.
  *
  * [[Funnel.cohortRetention]] answers "what fraction was active in
  * period k"; the Kaplan-Meier estimator answers the finer question
  * "what fraction SURVIVES past time t" while staying honest about
  * censoring: a user last seen at day 30 without converting tells us
  * survival ≥ 30, not survival = 30 — dropping or event-ifying those
  * rows biases the curve, which is why the naive
  * `count(converted)/count(*)` readout is wrong whenever observation
  * windows differ (they always do in a live log).
  *
  * Reference has no survival surface (its only aggregation is the
  * group-sum of load.py:104-107); this extends the eval family
  * (BASELINE.json north star) the same way [[Eval.rocAuc]] extends
  * counting.
  */
object Survival {

  /** Kaplan-Meier survival curve per group: at each distinct duration
    * level (ascending) with d events, c censored and n at risk, the
    * curve steps S ← S · (1 − d/n); censoring-only levels leave S
    * unchanged but still shrink the risk set — the estimator's whole
    * point.
    *
    * Shape: the [[Eval.ksTest]] distinct-value-grid discipline — one
    * (group, duration)-level aggregation, then two bucketed cumulative
    * walks ([[Ranks.groupedCumSum]]): cumulative level sizes give the
    * at-risk count (n_g − cum + t), cumulative 9-grid-rounded
    * ln(1 − d/n) terms in DECIMAL(38,9) give the product as
    * exp(Σ ln) — sums compose exactly across buckets where a
    * sequential product fold would not. Group totals ride one
    * broadcast join. Nothing row-sized hits an ordered window: the
    * walks run over the duration grid (days/weeks — bounded), not
    * rows.
    *
    * d = n (every remaining subject events together) can only happen
    * at a group's final level; its ln(0) term is gated out and the
    * level's survival pinned to exactly 0.
    *
    * Contract: null durations/events drop; `eventCol` casts to int,
    * nonzero = event, zero = censored. Durations compare as doubles.
    * Output: (groupCol, duration, n_risk, n_event, n_censored,
    * survival rounded 6), every distinct duration level present. */
  def kaplanMeier(df: DataFrame, groupCol: String, durationCol: String,
                  eventCol: String): DataFrame = {
    val rows = df
      .filter(col(durationCol).isNotNull && col(eventCol).isNotNull)
      .select(col(groupCol).as("__g"),
        col(durationCol).cast("double").as("__dur"),
        (col(eventCol).cast("int") =!= 0).as("__ev"))
    val level = rows.groupBy(col("__g"), col("__dur"))
      .agg(sum(when(col("__ev"), 1L).otherwise(0L)).as("__d"),
        sum(when(col("__ev"), 0L).otherwise(1L)).as("__c"))
      .withColumn("__t", col("__d") + col("__c"))
    val totals = level.groupBy(col("__g")).agg(sum(col("__t")).as("__n"))
    // walk 1: level sizes → at-risk counts
    val atRisk = Ranks
      .groupedCumSum(level, Seq("__g"), "__dur", Seq("__t"))
      .join(broadcast(totals), Seq("__g"))
      .withColumn("__nr", col("__n") - col("cum___t") + col("__t"))
      // ln(1 − d/n) on the 9-grid; the d = n final level contributes 0
      // here and pins survival to 0 below (ln(0) never evaluates into
      // the sum)
      .withColumn("__lnq",
        when(col("__d") > 0 && col("__d") < col("__nr"),
          round(log(lit(1.0) -
            col("__d").cast("double") / col("__nr")), 9))
          .otherwise(lit(0.0)).cast("decimal(38,9)"))
    // walk 2: cumulative ln terms → survival
    Ranks.groupedCumSum(atRisk, Seq("__g"), "__dur", Seq("__lnq"))
      .select(col("__g").as(groupCol), col("__dur").as("duration"),
        col("__nr").as("n_risk"), col("__d").as("n_event"),
        col("__c").as("n_censored"),
        round(when(col("__d") === col("__nr"), lit(0.0))
          .otherwise(exp(col("cum___lnq").cast("double"))), 6)
          .as("survival"))
  }
}
