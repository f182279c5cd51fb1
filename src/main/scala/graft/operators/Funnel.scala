package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered event-sequence analytics over an event stream: conversion
  * funnels and cohort retention — the product-analytics pair beside
  * sessionization (q79) and the event-time windows (TimeQueries).
  *
  * Both are pure aggregation plans over (user, type, ts) projections:
  * every shuffle is keyed by user (or by the small (cohort, offset)
  * grid), every aggregation partial-combines map-side, and nothing is
  * windowed over an unpartitioned ordering — the shapes survive
  * billions of events because per-user state is one row per funnel
  * step, never the user's event list.
  */
object Funnel {

  /** Conversion funnel: how many users performed `steps` IN ORDER —
    * step i+1 counted only when it happens STRICTLY AFTER the user's
    * earliest qualifying step i (ties at the same timestamp are not
    * progression), and, with `maxGapUs` set, within that many
    * microseconds of it (the standard conversion-window semantics —
    * an unbounded funnel saturates on any long-lived user base).
    * Output: (step, step_name, users), one row per step, users
    * non-increasing.
    *
    * Uses the earliest-qualifying-time greedy: step 1 anchors at the
    * user's FIRST step-1 event; each later step at the first qualifying
    * occurrence after the previous anchor. With a conversion window
    * this is not always the maximal assignment (an anchor later than
    * the earliest can occasionally rescue a tight window) — the greedy
    * is the industry-standard semantics and keeps per-user state one
    * timestamp per step.
    *
    * Scale shape: one filtered scan + user-keyed min-agg per step, each
    * joined user-keyed to the previous step's anchors; repeated step
    * types are fine (the strict-after gate advances through duplicate
    * types). Counts union into one small result. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String],
             maxGapUs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    maxGapUs.foreach(g => require(g > 0, s"maxGapUs must be positive, got $g"))
    val e = events.select(col(userCol).as("__u"), col(typeCol).as("__t"),
      col(tsCol).as("__ts"))
    def stepCount(reached: DataFrame, i: Int, name: String) =
      reached.agg(count(lit(1)).as("users"))
        .select(lit(i.toLong).as("step"), lit(name).as("step_name"),
          col("users"))
    var reached = e.filter(col("__t") === steps.head)
      .groupBy("__u").agg(min(col("__ts")).as("__prev"))
    var out = stepCount(reached, 1, steps.head)
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      val gate = maxGapUs.fold(lit(true))(g =>
        unix_micros(col("__ts")) - unix_micros(col("__prev")) <= g)
      reached = e.filter(col("__t") === st)
        .join(reached, Seq("__u"))
        .filter(col("__ts") > col("__prev") && gate)
        .groupBy("__u").agg(min(col("__ts")).as("__prev"))
      out = out.unionByName(stepCount(reached, i + 1, st))
    }
    out
  }

  /** Top-k most frequent length-`len` event-type paths across users'
    * time-ordered sequences — the exploratory companion to
    * [[transitionMatrix]] (first-order) and [[funnel]] (one fixed
    * hypothesis): which journeys actually happen. Paths are windows of
    * `len` CONSECUTIVE events within one user (no gaps, no
    * cross-user windows); output (path, n) with the path joined by
    * `>`, ranked (n DESC, path ASC).
    *
    * Scale shape: `len − 1` stacked lead() columns over ONE
    * user-partitioned window (a single per-user bounded sort), one
    * path-keyed count (≤ |types|^len groups), TakeOrderedAndProject
    * for the top k. */
  def topPaths(events: DataFrame, userCol: String, typeCol: String,
               tsCol: String, tieCol: String, len: Int = 3,
               k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(len >= 2, s"len must be >= 2, got $len")
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col("__u"))
      .orderBy(col("__ts").asc, col("__tie").asc)
    val steps = col("__t").as("__p0") +:
      (1 until len).map(i => lead(col("__t"), i).over(w).as(s"__p$i"))
    events.select(col(userCol).as("__u"), col(typeCol).as("__t"),
        col(tsCol).as("__ts"), col(tieCol).as("__tie"))
      .select(steps: _*)
      .filter((1 until len).map(i => col(s"__p$i").isNotNull).reduce(_ && _))
      .select(concat_ws(">", (0 until len).map(i => col(s"__p$i")): _*)
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(k)
  }

  /** First-order Markov transition matrix of event types: for every
    * consecutive pair in each user's time-ordered event sequence, the
    * pair count and the conditional probability P(to | from). The
    * user-journey summary beside [[funnel]] (which tests ONE ordered
    * hypothesis; the matrix surveys all of them). Output:
    * (from_type, to_type, n, p) with p on the 6-grid.
    *
    * `tieCol` breaks equal timestamps (an event id / sequence number) so
    * the sequence — and the matrix — is deterministic under concurrent
    * events. Scale shape: one user-partitioned lead() window (per-user
    * bounded sort, the q79 sessionize shape), one (from, to) count of at
    * most |types|² groups, row totals broadcast back. */
  def transitionMatrix(events: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__u"))
      .orderBy(col("__ts").asc, col("__tie").asc)
    val pairs = events.select(col(userCol).as("__u"), col(typeCol).as("__t"),
        col(tsCol).as("__ts"), col(tieCol).as("__tie"))
      .withColumn("__next", lead(col("__t"), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col("__t").as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("from_type").agg(sum(col("n")).as("__tot"))
    pairs.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("__tot"), 6).as("p"))
  }

  /** Cohort retention: users bucketed by the period of their FIRST
    * event (the cohort), counted in every period they were active.
    * Output: (cohort, period_offset, users) — cohort as a date
    * (period start), offset 0 = the cohort period itself, so offset-0
    * users is the cohort size and the retention rate is
    * users / cohort-size downstream.
    *
    * `period` is `day`, `week` (Monday-start, the `date_trunc`
    * convention) or `month`. Scale shape: one (user, period) distinct
    * — THE activity set, one row per user-period, not per event —
    * then a user-keyed min for cohorts and one small (cohort, offset)
    * count; all partial-agg shuffles. */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      period: String = "week"): DataFrame = {
    require(Set("day", "week", "month").contains(period),
      s"period must be day|week|month, got $period")
    val active = events
      .select(col(userCol).as("__u"),
        date_trunc(period, col(tsCol)).as("__p"))
      .distinct()
    val cohorts = active.groupBy("__u").agg(min(col("__p")).as("__c"))
    val offset = period match {
      case "day"   => datediff(col("__p"), col("__c")).cast("long")
      case "week"  => (datediff(col("__p"), col("__c")) / 7).cast("long")
      case "month" => months_between(col("__p"), col("__c")).cast("long")
    }
    active.join(cohorts, Seq("__u"))
      .groupBy(col("__c").cast("date").as("cohort"),
        offset.as("period_offset"))
      .agg(count(lit(1)).as("users"))
  }

  /** Sequential pair support — for every ORDERED event-type pair
    * (a, b): how many users did a strictly before b? The
    * non-contiguous complement to [[transitionMatrix]] (immediate
    * next step) and [[topPaths]] (contiguous runs): "viewed, then —
    * eventually — purchased" counts here even with a thousand clicks
    * between. The support table sequence mining (and funnel DESIGN —
    * which step orders are even common?) starts from.
    *
    * Shape: the pair existence test needs only each user's FIRST a
    * and LAST b (∃ a before b ⟺ min_ts(a) < max_ts(b)), so the
    * corpus reduces to one (user, type)-keyed agg and the pair
    * explosion is a user-keyed self-join of |user's types|² rows —
    * bounded by the type vocabulary, never by event count. Same-type
    * pairs (a, a) mean "did a at least twice". Simultaneous
    * timestamps are NOT "before" (strict <): concurrency stays
    * unordered rather than picking an arbitrary winner.
    *
    * Output: (from_type, to_type, n_users, support rounded 6 —
    * fraction of ALL users with any qualifying event), ordered by
    * support desc then the pair. */
  def sequentialSupport(events: DataFrame, userCol: String,
                        typeCol: String, tsCol: String): DataFrame = {
    val per = events
      .filter(col(userCol).isNotNull && col(typeCol).isNotNull &&
        col(tsCol).isNotNull)
      .groupBy(col(userCol).as("__u"), col(typeCol).as("__t"))
      .agg(min(col(tsCol)).as("__first"), max(col(tsCol)).as("__last"))
    val total = per.agg(countDistinct(col("__u")).as("__n"))
    per.select(col("__u"), col("__t").as("from_type"), col("__first"))
      .join(per.select(col("__u"), col("__t").as("to_type"),
        col("__last")), "__u")
      .filter(col("__first") < col("__last"))
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(total))
      .select(col("from_type"), col("to_type"), col("n_users"),
        round(col("n_users").cast("double") / col("__n"), 6).as("support"))
      .orderBy(col("support").desc, col("from_type"), col("to_type"))
  }

  /** Cohort LTV accumulation curves — cumulative value per user by
    * cohort age: users cohort by their FIRST event's week, every
    * event's value lands in (cohort, age-in-weeks) cells, and the
    * running sum over age divided by the cohort's size is the curve
    * ("week-3 LTV of the January cohort") that [[cohortRetention]]'s
    * presence counts can't price. Week indexing is an integer day
    * difference div 7 from a fixed epoch — identical on any engine,
    * no locale week rules.
    *
    * Shape: one user-keyed min agg (cohorting), one (cohort, age)
    * cell agg of the fact, cohort sizes from the user table, and the
    * running sum rides [[Ranks.groupedCumSum]] over the cells (ages ×
    * cohorts rows, never events). Values 9-grid DECIMAL-summed.
    * Output: (cohort_week, age_weeks, n_users, revenue, cum_ltv
    * rounded 6) — revenue is the cell's own total, cum_ltv the
    * running per-user value. */
  def cohortLtv(events: DataFrame, userCol: String, tsCol: String,
                valCol: String, epoch: String): DataFrame = {
    val rows = events.filter(col(tsCol).isNotNull)
      .select(col(userCol).as("__u"),
        floor(datediff(col(tsCol).cast("date"), lit(epoch).cast("date"))
          / 7).as("__w"),
        coalesce(col(valCol).cast("double"), lit(0.0)).as("__v"))
    val cohorts = rows.groupBy(col("__u")).agg(min(col("__w")).as("__cw"))
    val sizes = cohorts.groupBy(col("__cw"))
      .agg(count(lit(1)).as("n_users"))
    val cells = rows.join(cohorts, "__u")
      .groupBy(col("__cw"), (col("__w") - col("__cw")).as("__age"))
      .agg(sum(round(col("__v"), 9).cast("decimal(38,9)")).as("__rev"))
    Ranks.groupedCumSum(cells, Seq("__cw"), "__age", Seq("__rev"))
      .join(broadcast(sizes), "__cw")
      .select(col("__cw").cast("int").as("cohort_week"),
        col("__age").cast("int").as("age_weeks"),
        col("n_users"),
        round(col("__rev").cast("double"), 6).as("revenue"),
        round(col("cum___rev").cast("double") /
          col("n_users").cast("double"), 6).as("cum_ltv"))
  }

  /** Conversion-lag distribution — how long users take from their
    * first `fromType` to their first `toType` AT OR AFTER it, the
    * "time to convert" readout [[funnel]]'s step counts and
    * [[cohortRetention]]'s day buckets both flatten away. Per user:
    * lag = min ts(to ≥ first from) − min ts(from), bucketed to whole
    * `unitSeconds` (floor); users who never convert are counted
    * (n_started vs n_converted) but contribute no lag.
    *
    * The summary percentiles are EXACT ⌈q·n⌉-th order statistics off
    * the lag-level grid ([[graft.operators.Ranks.groupedCumSum]] — the
    * conformal discipline; the floor-to-unit bucketing is what keeps
    * the grid far below corpus size). Per-user reductions are two
    * conditional min aggs on ONE user-keyed shuffle. Output one row:
    * (n_started, n_converted, min_lag, p50_lag, p90_lag, max_lag) in
    * units; the lag order statistics are null when nobody converts. */
  def conversionLag(events: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, fromType: String, toType: String,
                    unitSeconds: Long = 60L): DataFrame = {
    require(unitSeconds >= 1, s"unitSeconds must be >= 1, got $unitSeconds")
    val rows = events
      .filter(col(tsCol).isNotNull && col(typeCol).isin(fromType, toType))
      .select(col(userCol).as("__u"), col(typeCol).as("__ty"),
        col(tsCol).cast("timestamp").as("__ts"))
    val firstFrom = rows.filter(col("__ty") === fromType)
      .groupBy(col("__u")).agg(min(col("__ts")).as("__f"))
    val lags = rows.filter(col("__ty") === toType)
      .join(firstFrom, "__u")
      .filter(col("__ts") >= col("__f"))
      .groupBy(col("__u"), col("__f")).agg(min(col("__ts")).as("__t"))
      .select(col("__u"),
        floor((unix_timestamp(col("__t")) - unix_timestamp(col("__f"))) /
          lit(unitSeconds)).as("__lag"))
    val started = firstFrom.agg(count(lit(1)).as("n_started"))
    val lvl = lags.groupBy(col("__lag")).agg(count(lit(1)).as("__c"))
    val conv = lvl.agg(coalesce(sum(col("__c")), lit(0L)).as("n_converted"),
      min(col("__lag")).as("min_lag"), max(col("__lag")).as("max_lag"))
    val walked = Ranks.groupedCumSum(lvl, Seq.empty, "__lag", Seq("__c"))
      .crossJoin(broadcast(conv.select(col("n_converted").as("__n"))))
    def pick(q: Double, out: String): DataFrame = {
      val rank = ceil(col("__n").cast("double") * lit(q))
      walked
        .filter(col("cum___c") >= rank &&
          col("cum___c") - col("__c") < rank)
        .select(col("__lag").as(out))
    }
    started.crossJoin(conv)
      .join(pick(0.5, "p50_lag"), lit(true), "left")
      .join(pick(0.9, "p90_lag"), lit(true), "left")
      .select(col("n_started"), col("n_converted"), col("min_lag"),
        col("p50_lag"), col("p90_lag"), col("max_lag"))
  }

  /** One journey row per touch: each converting user's non-conversion
    * events strictly before their FIRST `convType` event (ordered by
    * ts with idCol as the total tie-break), with the touch's 1-based
    * position, the journey length k, and the seconds to conversion.
    * Users whose first conversion has no prior touch surface as one
    * (user, channel = null, pos = 0, k = 0) row — the q182 cold-start
    * convention, rendered 'none' by the attribution folds. */
  private def journeys(events: DataFrame, userCol: String, tsCol: String,
                       idCol: String, typeCol: String,
                       convType: String): DataFrame = {
    val rows = events.filter(col(tsCol).isNotNull)
      .select(col(userCol).as("__u"), col(typeCol).as("__ty"),
        col(tsCol).cast("timestamp").as("__ts"), col(idCol).as("__i"))
    val conv = rows.filter(col("__ty") === convType)
      .groupBy(col("__u"))
      .agg(min(struct(col("__ts"), col("__i"))).as("__c"))
      .select(col("__u"), col("__c.__ts").as("__cts"),
        col("__c.__i").as("__ci"))
    val touches = rows.filter(col("__ty") =!= convType)
      .join(conv, "__u")
      .filter(col("__ts") < col("__cts") ||
        (col("__ts") === col("__cts") && col("__i") < col("__ci")))
    val w = Window.partitionBy(col("__u"))
      .orderBy(col("__ts").asc, col("__i").asc)
    val ranked = touches
      .withColumn("__pos", row_number().over(w))
      .withColumn("__k", count(lit(1)).over(Window.partitionBy(col("__u"))))
      .select(col("__u"), col("__ty").as("__ch"),
        col("__pos").cast("long").as("__pos"),
        col("__k").cast("long").as("__k"),
        (unix_timestamp(col("__cts")) - unix_timestamp(col("__ts")))
          .as("__dt"))
    val cold = conv.join(ranked.select(col("__u")).distinct(),
        Seq("__u"), "left_anti")
      .select(col("__u"), lit(null: String).as("__ch"),
        lit(0L).as("__pos"), lit(0L).as("__k"), lit(0L).as("__dt"))
    ranked.unionByName(cold)
  }

  /** Position-based (U-shaped) attribution — each converting user's
    * single unit of credit splits 40% to the first touch, 40% to the
    * last, and 20% evenly across the middles (k = 1 → 1.0, k = 2 →
    * 0.5/0.5, cold-start → 'none'), summed per channel. The standard
    * corrective to [[q182]]-style last-touch's recency bias without a
    * model fit. Per-touch credits are exact double divisions of small
    * integers rounded to the 9-grid before the DECIMAL sum —
    * engine-stable. Output: (channel, n_touches, credit rounded 6). */
  def positionAttribution(events: DataFrame, userCol: String,
                          tsCol: String, idCol: String, typeCol: String,
                          convType: String): DataFrame = {
    val j = journeys(events, userCol, tsCol, idCol, typeCol, convType)
    val credit =
      when(col("__k") === 0L, lit(1.0))
        .when(col("__k") === 1L, lit(1.0))
        .when(col("__k") === 2L, lit(0.5))
        .when(col("__pos") === 1L || col("__pos") === col("__k"), lit(0.4))
        .otherwise(lit(0.2) / (col("__k") - 2L).cast("double"))
    j.groupBy(coalesce(col("__ch"), lit("none")).as("channel"))
      .agg(count(lit(1)).as("n_touches"),
        sum(round(credit, 9).cast("decimal(38,9)")).as("__cr"))
      .select(col("channel"), col("n_touches"),
        round(col("__cr").cast("double"), 6).as("credit"))
  }

  /** Time-decay attribution — per converting user, touch weights
    * w = 1/(1 + Δt/halfLifeSec) with Δt the seconds to conversion,
    * normalized to one unit of credit per user, summed per channel.
    * RECIPROCAL decay, not exponential, deliberately: exp() is not
    * ULP-identical across engines, while this weight is plain rational
    * arithmetic on exact integer second differences — the 9-grid
    * rounds make the whole chain engine-stable. Cold-start conversions
    * credit 'none'. Output: (channel, n_touches, credit rounded 6). */
  def timeDecayAttribution(events: DataFrame, userCol: String,
                           tsCol: String, idCol: String, typeCol: String,
                           convType: String,
                           halfLifeSec: Double = 86400.0): DataFrame = {
    require(halfLifeSec > 0, s"halfLifeSec must be positive, got $halfLifeSec")
    val j = journeys(events, userCol, tsCol, idCol, typeCol, convType)
    val w = round(lit(1.0) /
      (lit(1.0) + col("__dt").cast("double") / lit(halfLifeSec)), 9)
    val totals = j.filter(col("__k") > 0L)
      .groupBy(col("__u"))
      .agg(sum(w.cast("decimal(38,9)")).as("__tw"))
    val credit =
      when(col("__k") === 0L, lit(1.0))
        .otherwise(round(w / col("__tw").cast("double"), 9))
    j.join(totals, Seq("__u"), "left")
      .groupBy(coalesce(col("__ch"), lit("none")).as("channel"))
      .agg(count(lit(1)).as("n_touches"),
        sum(round(credit, 9).cast("decimal(38,9)")).as("__cr"))
      .select(col("channel"), col("n_touches"),
        round(col("__cr").cast("double"), 6).as("credit"))
  }
}
