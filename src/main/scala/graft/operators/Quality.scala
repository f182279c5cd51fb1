package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
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
}
