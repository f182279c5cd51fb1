package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations: a rule set evaluated into one
  * violations report — the promote/quarantine gate a pipeline runs
  * before a load goes live (the reference quarantines malformed CSV
  * rows at read time, extract.py:44; this is the same contract applied
  * to ANY table with user-declared rules).
  *
  * Row-local rules (not-null, range, custom predicate) fold into ONE
  * aggregation pass — one `sum(when(violated, 1))` column each, a
  * single scan however many rules. Set-level rules cost what they
  * inherently cost: uniqueness is one keyed count-distinct in the same
  * pass (Spark expands, still one scan), referential integrity is one
  * left-anti join per referenced dimension.
  */
object Expectations {

  sealed trait Rule { def name: String }
  /** `col` must be non-null. */
  final case class NotNull(col: String) extends Rule {
    val name = s"not_null($col)"
  }
  /** `col` must lie in [lo, hi] (nulls violate — gate them with a
    * separate NotNull if nulls are legal). */
  final case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    val name = s"in_range($col,$lo,$hi)"
  }
  /** Arbitrary row predicate that must hold. */
  final case class Satisfies(label: String, predicate: Column) extends Rule {
    val name = s"satisfies($label)"
  }
  /** The column tuple must be unique across the table; violations =
    * rows beyond the first per duplicated key. */
  final case class Unique(cols: Seq[String]) extends Rule {
    val name = s"unique(${cols.mkString(",")})"
  }
  /** Every (non-null) key must exist in `dim(dimCol)`; violations =
    * orphan rows. */
  final case class RefIntegrity(col: String, dim: DataFrame,
                                dimCol: String) extends Rule {
    val name = s"ref_integrity($col)"
  }

  private def violated(r: Rule): Option[Column] = r match {
    case NotNull(c)        => Some(col(c).isNull)
    case InRange(c, lo, hi) =>
      Some(col(c).isNull || col(c) < lo || col(c) > hi)
    case Satisfies(_, p)   => Some(!coalesce(p, lit(false)))
    case _                 => None
  }

  /** Evaluate `rules` against `df`: one report row per rule —
    * (rule, n_violations, n_rows). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "rules must be non-empty")
    val spark = df.sparkSession
    import spark.implicits._

    val rowLocal = rules.flatMap(r => violated(r).map(r.name -> _))
    val uniques  = rules.collect { case u: Unique => u }
    val refs     = rules.collect { case r: RefIntegrity => r }

    val aggCols =
      (count(lit(1)).as("__n")) +:
        rowLocal.map { case (n, v) =>
          sum(when(v, 1L).otherwise(0L)).as(s"__v_$n") } ++:
        uniques.map(u =>
          count_distinct(struct(u.cols.map(col): _*)).as(s"__u_${u.name}"))
    val agg = df.agg(aggCols.head, aggCols.tail: _*).collect()(0)
    val nRows = agg.getAs[Long]("__n")

    val local = rowLocal.map { case (n, _) =>
      (n, agg.getAs[Long](s"__v_$n"), nRows) } ++
      uniques.map(u => (u.name, nRows - agg.getAs[Long](s"__u_${u.name}"),
        nRows))

    val refRows = refs.map { r =>
      val orphans = df.filter(col(r.col).isNotNull)
        .join(r.dim.select(col(r.dimCol).as(r.col)).distinct(),
          Seq(r.col), "left_anti")
        .count()
      (r.name, orphans, nRows)
    }

    (local ++ refRows).toDF("rule", "n_violations", "n_rows")
  }
}
