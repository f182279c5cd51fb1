package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Shared helpers for catalog query modules.
  *
  * Determinism rules (SURVEY.md §5): every oracle query ends in ORDER BY a
  * unique key; float aggregates accumulate in DECIMAL (exact, associative —
  * no double reassociation hazard), then cast to double and round; no
  * uuid()/now()/rand in compared output.
  */
object Catalog {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  /** Exact money arithmetic: accumulate in decimal, present as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    round(sum(c.cast(s"decimal(18,$scale)")).cast("double"), 4)

  /** TPC-H discounted revenue `sum(extprice * (1 - discount))`, decimal-
    * exact — the one definition all revenue queries (and their oracle
    * SQL) must agree with. */
  def discRevenue: Column =
    round(sum((col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
      .cast("decimal(28,4)")).cast("double"), 4)
}
