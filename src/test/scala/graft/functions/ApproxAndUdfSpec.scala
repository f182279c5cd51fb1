package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Engine-side invariants for the rows-only approximate queries (no
  * DuckDB oracle exists for estimator internals — q28/q68 in COVERAGE),
  * plus the scalar-UDF registration surface from SURVEY §2.B (builtins
  * are preferred throughout the engine; `udf()` remains available for
  * logic Catalyst can't express).
  */
class ApproxAndUdfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders = spark.read.parquet(sf("sf0.01") + "/orders.parquet")

  test("approx_count_distinct within its documented error of exact (q28 invariant)") {
    val row = orders.agg(
      countDistinct(col("o_custkey")).as("exact"),
      approx_count_distinct(col("o_custkey"), 0.02).as("approx"))
      .as[(Long, Long)].collect().head
    val (exact, approx) = row
    val relErr = math.abs(approx - exact).toDouble / exact
    // rsd 0.02 -> 2 sigma ~ 4%; allow 3 sigma
    assert(relErr < 0.06, s"HLL estimate $approx vs exact $exact (relErr $relErr)")
  }

  test("approx_percentile brackets the exact percentile (q68 invariant)") {
    val exact = orders.stat.approxQuantile("o_totalprice", Array(0.5), 0.0).head
    val approx = orders
      .agg(expr("approx_percentile(o_totalprice, 0.5, 1000)").as("p"))
      .as[Double].collect().head
    // with accuracy 1000 the rank error is 0.1%; compare against the exact
    // median's neighborhood by value rank
    val n = orders.count()
    val below = orders.filter(col("o_totalprice") <= approx).count()
    val rank = below.toDouble / n
    assert(math.abs(rank - 0.5) < 0.01,
      s"approx median $approx sits at rank $rank (exact median $exact)")
  }

  test("scalar udf registers and runs from both DataFrame and SQL (SURVEY 2.B)") {
    val taxed = udf((x: Double) => x * 1.17)
    spark.udf.register("plus_tax", taxed)
    val viaDf = spark.range(1).select(taxed(lit(100.0))).as[Double].collect().head
    val viaSql = spark.sql("SELECT plus_tax(100.0D) AS t").as[Double].collect().head
    assert(viaDf == 117.0 && viaSql == 117.0)
    // and the plan marks it as a black-box (no codegen claim): it appears
    // as a ScalaUDF node, which is why the engine prefers builtins
    val plan = spark.range(1).select(taxed(lit(1.0)))
      .queryExecution.analyzed.toString
    assert(plan.contains("UDF") || plan.contains("plus_tax"), plan)
  }
}
