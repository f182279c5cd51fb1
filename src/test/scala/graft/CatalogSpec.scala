package graft

/** Every catalog query must run and return rows at sf0.001, and every
  * oracle entry must have a matching query (driver-contract hygiene). */
class CatalogSpec extends SparkSpec {

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle entries without a query: $extra")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$name runs and returns rows on sf0.001") {
      val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
