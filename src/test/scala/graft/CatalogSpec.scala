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

  test("no catalog query emits a raw DecimalType output column " +
    "(the q174/q266 rule: value-identical decimals can diverge in a " +
    "type-sensitive hash compare — render as double-rounded-6 or " +
    "string instead)") {
    import org.apache.spark.sql.types.DecimalType
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val schema = SparkEntry.queries(name)(spark, sf("sf0.001")).schema
      val bad = schema.fields.collect {
        case f if f.dataType.isInstanceOf[DecimalType] => f.name
      }
      if (bad.isEmpty) None else Some(s"$name: ${bad.mkString(",")}")
    }
    assert(offenders.isEmpty,
      s"raw DECIMAL output columns found:\n${offenders.mkString("\n")}")
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$name runs and returns rows on sf0.001") {
      val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
