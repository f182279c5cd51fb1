package graft.sources

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Source-format round-trips: CSV (the reference's input contract) and
  * JSON (north-star source surface). */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("tseCsv reads sep=';' latin-1 with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("csv")
    val f = dir.resolve("data.csv")
    java.nio.file.Files.write(f,
      "NR_PARTIDO;NM_PARTIDO\n13;São Paulo Ção\n0;Zero\n".getBytes("ISO-8859-1"))
    val schema = StructType(Seq(
      StructField("NR_PARTIDO", LongType), StructField("NM_PARTIDO", StringType)))
    val df = Tables.tseCsv(spark, f.toString, Some(schema))
    val rows = df.as[(Long, String)].collect().toMap
    assert(rows(13L) == "São Paulo Ção", "latin-1 diacritics must decode")
    assert(rows.contains(0L))
    assert(df.schema == schema)
  }

  test("tseCsv schema inference fallback") {
    val dir = java.nio.file.Files.createTempDirectory("csv2")
    val f = dir.resolve("d.csv")
    java.nio.file.Files.write(f, "A;B\n1;x\n2;y\n".getBytes("ISO-8859-1"))
    val df = Tables.tseCsv(spark, f.toString)
    assert(df.count() == 2)
    assert(df.schema("A").dataType == IntegerType)
  }

  test("JSON source round-trip preserves schema and values") {
    val dir = java.nio.file.Files.createTempDirectory("json").toString + "/j"
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "x")
    df.write.json(dir)
    val back = spark.read.json(dir).orderBy("id")
      .selectExpr("CAST(id AS BIGINT) id", "s", "x")
      .as[(Long, String, Double)].collect().toSeq
    assert(back == Seq((1L, "a", 1.5), (2L, "b", 2.5)))
  }

  test("unionAll with allowMissingColumns fills absent columns with null") {
    val a = Seq((1L, "x")).toDF("k", "v")
    val b = Seq(2L).toDF("k")
    val u = Tables.unionAll(Seq(a, b), allowMissingColumns = true)
    assert(u.count() == 2)
    assert(u.filter($"v".isNull).count() == 1)
  }

  test("tseCsvQuarantine isolates malformed rows instead of failing the scan") {
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val dir = java.nio.file.Files.createTempDirectory("quarantine")
    val f = dir.resolve("bad.csv")
    java.nio.file.Files.write(f,
      "a;b\n1;2\nnot_an_int;9\n3;4\n5\n".getBytes("ISO-8859-1"))
    val schema = StructType(Seq(
      StructField("a", IntegerType), StructField("b", IntegerType)))
    val df = Tables.tseCsvQuarantine(spark, f.toString, schema).cache()
    val good = df.filter($"_corrupt_record".isNull)
      .select("a", "b").as[(Int, Int)].collect().sorted.toSeq
    val bad = df.filter($"_corrupt_record".isNotNull)
      .select("_corrupt_record").as[String].collect().sorted.toSeq
    df.unpersist()
    assert(good == Seq((1, 2), (3, 4)), s"clean rows parse: $good")
    assert(bad == Seq("5", "not_an_int;9"),
      s"malformed rows carry their raw line for replay-after-fix: $bad")
  }

  test("parquetEvolved merges schema generations; plain read sees one footer") {
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString + "/t"
    // generation 1: (k, v); generation 2 adds a column (k, v, score)
    Seq((1L, "a")).toDF("k", "v").write.parquet(dir)
    Seq((2L, "b", 0.5)).toDF("k", "v", "score")
      .write.mode("append").parquet(dir)
    val merged = Tables.parquetEvolved(spark, dir)
    assert(merged.columns.sorted.toSeq == Seq("k", "score", "v"),
      "merged schema must be the superset across file generations")
    val rows = merged.orderBy("k").select("k", "v", "score")
      .as[(Long, String, Option[Double])].collect().toSeq
    assert(rows == Seq((1L, "a", None), (2L, "b", Some(0.5))),
      "generation-1 rows null-fill the added column")
  }

  test("ORC round-trip with filter pushdown reaching the scan") {
    val dir = java.nio.file.Files.createTempDirectory("orc").toString + "/t"
    val orders = spark.read.parquet(sf("sf0.001") + "/orders.parquet")
    orders.write.orc(dir)
    val back = Tables.orc(spark, dir)
    assert(back.count() == orders.count())
    val q = back.filter($"o_orderkey" === 42L).select("o_orderkey", "o_totalprice")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_orderkey"),
      s"ORC scan must receive the pushed filter:\n$plan")
  }
}
