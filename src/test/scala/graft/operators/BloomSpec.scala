package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("decontaminate is row-identical to a plain anti-join (bloom is exact end-to-end)") {
    val candidates = spark.range(0, 10000)
      .select(col("id"), concat(lit("k"), col("id")).as("key"))
    val reference = spark.range(0, 10000, 7) // every 7th key contaminated
      .select(concat(lit("k"), col("id")).as("rk"))
    val out = Bloom.decontaminate(candidates, "key", reference, "rk")
      .select("id").as[Long].collect().sorted.toSeq
    val exact = candidates
      .join(reference.withColumnRenamed("rk", "key"), Seq("key"), "left_anti")
      .select("id").as[Long].collect().sorted.toSeq
    assert(out == exact && out.nonEmpty)
    assert(out.forall(_ % 7 != 0), "no reference key survives (no false negatives)")
  }

  test("the prefilter rejects the clean bulk: flagged fraction ≈ overlap + fpp") {
    val candidates = spark.range(0, 20000)
      .select(concat(lit("k"), col("id")).as("key"))
    val reference = spark.range(0, 1000) // ids 0-999 = 5% overlap
      .select(concat(lit("k"), col("id")).as("rk"))
    val bytes = Bloom.build(reference, "rk", fpp = 0.01)
    val flagged = candidates
      .filter(Bloom.mightContain(bytes, col("key"))).count()
    // 1000 true hits + ~1% of the 19000 clean rows; generous 3x margin
    assert(flagged >= 1000 && flagged < 1000 + 19000 * 0.03,
      s"flagged $flagged — only this fraction ever reaches the verify join")
    // rows the filter rejects are DEFINITELY clean: zero overlap with ref
    val rejected = candidates.filter(!Bloom.mightContain(bytes, col("key")))
    assert(rejected.join(reference.withColumnRenamed("rk", "key"),
      Seq("key"), "left_semi").count() == 0)
  }

  test("empty reference keeps everything; guards") {
    val candidates = spark.range(0, 100)
      .select(col("id"), col("id").cast("string").as("key"))
    val empty = spark.range(0, 0).select(col("id").cast("string").as("rk"))
    val out = Bloom.decontaminate(candidates, "key", empty, "rk")
    assert(out.count() == 100)
    intercept[IllegalArgumentException] {
      Bloom.build(candidates, "key", fpp = 1.5)
    }
  }
}
