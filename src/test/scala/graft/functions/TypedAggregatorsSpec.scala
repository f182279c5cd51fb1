package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TypedAggregatorsSpec extends SparkSpec {
  import spark.implicits._

  test("VectorMean centroid per label matches hand computation; partition-invariant") {
    val df = Seq(
      (0, Seq(1.0f, 2.0f)), (0, Seq(3.0f, 4.0f)), (1, Seq(10.0f, 20.0f)))
      .toDF("label", "vec")
    val mean = udaf(new TypedAggregators.VectorMean(2))
    def centroids(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("label").agg(mean(col("vec")).as("c"))
        .orderBy("label").as[(Int, Seq[Double])].collect().toSeq
    val out = centroids(df)
    assert(out == Seq((0, Seq(2.0, 3.0)), (1, Seq(10.0, 20.0))))
    assert(centroids(df.repartition(5)) == out)
  }

  test("MinHashUnion merges signatures element-wise") {
    val df = Seq(
      (0, Seq(5L, 9L, 1L)), (0, Seq(3L, 12L, 2L)), (1, Seq(7L, 7L, 7L)))
      .toDF("grp", "sig")
    val union = udaf(new TypedAggregators.MinHashUnion(3))
    val out = df.groupBy("grp").agg(union(col("sig")).as("u"))
      .orderBy("grp").as[(Int, Seq[Long])].collect().toSeq
    assert(out == Seq((0, Seq(3L, 9L, 1L)), (1, Seq(7L, 7L, 7L))))
  }
}
