package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("observeNulls collects row count + per-column null counts during the one action") {
    val df = Seq(
      (Some(1L), Some("a")), (None, Some("b")), (Some(3L), None), (None, None))
      .toDF("id", "text")
    val (observed, obs) = Quality.observeNulls(df, Seq("id", "text"))
    // the frame itself is unchanged; the metrics ride the action
    assert(observed.count() == 4)
    val m = obs.get
    assert(m("n_rows") == 4L)
    assert(m("null_id") == 2L)
    assert(m("null_text") == 2L)
  }

  test("observed: custom metrics (range violations) on a write-shaped action") {
    val out = java.nio.file.Files.createTempDirectory("quality").toString + "/t"
    val df = Seq((1L, 5.0), (2L, -1.0), (3L, 120.0)).toDF("k", "score")
    val (observed, obs) = Quality.observed(df, "range_check",
      count(lit(1)).as("n"),
      sum(when(col("score") < 0 || col("score") > 100, 1L).otherwise(0L))
        .as("out_of_range"))
    observed.write.parquet(out) // the single pass: write + metrics together
    assert(obs.get("out_of_range") == 2L && obs.get("n") == 3L)
    assert(spark.read.parquet(out).count() == 3, "data landed unchanged")
  }
}
