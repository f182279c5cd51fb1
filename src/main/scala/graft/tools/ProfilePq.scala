package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{PqIndex, VectorFunctions => VF}

/** Scratch profiler for the q140 stages. */
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pq] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val emb = spark.read.parquet(dir + "/embeddings.parquet")
        .filter(col("embedding").isNotNull)
      val normed = VF.l2Normalized(emb, "embedding", "vec")
        .select(col("vec_id"), col("vec"))
      val q = t("query collect") {
        normed.filter(col("vec_id") === 0).select("vec")
          .collect()(0).getSeq[Float](0)
      }
      val corpus = normed.filter(col("vec_id") =!= 0)
      t("train it=0") {
        PqIndex.train(corpus, "vec", "vec_id", m = 16, ksub = 32, iterations = 0)
      }
      t("train it=1") {
        PqIndex.train(corpus, "vec", "vec_id", m = 16, ksub = 32, iterations = 1)
      }
      val cb = t("train it=3") {
        PqIndex.train(corpus, "vec", "vec_id", m = 16, ksub = 32, iterations = 3)
      }
      val coded = PqIndex.encode(corpus, "vec", cb)
      t("adcTopK shortlist") {
        PqIndex.adcTopK(coded, "vec_id", cb, q, 50).collect()
      }
      t("refine") {
        PqIndex.adcRefineTopK(coded, "vec", "vec_id", cb, q, 10, 50).collect()
      }
    }
    spark.stop()
  }
}
