package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup

/** Dev profiling harness for the MinHash pipeline stages (not part of the
  * driver contract). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val corpus = graft.catalog.LlmQueries.withPlantedNearDups(
      spark.read.parquet(s"$d/documents.parquet"))

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }

    time("corpus count")(corpus.count())
    val sig = Dedup.minHashSignature(corpus, "text", 3, 32)
    time("signatures")(sig.write.format("noop").mode("overwrite").save())
    val pairs = Dedup.minHashCandidatePairs(sig, "doc_id", 8, 4)
    time("candidate pairs")(pairs.write.format("noop").mode("overwrite").save())
    val verified = Dedup.jaccardVerify(pairs, corpus, "doc_id", "text")
    time("jaccard verify")(verified.write.format("noop").mode("overwrite").save())
    time("full q43")(graft.SparkEntry.queries("q43_minhash_pairs")(spark, d)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
