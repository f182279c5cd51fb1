package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * The reference engine (politicamente-etl) creates a new SQLAlchemy engine
  * per pipeline call (database.py:7-10); the Spark-native analog is a single
  * shared [[SparkSession]] configured once. Settings here are chosen for the
  * 100 TB design point and scale down to local mode:
  *
  *  - AQE on: runtime coalescing of shuffle partitions, skew-join splitting
  *    and dynamic join selection replace any hand-tuned partition counts.
  *  - Broadcast threshold left at default (10 MB): dimension tables
  *    (region/nation/customer-like) broadcast automatically, mirroring the
  *    reference's driver-side dimension dict caches (load.py:56-57,66).
  *  - Session timezone pinned UTC so results are reproducible against any
  *    external oracle regardless of host TZ.
  */
object GraftSession {

  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Runtime bloom-filter pushdown: a selective fact-fact join builds a
      // bloom filter from the filtered side and prunes the probe side's
      // scan at the row-group level — the AQE-era replacement for manual
      // pre-filter staging on 100 TB joins. (Creation thresholds are the
      // defaults — 10 MB build side / 10 GB probe side — so it only kicks
      // in where it pays; BloomFilterJoinSpec lowers them to assert the
      // injected filter end-to-end.)
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // testdata events.ts is parquet TIMESTAMP(NANOS); read as long ns
      // and normalize in sources.Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // the engine's SQL surface (minhash, simhash64, shingle_hash_set,
      // cosine_similarity, nfc_normalize) is part of the session contract —
      // a GraftSession user gets them in spark.sql(...) without wiring
      // spark.sql.extensions themselves
      .withExtensions(new graft.plans.GraftExtensions)

  def local(cores: Int = 32): SparkSession = {
    val s = builder(s"local[$cores]", shufflePartitions = cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
