package graft.tools

import org.apache.spark.sql.SparkSession

/** Time catalog queries repeatedly: `runMain graft.tools.TimeQuery
  * <name>[,<name>...] [sfDir] [reps]`. Uses the noop sink like
  * graft.Bench so the full physical plan runs; prints per-rep seconds
  * for variance-aware profiling (Bench only gives one sample per
  * round). A comma-separated list shares one warm JVM across queries. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: runMain graft.tools.TimeQuery <name>[,<name>...] [sfDir] [reps]")
      System.err.println("known queries: " + graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(2)
    }
    val names = args(0).split(",").toSeq
    val unknownNames = names.filterNot(graft.SparkEntry.queries.contains)
    if (unknownNames.nonEmpty) {
      System.err.println("unknown queries: " + unknownNames.mkString(", "))
      System.err.println("known queries: " + graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(2)
    }
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      for (r <- 1 to reps) {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"[time] $name rep $r: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
