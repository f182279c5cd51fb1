package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off experiment: is q20's first-run spike the events-table cold read
  * or the JSON machinery's first-use cost? */
object ProfileQ20 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    time("events full scan (no json)") {
      graft.sources.Tables.events(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    time("tiny json warmup (1 row)") {
      spark.range(1)
        .select(get_json_object(lit("""{"k":1}"""), "$.k"))
        .write.format("noop").mode("overwrite").save()
    }
    time("q20 first run") {
      graft.SparkEntry.queries("q20_json_extract")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    time("q20 second run") {
      graft.SparkEntry.queries("q20_json_extract")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
