package graft.tools

import java.nio.file.{Files, Paths}

import graft.GraftSession

/** Dev tool: dump the formatted physical plan of every catalog query to
  * one file for plan review (pushdown present? broadcasts where expected?
  * accidental cartesians?). Usage: runMain graft.tools.ExplainAll [sfDir out]
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "/tmp/graft_plans.txt"
    val spark = GraftSession.local(4)
    val sb = new StringBuilder
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      sb.append(s"\n===== $name =====\n")
      try {
        val df = fn(spark, sfDir)
        sb.append(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch {
        case e: Throwable => sb.append(s"ERROR: ${e.getMessage}\n")
      }
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
