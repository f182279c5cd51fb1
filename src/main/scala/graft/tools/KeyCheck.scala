package graft.tools
object KeyCheck {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"[keycheck] queries=${q.size} oracles=${o.size} orphanOracles=${(o -- q).toList.sorted} noOracle=${(q -- o).size}")
    println(s"[keycheck] noOracle list: ${(q -- o).toList.sorted.mkString(",")}")
  }
}
