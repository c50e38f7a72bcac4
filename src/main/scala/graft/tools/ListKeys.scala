package graft.tools

/** Dev tool: print queries that lack a DuckDB oracle (driver records a
  * weaker rows-only check for those). */
object ListKeys {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println("NO_ORACLE: " + (q -- o).toSeq.sorted.mkString(", "))
    println("ORPHAN: " + (o -- q).toSeq.sorted.mkString(", "))
    println("COUNT queries=" + q.size + " oracles=" + o.size)
  }
}
