package graft.tools

/** Dev tool: measure the REAL driver-side bytes/edge of the CC fast path
  * (collect array + boxed union-find HashMap), so
  * `ConnectedComponents.driverEdgeBudget` divides the heap by a measured
  * constant instead of an estimate. Run: `sbt "runMain graft.tools.CcBudget [nEdges]"`. */
object CcBudget {
  private def used(): Long = {
    (1 to 3).foreach(_ => System.gc())
    Thread.sleep(100)
    Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000000)
    val rnd = new scala.util.Random(42)
    val before = used()

    // the collect() array of (Long, Long) rows
    val es = Array.fill(n)((rnd.nextLong() & 0x3fffffffL, rnd.nextLong() & 0x3fffffffL))
    val afterArray = used()

    // the union-find HashMap, built exactly like ConnectedComponents.run
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    for ((a, b) <- es if a != b) {
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val afterMap = used()

    println(f"[ccbudget] edges=$n entries=${parent.size}")
    println(f"[ccbudget] array bytes/edge: ${(afterArray - before).toDouble / n}%.1f")
    println(f"[ccbudget] map bytes/edge:   ${(afterMap - afterArray).toDouble / n}%.1f")
    println(f"[ccbudget] TOTAL bytes/edge: ${(afterMap - before).toDouble / n}%.1f")
    // keep both alive past the last measurement
    if (es.length + parent.size < 0) println("")
  }
}
