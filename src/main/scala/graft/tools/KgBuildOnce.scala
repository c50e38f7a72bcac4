package graft.tools

/** Dev: the Bench kg_build metric in isolation (warmup + n reps, same
  * protocol). Usage: runMain graft.tools.KgBuildOnce [reps] */
object KgBuildOnce {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val kgDocs = sys.env.getOrElse("SPARK_GRAFT_KG_DOCS", "20000").toLong
    val spark = graft.Bench.newSession(cpus)
    graft.Bench.kgBuild(spark, 2000L, cpus * 2)
    for (r <- 1 to reps) {
      val (sec, dps, tps, n) = graft.Bench.kgBuild(spark, kgDocs, cpus * 2)
      println(f"[kgbuild] rep $r: $sec%.2f s, $dps%.0f docs/s, $tps%.0f triples/s, $n triples")
    }
    spark.stop()
  }
}
