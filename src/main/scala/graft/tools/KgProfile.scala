package graft.tools

/** Dev tool: run the kgRun pipeline once and print per-stage wall times
  * (the pipeline's own metrics table). SPARK_GRAFT_CPUS to vary threads. */
object KgProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.Bench.newSession(cpus)
    val t0 = System.nanoTime()
    val work = graft.queries.KgQueries.kgRun(spark, sfDir)
    println(f"[kgprofile] total ${(System.nanoTime() - t0) / 1e9}%.2f s (cpus=$cpus)")
    spark.read.parquet(s"$work/metrics_stage").collect()
      .foreach(r => println(s"[kgprofile] $r"))
    spark.stop()
  }
}
