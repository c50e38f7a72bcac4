package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiling harness: time one (or more) SparkEntry queries against a
  * scale-factor dir in a fresh session. Usage:
  *   runMain graft.tools.RunQuery <sfDir> <query> [query...]
  * Optional: SPARK_GRAFT_CPUS, SPARK_GRAFT_EXPLAIN=1 to print the plan. */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.Bench.newSession(cpus)
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")) df.explain("formatted")
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[runquery] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
