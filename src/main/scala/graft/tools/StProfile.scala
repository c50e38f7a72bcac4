package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiling: per-batch duration breakdown of the streaming queries
  * (queryPlanning / addBatch / walCommit / stateOperators), via the
  * StreamingQueryListener. Usage: runMain graft.tools.StProfile <sfDir> <query...> */
object StProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.Bench.newSession(cpus)
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val d = p.durationMs
        System.err.println(s"[stprof] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${d} state=${p.stateOperators.map(so =>
            s"(rows=${so.numRowsTotal},updated=${so.numRowsUpdated},commitMs=${so.commitTimeMs},mem=${so.memoryUsedBytes})").mkString(";")}")
      }
    })
    for (name <- names) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[stprof] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
