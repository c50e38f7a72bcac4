package graft

/** Extra (non-contract) benchmark harness for the optimization round:
  * times arbitrary SparkEntry queries with EXACTLY Bench's methodology
  * (t0 before the query closure runs, `.count()` as the action — the
  * closure itself does the work for streaming/kg queries) so numbers are
  * comparable to BENCH_r*.json entries, without touching the frozen
  * Bench.scala. Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     runMain graft.BenchExtra [reps=N] [explain=DIR] <query> [query...]
  * `explain=DIR` writes each query's .explain("formatted") to
  * DIR/<query>.txt (plan evidence for plans/r06/). `all` expands to the
  * full sorted sweep. Between reps the kg pipeline cache is reset like
  * Bench does between sweeps. One JSON line per query on stdout. */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    var reps = 1
    var explainDir: Option[String] = None
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    args.foreach {
      case a if a.startsWith("reps=") => reps = a.stripPrefix("reps=").toInt
      case a if a.startsWith("explain=") => explainDir = Some(a.stripPrefix("explain="))
      case "all" => names ++= SparkEntry.queries.keys.toSeq.sorted
      case a => names += a
    }
    explainDir.foreach(d => new java.io.File(d).mkdirs())
    val spark = Bench.newSession(cpus)
    val sc = spark.sparkContext
    for (r <- 1 to reps) {
      if (r > 1) {
        graft.queries.KgQueries.resetRunCache()
        spark.catalog.clearCache()
      }
      for (name <- names) {
        val fn = SparkEntry.queries(name)
        sc.setJobDescription(s"bx:$name")
        val t0 = System.nanoTime()
        var rows = -1L
        try {
          val df = fn(spark, sfDir)
          rows = df.count()
          if (r == 1) explainDir.foreach { d =>
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"$d/$name.txt"),
              plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
        } catch { case e: Throwable =>
          System.err.println(s"[benchextra] $name failed: ${e.getMessage}")
        }
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"q":"$name","rep":$r,"sec":$sec%.3f,"rows":$rows}""")
        sc.setJobDescription(null)
      }
    }
    spark.stop()
  }
}
