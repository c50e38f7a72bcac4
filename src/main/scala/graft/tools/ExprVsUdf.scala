package graft.tools

import org.apache.spark.sql.functions._

/** Dev measurement: the native CleanTextExpr vs the ScalaUDF wrapper on
  * the same parquet corpus (fresh scan per side, alternating reps). */
object ExprVsUdf {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(200000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.Bench.newSession(cpus)
    import spark.implicits._
    graft.ext.GraftFunctions.register(spark)
    val base = if (new java.io.File("/dev/shm").isDirectory)
      java.nio.file.Paths.get("/dev/shm") else java.nio.file.Paths.get("/tmp")
    val dir = java.nio.file.Files.createTempDirectory(base, "exprbench").toString
    spark.range(nDocs).map(i => graft.kg.PagesGen.docText(i))
      .toDF("text").repartition(cpus * 4).write.mode("overwrite").parquet(dir)
    def time(col: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      spark.read.parquet(dir).select(length(col).as("n")).agg(sum("n")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both JIT paths, then alternate reps
    time(expr("graft_clean_text(text)")); time(graft.kg.Udfs.cleanText(col("text")))
    val reps = 3
    val e = (1 to reps).map(_ => time(expr("graft_clean_text(text)"))).min
    val u = (1 to reps).map(_ => time(graft.kg.Udfs.cleanText(col("text")))).min
    println(f"[exprvsudf] docs=$nDocs cpus=$cpus expr=$e%.2f s udf=$u%.2f s speedup=${u / e}%.3fx")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.stop()
  }
}
