package graft.tools
import org.apache.spark.sql.SparkSession
import graft.kg.{PagesGen, Pipeline, Schema}

/** Per-stage wall times for one parallelism level (fresh JVM per run). */
object StageScaling {
  def main(args: Array[String]): Unit = {
    val nDocs = args(0).toLong
    val cpus = args(1).toInt
    val spark = graft.Bench.newSession(cpus)
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "ss").toString
    val t0 = System.nanoTime()
    PagesGen.pages(spark, nDocs).repartition(192).write.parquet(s"$work/pages")
    val genSec = (System.nanoTime() - t0) / 1e9
    val pages = spark.read.parquet(s"$work/pages").as[Schema.Page]
    Pipeline.run(spark, PagesGen.pages(spark, 2000L),
      Pipeline.Config(s"$work/w", cpus * 2, resume = false, writeMetrics = false))
    val r = Pipeline.run(spark, pages,
      Pipeline.Config(s"$work/main", cpus * 2, resume = false, writeMetrics = false))
    println(f"STAGES cpus=$cpus gen=$genSec%.1f " + r.metrics.collect().map(_.toString).mkString(" "))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    spark.stop()
  }
}
