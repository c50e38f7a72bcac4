package graft.tools
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import graft.kg.{PagesGen, Pipeline, Schema}
import java.util.concurrent.atomic.AtomicLong

/** Per-stage wall + task-time + GC-time for one parallelism level. */
object StageScaling {
  def main(args: Array[String]): Unit = {
    val nDocs = args(0).toLong
    val cpus = args(1).toInt
    val spark = graft.Bench.newSession(cpus)
    val run = new AtomicLong(0); val gc = new AtomicLong(0)
    val deser = new AtomicLong(0); val cpuT = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          run.addAndGet(m.executorRunTime); gc.addAndGet(m.jvmGCTime)
          deser.addAndGet(m.executorDeserializeTime)
          cpuT.addAndGet(m.executorCpuTime / 1000000L)
        }
      }
    })
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "ss").toString
    PagesGen.pages(spark, nDocs).repartition(192).write.parquet(s"$work/pages")
    val pages = spark.read.parquet(s"$work/pages").as[Schema.Page]
    Pipeline.run(spark, PagesGen.pages(spark, 2000L),
      Pipeline.Config(s"$work/w", cpus * 2, resume = false, writeMetrics = false))
    def snap(): (Long, Long, Long, Long) = (run.get, gc.get, deser.get, cpuT.get)
    val before = snap()
    val t0 = System.nanoTime()
    val r = Pipeline.run(spark, pages,
      Pipeline.Config(s"$work/main", cpus * 2, resume = false, writeMetrics = false))
    val wall = (System.nanoTime() - t0) / 1e9
    val after = snap()
    println(f"STAGES cpus=$cpus wall=$wall%.1f taskRun=${(after._1 - before._1) / 1000.0}%.1f " +
      f"gc=${(after._2 - before._2) / 1000.0}%.1f deser=${(after._3 - before._3) / 1000.0}%.1f " +
      f"cpu=${(after._4 - before._4) / 1000.0}%.1f " +
      r.metrics.collect().map(_.toString).mkString(" "))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    spark.stop()
  }
}
