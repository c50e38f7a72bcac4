package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiling: phase walls of the incremental streaming KG build.
  * Usage: runMain graft.tools.IncProfile <sfDir> */
object IncProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.Bench.newSession(cpus)
    import spark.implicits._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[incprof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val work = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "incprof").toString
    val streamDir = s"$work/pages"
    t("rewrite") {
      spark.read.parquet(s"$sfDir/documents.parquet").repartition(4)
        .write.parquet(streamDir)
    }
    val docs = spark.readStream
      .schema(spark.read.parquet(streamDir).schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir)
    val pages = graft.queries.KgQueries.pageProjection(docs).as[graft.kg.Schema.Page]
    // 1) stream extraction + lineage, single final recanonicalize
    val w1 = s"$work/w1"
    t("stream_extract_plus_final_recanon") {
      graft.kg.StreamingPipeline.runIncremental(spark, pages, w1, recanonEvery = 0,
        extractParallelism = spark.sparkContext.defaultParallelism)
    }
    // 2) one more (seeded) recanonicalize over the same landed triples
    t("recanon_seeded_again") {
      graft.kg.StreamingPipeline.recanonicalize(spark, w1)
    }
    spark.stop()
  }
}
