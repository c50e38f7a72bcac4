package graft.tools
import graft.kg.{PagesGen, Schema}
object IoScaling {
  def main(args: Array[String]): Unit = {
    val nDocs = args(0).toLong
    val cpus = args(1).toInt
    val spark = graft.Bench.newSession(cpus)
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "io").toString
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"IO cpus=$cpus $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("gen_count")(PagesGen.pages(spark, nDocs).count())                     // pure compute
    t("gen_write")(PagesGen.pages(spark, nDocs).repartition(192).write.parquet(s"$work/p"))
    val pages = spark.read.parquet(s"$work/p")
    t("read_count")(pages.count())                                            // scan only
    t("read_full")(pages.as[Schema.Page].map(p => p.url.length + (if (p.text == null) 0 else p.text.length)).reduce(_ + _)) // decode all cols
    t("clean_compute")(graft.kg.Pipeline.extractClean(spark, pages.as[Schema.Page], cpus * 2).map(_.clean_text.length.toLong).reduce(_ + _))
    t("clean_write")(graft.kg.Pipeline.extractClean(spark, pages.as[Schema.Page], cpus * 2).toDF().drop("raw_text").write.parquet(s"$work/c"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    spark.stop()
  }
}
