package graft

import org.apache.spark.sql.SparkSession
import graft.kg.{PagesGen, Pipeline}

/** Driver benchmark: headline SparkEntry queries on SPARK_GRAFT_SF_DIR
  * plus the end-to-end KG build (docs/sec + triples/sec — the
  * BASELINE.json metric). One JSON line on stdout. */
object Bench {

  def newSession(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One full KG build over nDocs synthetic pages; returns
    * (wallSec, docsPerSec, triplesPerSec, nTriples). */
  def kgBuild(spark: SparkSession, nDocs: Long, nPartitions: Int): (Double, Double, Double, Long) = {
    val work = java.nio.file.Files.createTempDirectory("kgbench").toString
    val t0 = System.nanoTime()
    Pipeline.run(spark, PagesGen.pages(spark, nDocs),
      Pipeline.Config(work, nPartitions = nPartitions, resume = false, writeMetrics = false))
    val sec = (System.nanoTime() - t0) / 1e9
    val nTriples = spark.read.parquet(s"$work/triples").count()
    (sec, nDocs / sec, nTriples / sec, nTriples)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val kgDocs = sys.env.getOrElse("SPARK_GRAFT_KG_DOCS", "5000").toLong
    val spark = newSession(cpus)

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    val (kgSec, docsPerSec, triplesPerSec, nTriples) = kgBuild(spark, kgDocs, cpus * 2)

    val qs = (results :+ ("kg_build" -> kgSec))
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum + kgSec
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""kg_docs":$kgDocs,"kg_triples":$nTriples,"kg_docs_per_sec":$docsPerSec,""" +
        s""""kg_triples_per_sec":$triplesPerSec,"cpus":$cpus,"sf":"$sfDir"}""")
    spark.stop()
  }
}
