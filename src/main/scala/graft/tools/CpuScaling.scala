package graft.tools
import org.apache.spark.sql.SparkSession
import graft.kg.{PagesGen, Pipeline}

/** Isolate pure-CPU scaling (no parquet writes): triple extraction only. */
object CpuScaling {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 50000L
    for (cpus <- Seq(8, 32)) {
      val spark = graft.Bench.newSession(cpus)
      import spark.implicits._
      // warmup
      Pipeline.triplesFromPages(spark, PagesGen.pages(spark, 2000L)).count()
      val t0 = System.nanoTime()
      val n = Pipeline.triplesFromPages(spark, PagesGen.pages(spark, nDocs)).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"CPUSCALE cpus=$cpus sec=$sec%.2f docs_per_sec=${nDocs / sec}%.0f triples=$n")
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }
  }
}
