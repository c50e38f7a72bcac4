package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev profiling: sub-step walls of one streaming re-canonicalization
  * fold (the recanonicalize body, instrumented). Usage:
  *   runMain graft.tools.FoldProfile <sfDir> */
object FoldProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.Bench.newSession(cpus)
    import spark.implicits._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[foldprof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val work = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "foldprof").toString
    sys.addShutdownHook(
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work)))
    // land the same triples the streaming lane accumulates (batch
    // extraction; 32-file layout like 4 batches x 8 tasks)
    t("extract_and_land") {
      graft.kg.Pipeline.triplesFromPages(spark,
          graft.queries.KgQueries.kgPages(spark, sfDir))
        .toDF().repartition(32)
        .write.mode("overwrite").parquet(s"$work/triples_stream/batch=0")
    }
    val raw = spark.read.parquet(s"$work/triples_stream")
    val triples = raw.drop("batch").as[graft.kg.Schema.Triple]
    t("count_covered") { raw.count() }
    val resolved = t("resolve_build") { graft.kg.EntityLinking.resolve(spark, triples) }
    val linkedP = resolved.linked.toDF().persist(StorageLevel.MEMORY_AND_DISK)
    val aliasP = resolved.aliasEdges.persist(StorageLevel.MEMORY_AND_DISK)
    t("linked_materialize") { linkedP.count() }
    t("alias_materialize") { aliasP.count() }
    val graph = t("cc_edges_build") {
      graft.kg.Pipeline.ccEdges(linkedP, aliasP) }
    val cnt = t("cc_edges_count") { graph.count() }
    println(s"[foldprof] cc edge count = $cnt")
    val labels = t("cc_solve") {
      val l = graft.kg.ConnectedComponents.run(spark, graph,
        driverSolveThreshold = graft.kg.ConnectedComponents.driverEdgeBudget())
      l.count(); l
    }
    val canonical = t("canonicalize_build") {
      graft.kg.Pipeline.canonicalize(spark,
        linkedP.as[graft.kg.Schema.LinkedMention], aliasP, None) }
    t("labels_write") { canonical.labels.write.mode("overwrite").parquet(s"$work/cc_labels/v1") }
    t("nodes_write") { canonical.nodes.write.mode("overwrite").parquet(s"$work/nodes_stream") }
    t("edges_write") { canonical.edges.write.mode("overwrite").parquet(s"$work/edges_stream") }
    spark.stop()
  }
}
