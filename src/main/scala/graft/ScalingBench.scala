package graft

import org.apache.spark.sql.SparkSession

/** Two-cluster-size scaling evidence (BASELINE.json: throughput scaling
  * efficiency ≥0.8 from N→4N executors; sandbox protocol = same job, same
  * input at local[N] vs local[4N] — BASELINE.md). Writes BENCH/BASELINE.md.
  *
  * Usage: runMain graft.ScalingBench [nDocs] [nSmall] [nLarge]
  */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 20000L
    val nSmall = if (args.length > 1) args(1).toInt else 8
    val nLarge = if (args.length > 2) args(2).toInt else 32

    def runAt(cpus: Int): (Double, Double, Double, Long) = {
      val spark = Bench.newSession(cpus)
      try {
        // warm the JVM/JIT once with a small build, then measure
        Bench.kgBuild(spark, 500L, cpus * 2)
        Bench.kgBuild(spark, nDocs, cpus * 2)
      } finally {
        spark.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    }

    val (secS, docsS, triplesS, nTriples) = runAt(nSmall)
    val (secL, docsL, triplesL, _) = runAt(nLarge)
    val ratio = nLarge.toDouble / nSmall
    val eff = (secS / secL) / ratio

    val md =
      s"""# BENCH/BASELINE — KG-build scaling evidence
         |
         |Protocol (BASELINE.md): identical KG-build job, identical synthetic
         |input ($nDocs docs, seed-fixed PagesGen corpus), run at local[$nSmall]
         |and local[$nLarge]; efficiency = (T_$nSmall / T_$nLarge) / ${ratio.toInt}.
         |
         || parallelism | wall (s) | docs/sec | triples/sec |
         ||---|---|---|---|
         || local[$nSmall] | ${f"$secS%.2f"} | ${f"$docsS%.1f"} | ${f"$triplesS%.1f"} |
         || local[$nLarge] | ${f"$secL%.2f"} | ${f"$docsL%.1f"} | ${f"$triplesL%.1f"} |
         |
         |triples per build: $nTriples
         |scaling efficiency (target ≥ 0.8): **${f"$eff%.3f"}**
         |""".stripMargin

    val out = java.nio.file.Paths.get("BENCH")
    java.nio.file.Files.createDirectories(out)
    java.nio.file.Files.writeString(out.resolve("BASELINE.md"), md)
    println(md)
    println(s"""{"metric":"scaling_efficiency","value":$eff,"unit":"ratio","docs":$nDocs,"small":$nSmall,"large":$nLarge}""")
  }
}
