package graft

/** Two-cluster-size scaling evidence (BASELINE.json: throughput scaling
  * efficiency ≥0.8 from N→4N; sandbox protocol = same job, same input at
  * local[N] vs local[4N] — BASELINE.md).
  *
  * Each measurement runs in its OWN JVM (tools/run_scaling.sh): repeated
  * SparkSessions in one JVM degrade progressively (GC/metaspace/listener
  * state), which poisons the comparison.
  *
  * Usage: runMain graft.ScalingBench <cpus> <nDocs>   → one JSON line.
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val nDocs = args(1).toLong
    val spark = Bench.newSession(cpus)
    Bench.kgBuild(spark, math.min(2000L, nDocs), cpus * 2) // JIT warm-up
    val (sec, docsPerSec, triplesPerSec, nTriples) = Bench.kgBuild(spark, nDocs, cpus * 2)
    println(s"""SCALE_RESULT {"cpus":$cpus,"docs":$nDocs,"sec":$sec,""" +
      s""""docs_per_sec":$docsPerSec,"triples_per_sec":$triplesPerSec,"triples":$nTriples}""")
    spark.stop()
  }
}
