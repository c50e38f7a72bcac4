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
  /** Hardware-capacity probe: a no-allocation char-sum scan over the
    * corpus on `threads` raw JVM threads (no Spark). Its speedup between
    * the two levels is the machine's parallel ceiling — on this
    * virtualized sandbox the host does NOT deliver N× cycles for N
    * threads, and the job cannot be expected to beat the hardware. */
  def hwProbeDocsPerSec(threads: Int): Double = {
    val docs = (0L until 20000L).map(graft.kg.PagesGen.docText).toArray
    def scan(s: String): Long = {
      var sum = 0L; var r = 0
      while (r < 20) { var i = 0; while (i < s.length) { sum += s.charAt(i); i += 1 }; r += 1 }
      sum
    }
    docs.take(2000).foreach(scan) // JIT warm
    val idx = new java.util.concurrent.atomic.AtomicLong(0)
    val sink = new java.util.concurrent.atomic.AtomicLong(0)
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { _ =>
      val t = new Thread(() => {
        var i = idx.getAndIncrement()
        while (i < docs.length) { sink.addAndGet(scan(docs(i.toInt))); i = idx.getAndIncrement() }
      }); t.start(); t
    }
    ts.foreach(_.join())
    docs.length / ((System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val nDocs = args(1).toLong
    val hw = hwProbeDocsPerSec(cpus)
    val spark = Bench.newSession(cpus)
    Bench.kgBuild(spark, math.min(2000L, nDocs), cpus * 2) // JIT warm-up
    val (sec, docsPerSec, triplesPerSec, nTriples) = Bench.kgBuild(spark, nDocs, cpus * 2)
    println(s"""SCALE_RESULT {"cpus":$cpus,"docs":$nDocs,"sec":$sec,""" +
      s""""docs_per_sec":$docsPerSec,"triples_per_sec":$triplesPerSec,"triples":$nTriples,""" +
      s""""hw_scan_per_sec":$hw}""")
    spark.stop()
  }
}
