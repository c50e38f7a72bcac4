package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.kg.{PagesGen, Pipeline, Py, RefText, Schema}

/** ALL the hardware/scaling probes behind BENCH/BASELINE.md's
  * normalization methodology, folded into one parameterized main
  * (formerly six single-purpose objects). Each mode isolates one layer
  * of the N→4N scaling stack so a weak aggregate number can be
  * attributed — JVM thread ceiling vs Spark machinery vs parquet IO vs
  * GC:
  *
  *   threads [nDocs]   raw-thread cleanText (no Spark): the no-Spark
  *                     hardware ceiling the normalized efficiency
  *                     divides by
  *   parts             per-regex-pass thread scaling (which kernel
  *                     stops scaling first)
  *   pure              no-allocation scan vs allocation-heavy loops:
  *                     separates memory-bandwidth/GC ceilings from
  *                     regex cost
  *   cpu [nDocs]       Spark triple-extraction only, 8 vs 32 cores,
  *                     no writes
  *   io <nDocs> <cpus> stagewise gen/write/read/clean timings (tmpfs)
  *   stages <nDocs> <cpus>  full Pipeline.run wall + task/GC/CPU
  *                     listener totals
  *
  * Run: `sbt "runMain graft.tools.ScalingProbe <mode> [args]"`. */
object ScalingProbe {

  private def onThreads(threads: Int, n: Int)(work: Int => Unit): Double = {
    val idx = new AtomicLong(0)
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { _ =>
      val t = new Thread(() => {
        var i = idx.getAndIncrement()
        while (i < n) { work(i.toInt); i = idx.getAndIncrement() }
      })
      t.start(); t
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  private def threadsMode(nDocs: Int): Unit = {
    val docs = (0L until nDocs.toLong).map(PagesGen.docText).toArray
    docs.take(2000).foreach(RefText.cleanText) // warm
    for (threads <- Seq(1, 8, 32)) {
      val sec = onThreads(threads, docs.length)(i => RefText.cleanText(docs(i)))
      println(f"THREADS $threads%2d  $sec%6.2f s  ${nDocs / sec}%8.0f docs/s")
    }
  }

  private def partsMode(): Unit = {
    val email = Py.pat("\\b[\\w.-]+?@\\w+?\\.\\w+?\\b", Py.MULTI)
    val brackets = Py.pat("\\[[^\\]]*\\]", Py.MULTI)
    val nonascii = Py.pat("[^\\x00-\\x7F]+", Py.MULTI)
    val html = Py.pat("<[^>]+>", Py.MULTI)
    val docs = (0L until 30000L).map(PagesGen.docText).toArray
    val lowered = docs.map(Py.lower)
    def bench(name: String, in: Array[String], f: String => Any): Unit = {
      in.take(1000).foreach(f)
      for (threads <- Seq(8, 32)) {
        val sec = onThreads(threads, in.length)(i => f(in(i)))
        println(f"PART $name%-12s t=$threads%2d ${in.length / sec}%9.0f docs/s")
      }
    }
    bench("lower", docs, Py.lower)
    bench("fixRev", docs, RefText.fixReversedText)
    bench("email", lowered, s => email.matcher(s).replaceAll(""))
    bench("brackets", lowered, s => brackets.matcher(s).replaceAll(""))
    bench("nonascii", lowered, s => nonascii.matcher(s).replaceAll(""))
    bench("html", lowered, s => html.matcher(s).replaceAll(""))
    bench("collapse", lowered, Py.collapseWs)
    bench("strip", lowered, Py.strip)
  }

  private def pureMode(): Unit = {
    val docs = (0L until 30000L).map(PagesGen.docText).toArray
    // no-allocation workload: checksum scan repeated 20x per doc
    def scan(s: String): Long = {
      var sum = 0L; var r = 0
      while (r < 20) { var i = 0; while (i < s.length) { sum += s.charAt(i); i += 1 }; r += 1 }
      sum
    }
    // allocation-heavy workload: build 10 copies via new String concat
    def alloc(s: String): Int = {
      var n = 0; var r = 0
      while (r < 10) { n += (s + r).substring(r).length; r += 1 }
      n
    }
    for ((name, f) <- Seq[(String, String => Any)]("scan" -> scan, "alloc" -> alloc)) {
      f(docs(0))
      for (threads <- Seq(1, 8, 32)) {
        val sec = onThreads(threads, docs.length)(i => f(docs(i)))
        println(f"PURE $name%-6s t=$threads%2d ${docs.length / sec}%9.0f docs/s")
      }
    }
  }

  private def cpuMode(nDocs: Long): Unit =
    for (cpus <- Seq(8, 32)) {
      val spark = graft.Bench.newSession(cpus)
      // warmup
      Pipeline.triplesFromPages(spark, PagesGen.pages(spark, 2000L)).count()
      val t0 = System.nanoTime()
      val n = Pipeline.triplesFromPages(spark, PagesGen.pages(spark, nDocs)).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"CPUSCALE cpus=$cpus sec=$sec%.2f docs_per_sec=${nDocs / sec}%.0f triples=$n")
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }

  private def ioMode(nDocs: Long, cpus: Int): Unit = {
    val spark = graft.Bench.newSession(cpus)
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "io").toString
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"IO cpus=$cpus $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("gen_count")(PagesGen.pages(spark, nDocs).count()) // pure compute
    t("gen_write")(PagesGen.pages(spark, nDocs).repartition(192).write.parquet(s"$work/p"))
    val pages = spark.read.parquet(s"$work/p")
    t("read_count")(pages.count()) // scan only
    t("read_full")(pages.as[Schema.Page]
      .map(p => p.url.length + (if (p.text == null) 0 else p.text.length)).reduce(_ + _))
    t("clean_compute")(Pipeline.extractClean(spark, pages.as[Schema.Page], cpus * 2)
      .map(_.clean_text.length.toLong).reduce(_ + _))
    t("clean_write")(Pipeline.extractClean(spark, pages.as[Schema.Page], cpus * 2)
      .toDF().drop("raw_text").write.parquet(s"$work/c"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    spark.stop()
  }

  private def stagesMode(nDocs: Long, cpus: Int): Unit = {
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

  private def kgBuildMode(nDocs: Long, reps: Int): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.Bench.newSession(cpus)
    graft.Bench.kgBuild(spark, 2000L, cpus * 2) // untimed JIT warm-up
    val walls = (1 to reps).map { r =>
      val (sec, dps, _, _) = graft.Bench.kgBuild(spark, nDocs, cpus * 2)
      println(f"KGBUILD rep=$r wall=$sec%.2f s docs_per_sec=$dps%.0f")
      sec
    }
    val s = walls.sorted
    println(f"KGBUILD median=${s((reps - 1) / 2)}%.2f s over $reps reps (cpus=$cpus)")
    spark.stop()
  }

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("threads") => threadsMode(args.lift(1).map(_.toInt).getOrElse(20000))
    case Some("kgbuild") => kgBuildMode(
      args.lift(1).map(_.toLong).getOrElse(20000L),
      args.lift(2).map(_.toInt).getOrElse(5))
    case Some("parts") => partsMode()
    case Some("pure") => pureMode()
    case Some("cpu") => cpuMode(args.lift(1).map(_.toLong).getOrElse(50000L))
    case Some("io") => ioMode(args(1).toLong, args(2).toInt)
    case Some("stages") => stagesMode(args(1).toLong, args(2).toInt)
    case other => sys.error(
      s"unknown mode $other — want threads|parts|pure|cpu|io|stages|kgbuild")
  }
}
