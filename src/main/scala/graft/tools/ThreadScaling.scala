package graft.tools
import graft.kg.{PagesGen, RefText}
import java.util.concurrent.atomic.AtomicLong

/** Raw-thread scaling of cleanText (no Spark) — isolates JVM-level
  * contention from Spark machinery. */
object ThreadScaling {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(20000)
    val docs = (0L until nDocs.toLong).map(PagesGen.docText).toArray
    docs.take(2000).foreach(RefText.cleanText) // warm
    for (threads <- Seq(1, 8, 32)) {
      val idx = new AtomicLong(0)
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { _ =>
        val t = new Thread(() => {
          var i = idx.getAndIncrement()
          while (i < docs.length) {
            RefText.cleanText(docs(i.toInt))
            i = idx.getAndIncrement()
          }
        })
        t.start(); t
      }
      ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"THREADS $threads%2d  $sec%6.2f s  ${nDocs / sec}%8.0f docs/s")
    }
  }
}
