package graft.tools
import graft.kg.PagesGen
import java.util.concurrent.atomic.AtomicLong

object ThreadScaling3 {
  def main(args: Array[String]): Unit = {
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
        val idx = new AtomicLong(0)
        val t0 = System.nanoTime()
        val ts = (0 until threads).map { _ =>
          val t = new Thread(() => {
            var i = idx.getAndIncrement()
            while (i < docs.length) { f(docs(i.toInt)); i = idx.getAndIncrement() }
          }); t.start(); t
        }
        ts.foreach(_.join())
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"PURE $name%-6s t=$threads%2d ${docs.length / sec}%9.0f docs/s")
      }
    }
  }
}
