package graft.tools
import graft.kg.{PagesGen, Py, RefText}
import java.util.concurrent.atomic.AtomicLong
import java.util.regex.Pattern

object ThreadScaling2 {
  val email = Py.pat("\\b[\\w.-]+?@\\w+?\\.\\w+?\\b", Py.MULTI)
  val brackets = Py.pat("\\[[^\\]]*\\]", Py.MULTI)
  val nonascii = Py.pat("[^\\x00-\\x7F]+", Py.MULTI)
  val html = Py.pat("<[^>]+>", Py.MULTI)

  def bench(name: String, docs: Array[String], f: String => Any): Unit = {
    docs.take(1000).foreach(f)
    for (threads <- Seq(8, 32)) {
      val idx = new AtomicLong(0)
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { _ =>
        val t = new Thread(() => {
          var i = idx.getAndIncrement()
          while (i < docs.length) { f(docs(i.toInt)); i = idx.getAndIncrement() }
        })
        t.start(); t
      }
      ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PART $name%-12s t=$threads%2d ${docs.length / sec}%9.0f docs/s")
    }
  }

  def main(args: Array[String]): Unit = {
    val docs = (0L until 30000L).map(PagesGen.docText).toArray
    val lowered = docs.map(Py.lower)
    bench("lower", docs, Py.lower)
    bench("fixRev", docs, RefText.fixReversedText)
    bench("email", lowered, s => email.matcher(s).replaceAll(""))
    bench("brackets", lowered, s => brackets.matcher(s).replaceAll(""))
    bench("nonascii", lowered, s => nonascii.matcher(s).replaceAll(""))
    bench("html", lowered, s => html.matcher(s).replaceAll(""))
    bench("collapse", lowered, Py.collapseWs)
    bench("strip", lowered, Py.strip)
  }
}
