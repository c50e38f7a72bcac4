package graft.tools
import java.util.regex.Pattern
import graft.kg.{PagesGen, Py}

object ProfileEq {
  def main(args: Array[String]): Unit = {
    val n = 2000
    val docs = (0L until n.toLong).map(PagesGen.docText).toArray
    val ws = (re: String) => re.replace("\\s", Py.WS_CLASS)
    val pats = Seq(
      "p1" -> Py.pat(ws("(?:Equation|Eq\\.?)\\s*\\(?(\\d+)\\)?\\s*[:.]?\\s*([^\\n]+)"), Py.MULTI | Py.CASE_I),
      "p2" -> Py.pat(ws("(\\([0-9]+\\))\\s*$.*?([A-Za-z].*?=.*?)(?:\\n|$)"), Py.MULTI | Py.CASE_I),
      "p3" -> Py.pat(ws("([A-Z][a-z]*\\([^)]+\\))\\s*=\\s*([^,.\\n]+)"), Py.MULTI | Py.CASE_I),
      "p4" -> Py.pat(ws("((?:Attention|Loss|Softmax|ReLU|BLEU)\\s*\\([^)]*\\))\\s*=\\s*([^\\n]+)"), Py.MULTI | Py.CASE_I),
      "m1" -> Py.pat(ws("[A-Za-z]+\\s*=\\s*(?:softmax|sigmoid|tanh|exp|log|sum|max|min)\\s*\\([^)]+\\)")),
      "m2" -> Py.pat(ws("[A-Za-z]+\\s*=\\s*\\d+\\s*[×*/+-]\\s*[A-Za-z0-9]+")),
      "m3" -> Py.pat("∑|∏|∫|√|∂|∇|α|β|γ|θ|λ|σ|μ"))
    for ((name, p) <- pats) {
      docs.take(100).foreach { d => val m = p.matcher(d); while (m.find()) {} }
      val t0 = System.nanoTime()
      docs.foreach { d => val m = p.matcher(d); while (m.find()) {} }
      println(f"$name ${(System.nanoTime()-t0)/1e6/n}%8.4f ms/doc")
    }
  }
}
