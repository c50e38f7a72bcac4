package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY §5.2): chunk-size bound, concat invariant,
  * kernel idempotence/determinism over adversarial generated text.
  * (scalatestplus isn't in the offline cache, so properties sample the
  * ScalaCheck generator directly with a fixed seed — 200 cases each.) */
class PropertySpec extends AnyFunSuite {

  private def forAll(gen: Gen[String])(body: String => Unit): Unit = {
    var seed = Seed(20260816L)
    for (_ <- 0 until 200) {
      gen.apply(Gen.Parameters.default, seed).foreach(body)
      seed = seed.next
    }
  }

  private val wordGen: Gen[String] = Gen.oneOf(
    Gen.alphaLowerStr.map(_.take(12)).suchThat(_.nonEmpty),
    Gen.oneOf("the", "and", "Figure", "Table", "naïve", "你好", "CNN",
      "self-attention", "a@b.c", "[12]", "<b>x</b>", "Eq.", "α=β",
      "Loss(x)", "=", "softmax(a)", "İ", "😀", "Abstract", "x1"))

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 300)
    words <- Gen.listOfN(n, wordGen)
    sep <- Gen.listOfN(math.max(0, n - 1), Gen.oneOf(" ", " ", " ", "\n", "\t", "  ", ". "))
  } yield words.zipAll(sep, "", "").flatMap { case (w, s) => Seq(w, s) }.mkString

  test("chunks never exceed chunk_size + one word (+1)") {
    forAll(textGen) { text =>
      val cleaned = RefText.cleanText(text)
      val chunks = RefText.createChunks(cleaned)
      val longestWord = Py.split(cleaned).map(Py.len).maxOption.getOrElse(0)
      chunks.foreach { c =>
        assert(Py.len(c.content) <= RefText.ChunkSize + longestWord + 1,
          s"chunk len ${Py.len(c.content)}")
      }
    }
  }

  test("chunk concat == cleaned text modulo collapsed whitespace") {
    forAll(textGen) { text =>
      val cleaned = RefText.cleanText(text)
      val joined = Py.split(RefText.createChunks(cleaned).map(_.content).mkString(" "))
      assert(joined.toSeq == Py.split(cleaned).toSeq)
    }
  }

  test("cleanText is deterministic and produces ASCII single-spaced text") {
    forAll(textGen) { text =>
      val a = RefText.cleanText(text)
      assert(a == RefText.cleanText(text))
      assert(!a.exists(_ > 0x7f), s"non-ASCII survived: ${a.filter(_ > 0x7f)}")
      assert(!a.contains("  ") && !a.contains("\n"))
      assert(a == Py.strip(a))
    }
  }

  test("extractors are pure: repeated runs give identical results") {
    forAll(textGen) { text =>
      assert(RefAnalyzers.extractKeywords(text) == RefAnalyzers.extractKeywords(text))
      assert(RefAnalyzers.extractTechnicalTerms(text).toString ==
        RefAnalyzers.extractTechnicalTerms(text).toString)
      assert(RefAnalyzers.extractEquations(text) == RefAnalyzers.extractEquations(text))
    }
  }

  test("triplesForDoc is total on arbitrary input (no throw, bounded preds)") {
    val preds = Set("hasTitle", "hasAuthor", "publishedIn", "hasDOI", "hasSection",
      "mentionsFigure", "mentionsEntity", "containsEquation", "hasKeyword", "hasSummary")
    forAll(textGen) { text =>
      val ts = Pipeline.triplesForDoc("u", text)
      assert(ts.forall(t => preds.contains(t.pred)))
    }
  }
}
