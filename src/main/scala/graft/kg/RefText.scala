package graft.kg

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

/** One cleaned-text chunk with reference-faithful (buggy/approximate)
  * offsets — see /root/reference/src/text_processor.py:19-33,152-235. */
final case class ChunkOut(content: String, startOffset: Long, endOffset: Long, section: Option[String])

/** Pure-Scala re-expression of the reference TextProcessor
  * (/root/reference/src/text_processor.py). Deterministic, no Spark
  * dependency; byte-identity is pinned by goldens generated from the
  * reference (src/test/resources/goldens.json).
  */
object RefText {
  final val ChunkSize = 1500 // /root/reference/src/config.py:24

  /** Frozen common-word set of the TextProcessor reversed-text detector
    * (/root/reference/src/text_processor.py:83-95). */
  private val CommonWords: Set[String] = Set(
    "the", "and", "for", "are", "but", "not", "you", "all", "can",
    "had", "her", "was", "one", "our", "out", "has", "his", "how",
    "its", "may", "new", "now", "old", "see", "way", "who", "did",
    "get", "let", "say", "she", "too", "use", "with", "this", "that",
    "have", "from", "they", "been", "said", "each", "which", "their",
    "will", "other", "about", "many", "then", "them", "these", "some",
    "would", "make", "like", "into", "time", "very", "when", "come",
    "could", "more", "than", "first", "also", "made", "after", "model",
    "data", "input", "output", "method", "result", "paper", "based",
    "using", "used", "show", "work", "system", "learning", "network",
    "training", "performance", "attention", "layer", "function")

  /** Reversed-text repair, TextProcessor variant: thresholds ≥20 words,
    * sample 100, reversed > 2×normal and > 5
    * (/root/reference/src/text_processor.py:74-114). When triggered the
    * rejoin uses single spaces, destroying original whitespace — that is
    * part of the contract. */
  def fixReversedText(text: String): String =
    fixReversedGeneric(text, CommonWords, minWords = 20, sampleN = 100, minHits = 5)

  /** Shared reversed-text detector. Semantics identical to the reference
    * loops (word list = Python `str.split()`, sample = first
    * min(sampleN, len), trigger = rev > 2·normal && rev > minHits), but
    * allocation-light: words are scanned in place and the full
    * split+reverse+join only happens on trigger (rare) — the hot path
    * allocates only the ≤sampleN sampled tokens. */
  private[kg] def fixReversedGeneric(text: String, common: Set[String],
      minWords: Int, sampleN: Int, minHits: Int): String = {
    var i = 0
    val n = text.length
    var count = 0
    var normal = 0
    var rev = 0
    while (i < n && count < sampleN) {
      // skip whitespace (Python str.split semantics)
      while (i < n && Py.isPyWs(text.codePointAt(i))) i += Character.charCount(text.codePointAt(i))
      if (i < n) {
        val start = i
        while (i < n && !Py.isPyWs(text.codePointAt(i))) i += Character.charCount(text.codePointAt(i))
        val w = text.substring(start, i)
        if (common.contains(Py.lower(w))) normal += 1
        if (common.contains(Py.lower(Py.reversed(w)))) rev += 1
        count += 1
      }
    }
    if (count < sampleN) {
      // fewer than sampleN words total: the sample was everything; the
      // minWords gate needs the true total (== count here)
      if (count < minWords) return text
    } else {
      // sample full; still need to know the total reaches minWords
      if (sampleN < minWords) {
        var extra = count
        while (i < n && extra < minWords) {
          while (i < n && Py.isPyWs(text.codePointAt(i))) i += Character.charCount(text.codePointAt(i))
          if (i < n) {
            while (i < n && !Py.isPyWs(text.codePointAt(i))) i += Character.charCount(text.codePointAt(i))
            extra += 1
          }
        }
        if (extra < minWords) return text
      }
    }
    if (rev > normal * 2 && rev > minHits) Py.split(text).map(Py.reversed).mkString(" ")
    else text
  }

  /** The cleaning patterns (/root/reference/src/config.py:39-50) are
    * applied in declaration order to LOWERCASED text; six of the ten
    * require an uppercase ASCII letter (`Figure`, `Table`, `^Source:`,
    * `See Figure`, `Eq\.`, `(Table|Fig)\.`) which `str.lower()` can never
    * leave in place, so their substitutions are provably identity
    * (SURVEY §2.3, verified against the executed reference by the golden
    * and 250-doc fuzz suites). Only the four live patterns are applied —
    * same bytes out, 6 fewer full-text regex scans per document. */
  private val cleaningPatterns: Array[Pattern] = Array(
    Py.pat("\\b[\\w.-]+?@\\w+?\\.\\w+?\\b", Py.MULTI), // emails
    Py.pat("\\[[^\\]]*\\]", Py.MULTI),                 // square brackets
    Py.pat("[^\\x00-\\x7F]+", Py.MULTI),               // non-ASCII
    Py.pat("<[^>]+>", Py.MULTI))                       // HTML tags

  /** Byte-identity kernel — the reference `clean_text`
    * (/root/reference/src/text_processor.py:116-150): reversed-text fix →
    * lowercase → ordered pattern substitution → whitespace collapse →
    * strip. */
  def cleanText(text: String): String = {
    if (text == null || text.isEmpty) return ""
    var t = fixReversedText(text)
    t = Py.lower(t)
    var i = 0
    while (i < cleaningPatterns.length) {
      t = cleaningPatterns(i).matcher(t).replaceAll("")
      i += 1
    }
    Py.strip(Py.collapseWs(t))
  }

  // Academic headers (/root/reference/src/config.py:28-36,103-113).
  private val headerAlt = "Abstract|Introduction|Methods|Methodology|Results|Discussion|Conclusion"
  private val headerPattern: Pattern =
    Py.pat(s"\\n${Py.WS_CLASS}*($headerAlt)${Py.WS_CLASS}*\\n", Py.CASE_I)
  private val sectionPattern: Pattern = Py.pat(s"^($headerAlt)$$", Py.CASE_I)

  /** Python `re.split` with one capture group keeps the captured header
    * as its own element; Java lacks this, so re-implemented on Matcher. */
  private def splitKeepingHeaders(text: String): ArrayBuffer[String] = {
    val out = ArrayBuffer.empty[String]
    val m = headerPattern.matcher(text)
    var last = 0
    while (m.find()) {
      out += text.substring(last, m.start())
      out += m.group(1)
      last = m.end()
    }
    out += text.substring(last)
    out
  }

  /** Python `pattern.match(s)` for `^(...)$` — anchored at start; `$`
    * matches at end or before a single trailing `\n` (Py.pat compiles
    * with UNIX_LINES, so a trailing `\r` is NOT a header terminator —
    * CPython parity). */
  private def sectionMatches(s: String): Boolean = {
    val m = sectionPattern.matcher(s)
    m.lookingAt()
  }

  /** Reference `create_chunks`
    * (/root/reference/src/text_processor.py:152-235): header-aware greedy
    * word packing to 1500 chars. Offset bookkeeping is intentionally
    * replicated bug-for-bug (offsets only advance on headers). Lengths in
    * code points, like Python `len`. */
  def createChunks(text: String, chunkSize: Int = ChunkSize): Vector[ChunkOut] = {
    if (text == null || text.isEmpty) return Vector.empty
    val sections = splitKeepingHeaders(text)
    val chunks = Vector.newBuilder[ChunkOut]
    var cur = ArrayBuffer.empty[String]
    var curLen = 0
    var offset = 0L
    var section: Option[String] = None

    def flush(): Unit = {
      if (cur.nonEmpty) {
        val content = Py.strip(cur.mkString(" "))
        chunks += ChunkOut(content, offset, offset + Py.len(content), section)
      }
    }

    for (seg <- sections) {
      if (sectionMatches(seg)) {
        flush()
        cur = ArrayBuffer.empty[String]
        curLen = 0
        section = Some(Py.capitalize(seg))
        cur += seg
        offset += Py.len(seg) + 1
      } else {
        for (word <- Py.split(seg)) {
          val wordLen = Py.len(word) + 1
          if (curLen + wordLen > chunkSize) {
            flush()
            cur = ArrayBuffer(word)
            curLen = wordLen
          } else {
            cur += word
            curLen += wordLen
          }
        }
      }
    }
    flush()
    chunks.result()
  }

  /** Reference `process` (/root/reference/src/text_processor.py:237-251):
    * clean then chunk. On cleaned (newline-free) text headers never fire,
    * so output is plain 1500-char word packing with section=None — a
    * pinned reference quirk (SURVEY §2.4). */
  def process(text: String): Vector[String] = createChunks(cleanText(text)).map(_.content)

  /** Reference `get_stats` (/root/reference/src/text_processor.py:253-277). */
  def stats(text: String): (Int, Int, Double, Int, Int, Double) = {
    val cleaned = cleanText(text)
    val chunks = createChunks(cleaned)
    val origLen = Py.len(text)
    val cleanLen = Py.len(cleaned)
    val reduction =
      if (text.nonEmpty) math.rint((1.0 - cleanLen.toDouble / origLen) * 100 * 100) / 100 else 0.0
    val avgChunk =
      if (chunks.nonEmpty) math.rint(chunks.map(c => Py.len(c.content)).sum.toDouble / chunks.size * 100) / 100
      else 0.0
    (origLen, cleanLen, reduction, Py.split(cleaned).length, chunks.size, avgChunk)
  }
}
