package graft.sources

import java.nio.charset.Charset

import scala.util.control.NonFatal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Charset detection + transcode for raw crawled page bytes — real web
  * corpora are NOT uniformly UTF-8 (legacy latin-1 and BOM'd UTF-16
  * pages survive in every crawl), and every downstream text operator in
  * this engine assumes decoded strings, so ingest must normalize
  * encodings once, up front.
  *
  * Detection precedence mirrors what browsers do: BOM first (a byte
  * order mark is authoritative — it beats a contradicting meta tag),
  * then an ASCII-superset scan of the head for `<meta charset=...>`,
  * then the UTF-8 default. Decode never throws: unmappable bytes decode
  * with replacement (java.lang.String semantics) and an unknown
  * declared charset falls back to UTF-8 — a page is degraded, never a
  * job failure.
  *
  * Scale shape: pure per-row byte work in one narrow mapPartitions —
  * zero shuffles, composes ahead of clean_text in the ingest stage. */
object Charsets {

  private val MetaRe =
    """(?i)<meta[^>]*charset\s*=\s*["']?([A-Za-z0-9_\-]+)""".r

  /** Detected charset name (canonical lowercase): BOM, else meta tag in
    * the first `scanBytes` bytes, else "utf-8". */
  def sniff(bytes: Array[Byte], scanBytes: Int = 4096): String = {
    if (bytes == null) return "utf-8" // null cell: degrade, never NPE the task
    val n = bytes.length
    def at(i: Int): Int = if (i < n) bytes(i) & 0xff else -1
    if (at(0) == 0xef && at(1) == 0xbb && at(2) == 0xbf) "utf-8"
    else if (at(0) == 0xff && at(1) == 0xfe) "utf-16le"
    else if (at(0) == 0xfe && at(1) == 0xff) "utf-16be"
    else {
      // latin-1 never fails to decode, so the head scan sees every
      // ASCII-compatible byte stream's markup unchanged
      val head = new String(bytes, 0, math.min(n, scanBytes), "ISO-8859-1")
      MetaRe.findFirstMatchIn(head).map(_.group(1).toLowerCase)
        .getOrElse("utf-8")
    }
  }

  /** BOM length for a detected charset, to strip before decode. */
  private def bomLen(bytes: Array[Byte]): Int = {
    def at(i: Int): Int = if (i < bytes.length) bytes(i) & 0xff else -1
    if (at(0) == 0xef && at(1) == 0xbb && at(2) == 0xbf) 3
    else if ((at(0) == 0xff && at(1) == 0xfe) || (at(0) == 0xfe && at(1) == 0xff)) 2
    else 0
  }

  /** Decode with the detected (or given) charset; unknown names fall
    * back to UTF-8, unmappable bytes decode with replacement. */
  def decode(bytes: Array[Byte], charset: String): String = {
    if (bytes == null) return null
    val cs =
      try Charset.forName(charset)
      catch { case NonFatal(_) => Charset.forName("UTF-8") }
    new String(bytes, bomLen(bytes), bytes.length - bomLen(bytes), cs)
  }

  /** (id, raw bytes) → (id, charset, text): sniff + strip BOM + decode
    * per row. One narrow pass, no shuffle. */
  def decodePages(df: DataFrame, id: String, bytesCol: String): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col(id).cast("long").as("id"), col(bytesCol).cast("binary").as("b"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (i, b) =>
        val cs = sniff(b)
        (i, cs, decode(b, cs))
      })
      .toDF("id", "charset", "text")
  }
}
