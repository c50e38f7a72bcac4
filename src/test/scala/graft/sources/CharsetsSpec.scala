package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.kg.TestSpark

/** Charset detection precedence (BOM > meta > utf-8 default) and
  * never-throw decode semantics; cross-engine values are pinned by the
  * `src_charset_decode` oracle. */
class CharsetsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("BOM is authoritative and beats a contradicting meta tag") {
    val html = "<html><head><meta charset=\"utf-8\"></head><body>héllo</body></html>"
    val b = Array[Byte](0xff.toByte, 0xfe.toByte) ++ html.getBytes("UTF-16LE")
    assert(Charsets.sniff(b) == "utf-16le")
    assert(Charsets.decode(b, "utf-16le") == html, "BOM stripped before decode")
    val be = Array[Byte](0xfe.toByte, 0xff.toByte) ++ html.getBytes("UTF-16BE")
    assert(Charsets.sniff(be) == "utf-16be")
    val bom8 = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ html.getBytes("UTF-8")
    assert(Charsets.sniff(bom8) == "utf-8")
    assert(Charsets.decode(bom8, "utf-8") == html)
  }

  test("meta scan is case-insensitive, quote-optional, and latin-1 decodes non-ASCII") {
    val h1 = "<HTML><META CHARSET=ISO-8859-1><body>café</body>".getBytes("ISO-8859-1")
    assert(Charsets.sniff(h1) == "iso-8859-1")
    assert(Charsets.decode(h1, "iso-8859-1").contains("café"))
    assert(Charsets.sniff("<p>plain ascii no meta</p>".getBytes("UTF-8")) == "utf-8")
  }

  test("unknown declared charset falls back to utf-8; decode never throws") {
    val b = "<meta charset=\"klingon\"><body>ok</body>".getBytes("UTF-8")
    assert(Charsets.sniff(b) == "klingon")
    assert(Charsets.decode(b, Charsets.sniff(b)).contains("ok"), "fallback utf-8")
    // invalid utf-8 bytes decode with replacement, not an exception
    val bad = Array[Byte](0x61, 0xc3.toByte, 0x28, 0x62)
    assert(Charsets.decode(bad, "utf-8").length == 4)
    assert(Charsets.decode(null, "utf-8") == null)
  }

  test("decodePages sniffs and decodes per row in one narrow pass") {
    val rows = Seq(
      (1L, "<meta charset=\"iso-8859-1\">café".getBytes("ISO-8859-1")),
      (2L, Array[Byte](0xff.toByte, 0xfe.toByte) ++ "wide".getBytes("UTF-16LE")),
      (3L, "plain".getBytes("UTF-8")),
      (4L, null: Array[Byte])) // a NULL cell degrades the row, never the job
      .toDF("doc_id", "raw")
    val out = Charsets.decodePages(rows, "doc_id", "raw")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1L)._1 == "iso-8859-1" && out(1L)._2.endsWith("café"))
    assert(out(2L) == (("utf-16le", "wide")))
    assert(out(3L) == (("utf-8", "plain")))
    assert(out(4L) == (("utf-8", null)))
  }
}
