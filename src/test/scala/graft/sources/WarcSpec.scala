package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.kg.TestSpark

/** WARC framing semantics: Content-Length framing (payloads may contain
  * the magic), corrupt-record resync, truncation tolerance, and the
  * Spark write→read round-trip. Exact cross-engine values are pinned by
  * the `src_warc_roundtrip` oracle. */
class WarcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rec(u: String, d: String, p: String): Array[Byte] =
    Warc.record(u, d, p.getBytes("UTF-8"))

  test("plain and gzipped files parse to the same records") {
    val recs = Seq(
      rec("https://a/1", "2024-01-01T00:00:00Z", "hello"),
      rec("https://a/2", "2024-01-02T00:00:00Z", "wörld é"))
    val plain = recs.flatten.toArray
    val gz = Warc.gzFile(recs.iterator)
    for (f <- Seq(plain, gz)) {
      val out = Warc.parseRecords(f).toList
      assert(out.map(_.url) == List("https://a/1", "https://a/2"))
      assert(new String(out(1).payload, "UTF-8") == "wörld é")
      assert(out(0).warc_date == "2024-01-01T00:00:00Z")
    }
  }

  test("Content-Length framing survives WARC magic and CRLFCRLF inside a payload") {
    val evil = "prefix\r\n\r\nWARC/1.0\r\nContent-Length: 99\r\n\r\nsuffix"
    val f = (rec("https://a/evil", "2024-01-01T00:00:00Z", evil) ++
      rec("https://a/after", "2024-01-01T00:00:00Z", "ok")).toArray
    val out = Warc.parseRecords(f).toList
    assert(out.map(_.url) == List("https://a/evil", "https://a/after"))
    assert(new String(out.head.payload, "UTF-8") == evil)
  }

  test("corrupt record resyncs; truncated tail drops without throwing") {
    val corrupt = "WARC/1.0\r\nWARC-Target-URI: https://a/bad\r\nContent-Length: banana\r\n\r\njunk"
      .getBytes("UTF-8")
    val f1 = (corrupt ++ rec("https://a/good", "2024-01-01T00:00:00Z", "kept")).toArray
    assert(Warc.parseRecords(f1).toList.map(_.url) == List("https://a/good"))

    val full = rec("https://a/1", "2024-01-01T00:00:00Z", "payload-that-gets-cut")
    val f2 = (rec("https://a/0", "2024-01-01T00:00:00Z", "whole") ++
      full.dropRight(12)).toArray
    assert(Warc.parseRecords(f2).toList.map(_.url) == List("https://a/0"))
    assert(Warc.parseRecords("not a warc at all".getBytes("UTF-8")).isEmpty)
    assert(Warc.parseRecords(Array[Byte](0x1f.toByte, 0x8b.toByte, 3, 4)).isEmpty,
      "garbage gzip header is isolated, not thrown")
  }

  test("record spans are byte-exact and a sliced span re-parses standalone") {
    val r1 = rec("https://a/1", "2024-01-01T00:00:00Z", "hello")
    val r2 = rec("https://a/2", "2024-01-01T00:00:00Z", "second payload")
    val f = Warc.gzFile(Iterator(r1, r2))
    val spans = Warc.parseRecordsWithSpans(f).toList
    assert(spans.map(t => (t._2, t._3)) ==
      List((0L, r1.length.toLong), (r1.length.toLong, r2.length.toLong)))
    // the arithmetic the CDX oracle reconstructs offsets with:
    // 87 fixed framing chars + 20-char date + url + length digits + payload
    assert(r1.length == 87 + 20 + "https://a/1".length + 1 + 5)
    val whole = Warc.inflateIfGz(f)
    val slice = java.util.Arrays.copyOfRange(
      whole, spans(1)._2.toInt, (spans(1)._2 + spans(1)._3).toInt)
    assert(Warc.parseRecords(slice).toList.map(_.url) == List("https://a/2"),
      "a CDX range read must re-parse on its own")
    // a nonconforming writer omitting the trailing CRLFCRLF must not
    // cost the adjacent record its magic
    val noSep = (r1.dropRight(4) ++ r2).toArray
    assert(Warc.parseRecordsWithSpans(noSep).toList.map(t => (t._1.url, t._2)) ==
      List(("https://a/1", 0L), ("https://a/2", (r1.length - 4).toLong)))
  }

  test("httpSplit parses status/headers/body; non-HTTP and malformed drop") {
    val msg = ("HTTP/1.1 301 Moved Permanently\r\nLocation: https://b/\r\n" +
      "Content-Type: text/html\r\n\r\nbody\r\n\r\nwith embedded sep").getBytes("UTF-8")
    val Some((st, hs, body)) = Warc.httpSplit(msg)
    assert(st == 301)
    assert(hs("content-type") == "text/html" && hs("location") == "https://b/")
    assert(new String(body, "UTF-8") == "body\r\n\r\nwith embedded sep",
      "only the FIRST CRLFCRLF terminates headers")
    assert(Warc.httpSplit("just bare content".getBytes("UTF-8")).isEmpty)
    assert(Warc.httpSplit("HTTP/1.1 abc OK\r\n\r\nx".getBytes("UTF-8")).isEmpty,
      "non-numeric status drops")
    assert(Warc.httpSplit("HTTP/1.1 200 OK\r\nno separator".getBytes("UTF-8")).isEmpty)
  }

  test("readResponses keeps HTTP records, drops bare-payload records") {
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nhello"
    val f = Warc.gzFile(Iterator(
      rec("https://a/http", "2024-01-01T00:00:00Z", http),
      rec("https://a/bare", "2024-01-01T00:00:00Z", "not an http message")))
    val files = Seq(Tuple1(f)).toDF("warc")
    val out = Warc.readResponses(files, "warc").collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("url") == "https://a/http")
    assert(out.head.getAs[Int]("status") == 200)
    assert(out.head.getAs[String]("content_type") == "text/plain")
    assert(new String(out.head.getAs[Array[Byte]]("body"), "UTF-8") == "hello")
  }

  test("Spark write→read round-trip preserves every record across shards") {
    val pages = Seq(
      ("https://h/1", "2024-01-01T00:00:00Z", "one", 0L),
      ("https://h/2", "2024-01-01T00:00:00Z", "two", 1L),
      ("https://h/3", "2024-01-02T00:00:00Z", "three", 0L))
      .toDF("url", "warc_date", "text", "shard")
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val files = Warc.writeFiles(pages, "url", "warc_date", "payload", col("shard"))
    assert(files.count() == 2)
    val back = Warc.readPages(files, "warc")
      .select(col("url"), col("warc_date"), col("content_length"),
        decode(col("payload"), "UTF-8").as("text"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(back == Set(
      ("https://h/1", "2024-01-01T00:00:00Z", 3L, "one"),
      ("https://h/2", "2024-01-01T00:00:00Z", 3L, "two"),
      ("https://h/3", "2024-01-02T00:00:00Z", 5L, "three")))
  }
}
