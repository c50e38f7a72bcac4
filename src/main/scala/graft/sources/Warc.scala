package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import scala.util.control.NonFatal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WARC ingest/egress — the container format Common-Crawl-style corpora
  * actually ship in (the north-star input table of (url, warc_ts, html,
  * text, lang) rows is the PARSED form of these files; the reference
  * ingests one PDF per upload — at 10^12 docs the ingest unit is a
  * ~1 GB `.warc.gz` segment instead).
  *
  * Format implemented from the public ISO 28500 framing: each record is
  * a `WARC/1.0` header block (Target-URI, Date, Content-Length) ending
  * in CRLFCRLF, `Content-Length` octets of payload, then CRLFCRLF; a
  * Common-Crawl `.warc.gz` file is per-RECORD gzip members
  * concatenated, so a reader can split a file without inflating all of
  * it and a record is seekable by byte offset. `java.util.zip`'s
  * GZIPInputStream reads concatenated members natively.
  *
  * Scale shape: `readPages` is a NARROW mapPartitions over whole-file
  * byte blobs (one task per file — CC sizes files ~1 GB precisely so
  * file == task granularity works) with Content-Length framing,
  * magic-scan RESYNC past corrupt records, and per-file failure
  * isolation — a truncated or garbage file yields its parseable prefix,
  * never a failed job. `writeFiles` is ONE groupBy(shard) shuffle;
  * group size is file size by construction, the same bound a real
  * segment writer enforces. */
object Warc {

  /** One parsed record: the mandatory headers + the raw payload. */
  final case class WarcRec(url: String, warc_date: String, payload: Array[Byte])

  private val Sep = "\r\n\r\n".getBytes("US-ASCII")
  private val Magic = "WARC/".getBytes("US-ASCII")

  /** One plain (un-gzipped) response record. */
  def record(url: String, date: String, payload: Array[Byte]): Array[Byte] = {
    val header = s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: $url\r\nWARC-Date: $date\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n"
    val h = header.getBytes("UTF-8")
    val out = new ByteArrayOutputStream(h.length + payload.length + 4)
    out.write(h)
    out.write(payload)
    out.write(Sep)
    out.toByteArray
  }

  /** Records → one `.warc.gz` file blob: each record its own gzip
    * member (the Common Crawl layout — members concatenate to a valid
    * multi-member stream). */
  def gzFile(records: Iterator[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { r =>
      val gz = new GZIPOutputStream(out)
      gz.write(r)
      // close (not just finish) ends the native Deflater NOW — finish()
      // alone leaks one zlib buffer per record until GC, which on a
      // 100k-record segment is a real off-heap spike; closing `out` is
      // a no-op for ByteArrayOutputStream, so members keep appending
      gz.close()
    }
    out.toByteArray
  }

  /** Multi-member gzip sniff + inflate; non-gzip bytes pass through. */
  def inflateIfGz(bytes: Array[Byte]): Array[Byte] =
    if (bytes != null && bytes.length >= 2 &&
        (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b) {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
      try {
        val out = new ByteArrayOutputStream(bytes.length * 4)
        val buf = new Array[Byte](65536)
        var n = in.read(buf)
        while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      } finally in.close() // ends the native Inflater eagerly
    } else if (bytes == null) Array.emptyByteArray
    else bytes

  /** Streaming record split of one file's bytes. Content-Length frames
    * each payload (so payloads may freely CONTAIN `WARC/1.0` or
    * CRLFCRLF — no content sniffing); a record with corrupt framing or
    * missing mandatory headers is dropped and the scan RESYNCS at the
    * next `WARC/` magic, keeping every later record. Total: never
    * throws on malformed input. */
  def parseRecords(fileBytes: Array[Byte]): Iterator[WarcRec] =
    parseRecordsWithSpans(fileBytes).map(_._1)

  /** [[parseRecords]] plus each record's (offset, length) byte span in
    * the INFLATED stream — per-record gzip members inflate to exactly
    * the plain concatenation, so these spans are layout-stable whether
    * the file was compressed or not; they are what a CDX index records
    * so a reader can range-request one record out of a segment. */
  def parseRecordsWithSpans(fileBytes: Array[Byte]): Iterator[(WarcRec, Long, Long)] = {
    val b = try inflateIfGz(fileBytes) catch { case NonFatal(_) => Array.emptyByteArray }

    def bIndexOf(pat: Array[Byte], from: Int): Int = {
      var i = math.max(from, 0)
      val last = b.length - pat.length
      while (i <= last) {
        var j = 0
        while (j < pat.length && b(i + j) == pat(j)) j += 1
        if (j == pat.length) return i
        i += 1
      }
      -1
    }

    new scala.collection.AbstractIterator[(WarcRec, Long, Long)] {
      private var pos = 0
      private var nxt: (WarcRec, Long, Long) = _

      private def parseOne(): (WarcRec, Long, Long) = {
        while (pos < b.length) {
          val start = bIndexOf(Magic, pos)
          if (start < 0) { pos = b.length; return null }
          val hEnd = bIndexOf(Sep, start)
          if (hEnd < 0) { pos = b.length; return null }
          val fields = new String(b, start, hEnd - start, "UTF-8")
            .split("\r\n").iterator.flatMap { line =>
              val i = line.indexOf(':')
              if (i > 0) Some(line.substring(0, i).trim.toLowerCase ->
                line.substring(i + 1).trim)
              else None
            }.toMap
          val len = fields.get("content-length")
            .flatMap(s => scala.util.Try(s.toLong).toOption)
          len match {
            case Some(n) if n >= 0 && hEnd + 4 + n <= b.length =>
              val payload =
                java.util.Arrays.copyOfRange(b, hEnd + 4, (hEnd + 4 + n).toInt)
              // the record span includes the trailing CRLFCRLF only when
              // actually present (a nonconforming writer may omit it —
              // blindly skipping 4 bytes would swallow the next record's
              // magic); [start, end) re-parses standalone either way
              val pEnd = (hEnd + 4 + n).toInt
              val end =
                if (pEnd + 4 <= b.length && b(pEnd) == '\r' && b(pEnd + 1) == '\n' &&
                  b(pEnd + 2) == '\r' && b(pEnd + 3) == '\n') pEnd + 4
                else pEnd
              val record = (fields.get("warc-target-uri"), fields.get("warc-date")) match {
                case (Some(u), Some(d)) =>
                  (WarcRec(u, d, payload), start.toLong, (end - start).toLong)
                case _ => null // mandatory header missing: skip record
              }
              pos = end
              if (record != null) return record
            case _ =>
              pos = start + Magic.length // corrupt framing: resync at next magic
          }
        }
        null
      }

      override def hasNext: Boolean = { if (nxt == null) nxt = parseOne(); nxt != null }
      override def next(): (WarcRec, Long, Long) = {
        if (!hasNext) throw new NoSuchElementException("parseRecords")
        val r = nxt; nxt = null; r
      }
    }
  }

  /** (url, date, payload) rows → (shard, warc:binary) file blobs in ONE
    * groupBy(shard) shuffle. Rows are sorted (url, date) inside each
    * file for byte-determinism (Spark group iterators are unordered);
    * the in-memory group is file-sized BY CONSTRUCTION — pick the shard
    * count so corpus/shards ≈ the ~1 GB segment size a real writer
    * targets, exactly as CC does. */
  def writeFiles(pages: DataFrame, url: String, date: String, payload: String,
      shard: Column, gzip: Boolean = true): DataFrame = {
    val s = pages.sparkSession
    import s.implicits._
    pages
      .select(shard.cast("long").as("shard"), col(url).cast("string").as("u"),
        col(date).cast("string").as("d"), col(payload).cast("binary").as("p"))
      .as[(Long, String, String, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (k, rows) =>
        val sorted = rows.toArray.sortBy(r => (r._2, r._3))
        val recs = sorted.iterator.map(r => record(r._2, r._3, r._4))
        val blob =
          if (gzip) gzFile(recs)
          else {
            val out = new ByteArrayOutputStream()
            recs.foreach(out.write)
            out.toByteArray
          }
        (k, blob)
      }
      .toDF("shard", "warc")
  }

  /** File blobs → CDX-style index rows: (shard, url, warc_date, offset,
    * length, digest) — one row per record with its byte span in the
    * inflated stream and an md5 payload digest. This IS the web-archive
    * index artifact: sorted by SURT key it answers "which segment file,
    * at which byte range, holds this url's capture" with one range
    * read. `keyCol` passes the file's identity through because offsets
    * are only meaningful relative to their own file. Narrow, like
    * [[readPages]]. */
  def indexRecords(files: DataFrame, keyCol: String, warcCol: String): DataFrame = {
    val s = files.sparkSession
    import s.implicits._
    files.select(col(keyCol).cast("long").as("k"), col(warcCol).cast("binary").as("b"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (k, bytes) =>
          parseRecordsWithSpans(bytes).map { case (r, off, len) =>
            md.reset()
            val hex = md.digest(r.payload).map("%02x".format(_)).mkString
            (k, r.url, r.warc_date, off, len, hex)
          }
        }
      }
      .toDF("shard", "url", "warc_date", "offset", "length", "digest")
  }

  /** Split an HTTP response payload (what a CC `response` record
    * actually carries: status line + headers + CRLFCRLF + body) into
    * (status, lowercased headers, body). None when the payload isn't an
    * HTTP message (warcinfo/metadata records, bare content) or the
    * status line is malformed — callers drop, never fail. The body is
    * the raw remainder: it may itself contain CRLFCRLF (only the FIRST
    * separator terminates the header block). */
  def httpSplit(payload: Array[Byte]): Option[(Int, Map[String, String], Array[Byte])] = {
    val magic = "HTTP/".getBytes("US-ASCII")
    if (payload == null || payload.length < magic.length ||
        !magic.indices.forall(i => payload(i) == magic(i))) return None
    var sep = -1
    var i = 0
    while (sep < 0 && i <= payload.length - 4) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n') sep = i
      i += 1
    }
    if (sep < 0) return None
    val lines = new String(payload, 0, sep, "UTF-8").split("\r\n")
    val status = lines.head.split(" ", 3) match {
      case parts if parts.length >= 2 => scala.util.Try(parts(1).toInt).toOption
      case _                          => None
    }
    status.map { st =>
      val headers = lines.iterator.drop(1).flatMap { line =>
        val j = line.indexOf(':')
        if (j > 0) Some(line.substring(0, j).trim.toLowerCase ->
          line.substring(j + 1).trim)
        else None
      }.toMap
      (st, headers, java.util.Arrays.copyOfRange(payload, sep + 4, payload.length))
    }
  }

  /** File blobs → one row per HTTP `response` record: (url, warc_date,
    * status, content_type, content_length, body). Narrow like
    * [[readPages]]; records whose payload isn't a well-formed HTTP
    * message drop (per-record isolation). */
  def readResponses(files: DataFrame, warcCol: String): DataFrame = {
    val s = files.sparkSession
    import s.implicits._
    files.select(col(warcCol).cast("binary")).as[Array[Byte]]
      .mapPartitions(_.flatMap(bytes =>
        parseRecords(bytes).flatMap(r =>
          httpSplit(r.payload).map { case (st, hs, body) =>
            (r.url, r.warc_date, st, hs.getOrElse("content-type", null),
              body.length.toLong, body)
          })))
      .toDF("url", "warc_date", "status", "content_type", "content_length", "body")
  }

  /** File blobs → one row per parsed record: (url, warc_date,
    * content_length, payload). Narrow — no shuffle; malformed files
    * degrade to their parseable records. */
  def readPages(files: DataFrame, warcCol: String): DataFrame = {
    val s = files.sparkSession
    import s.implicits._
    files.select(col(warcCol).cast("binary")).as[Array[Byte]]
      .mapPartitions(_.flatMap(bytes =>
        parseRecords(bytes).map(r =>
          (r.url, r.warc_date, r.payload.length.toLong, r.payload))))
      .toDF("url", "warc_date", "content_length", "payload")
  }
}
