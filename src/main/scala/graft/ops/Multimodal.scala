package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque
  * `binary` columns with typed metadata
  * (/root/reference/app_enhanced.py:621-692 extracts embedded images and
  * records their pixel dimensions). Raster image decode (PNG/JPEG/GIF) is
  * REAL — `javax.imageio.ImageIO` ships in the JDK, no external codec
  * jars needed — yielding true width/height for every format
  * `sniffFormat` detects as a raster. Only the non-raster codecs
  * genuinely absent from this container (audio/video) and the feature
  * EMBEDDING (which needs a vision model) remain deterministic stubs,
  * clearly marked below. Everything Spark-side — schema, batching,
  * partition-local iteration, output shape — is real and tested. At
  * scale this is the `mapPartitions`-with-batched-decoder pattern (the
  * Scala analog of Python's mapInPandas batches).
  */
object Multimodal {

  /** Typed feature row a real image decoder would emit. */
  final case class MediaFeatures(
      id: Long,
      n_bytes: Int,
      format: String,
      width: Int,
      height: Int,
      n_frames: Int,
      embedding: Seq[Float])

  /** Container sniffing by magic bytes — this part is REAL (not stubbed):
    * PNG (89 50 4E 47), JPEG (FF D8 FF), GIF ("GIF8"), RIFF containers
    * ("RIFF" + format tag at offset 8: WAVE/AVI /WEBP), HTML ('<'). */
  def sniffFormat(bytes: Array[Byte]): String = {
    val n = if (bytes == null) 0 else bytes.length
    def at(i: Int): Int = if (i < n) bytes(i) & 0xff else -1
    def ascii(from: Int, s: String): Boolean =
      s.zipWithIndex.forall { case (c, i) => at(from + i) == c.toInt }
    if (n == 0) "empty"
    else if (at(0) == 0x89 && ascii(1, "PNG")) "png"
    else if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) "jpeg"
    else if (ascii(0, "GIF8")) "gif"
    else if (ascii(0, "RIFF")) {
      if (ascii(8, "WAVE")) "wav"
      else if (ascii(8, "AVI ")) "avi"
      else if (ascii(8, "WEBP")) "webp"
      else "riff"
    } else if (at(0) == '<') "html"
    else "bin"
  }

  /** REAL raster decode: pixel dimensions via `javax.imageio.ImageIO`
    * (in the JDK). Returns None when the bytes aren't a decodable image
    * — caller falls back to the stub. */
  def imageDims(bytes: Array[Byte]): Option[(Int, Int)] =
    if (bytes == null || bytes.length == 0) None
    else try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None else Some((img.getWidth, img.getHeight))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** ==== STUB ==== deterministic fake decoder for NON-raster payloads:
    * the `format` column comes from REAL magic-byte sniffing
    * (sniffFormat); width/height/frames/embedding are pseudo-values
    * derived from the bytes. A production build replaces ONLY the pseudo
    * part with a real codec call; the operator around it is unchanged. */
  def stubDecode(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val n = if (bytes == null) 0 else bytes.length
    def at(i: Int): Int = if (n == 0) 0 else bytes(((i % n) + n) % n) & 0xff
    val emb = (0 until 8).map(i => (at(i * 7) - 128) / 128.0f)
    MediaFeatures(id, n, sniffFormat(bytes), 16 + at(1) % 64, 16 + at(2) % 64, 1 + at(3) % 8, emb)
  }

  /** Decode one payload: REAL ImageIO dimensions for sniffed raster
    * formats (png/jpeg/gif — n_frames 1), stub pseudo-values for
    * everything else. The embedding stays a deterministic stub (a real
    * build plugs a vision model into the same slot). */
  def decode(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val stub = stubDecode(id, bytes)
    stub.format match {
      case "png" | "jpeg" | "gif" =>
        imageDims(bytes) match {
          case Some((w, h)) => stub.copy(width = w, height = h, n_frames = 1)
          case None => stub // corrupt/truncated raster: keep the fallback
        }
      case _ => stub
    }
  }

  /** Batched partition-local decode: one decoder instance per partition,
    * rows streamed through it (no per-row setup cost; the real pattern
    * for codec handles / model sessions). */
  def decodeFeatures(spark: SparkSession, df: DataFrame, id: String, bin: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col(id).cast("long"), col(bin))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder setup would go here (ImageIO is
        // stateless; a codec-handle or model-session decoder would be
        // constructed once per partition at this point)
        rows.map { case (i, b) => decode(i, b) }
      }
  }

  /** Typed audio metadata a real WAV header parse emits. */
  final case class WavMeta(
      id: Long,
      sample_rate: Int,
      channels: Int,
      bits: Int,
      n_frames: Int,
      duration_ms: Long)

  /** REAL WAV (RIFF/WAVE PCM) metadata decode — pure header byte math,
    * no codec needed: walks the chunk list, reads channels/sample-rate/
    * bit-depth from `fmt ` and frame count from `data` size. Returns
    * None for non-WAV or truncated bytes. */
  def wavInfo(bytes: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (bytes == null || bytes.length < 44 || sniffFormat(bytes) != "wav") return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12 // past RIFF<size>WAVE
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var dataLen = -1
    while (pos + 8 <= bytes.length && (fmt.isEmpty || dataLen < 0)) {
      val cid = new String(bytes, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val clen = bb.getInt(pos + 4)
      if (clen < 0 || pos + 8 + clen > bytes.length) return None
      if (cid == "fmt " && clen >= 16)
        fmt = Some((bb.getShort(pos + 10).toInt, bb.getInt(pos + 12), bb.getShort(pos + 22).toInt))
      else if (cid == "data") dataLen = clen
      pos += 8 + clen + (clen & 1) // chunks are word-aligned
    }
    // block-align must be a whole positive byte count: sub-byte depths
    // (e.g. 4-bit IMA ADPCM) would make the divisor 0 and throw — this
    // parser only understands whole-byte PCM frames, so such rows are
    // None (dropped by wavFeatures), never a job-killing exception.
    fmt.collect {
      case (ch, rate, bits) if ch > 0 && rate > 0 && bits > 0 &&
          bits % 8 == 0 && dataLen >= 0 =>
        (ch, rate, bits, dataLen / (ch * bits / 8))
    }
  }

  /** Deterministic synthetic PCM-16 WAV (a REAL, spec-conformant RIFF
    * byte stream): header + sawtooth samples. Used by tests and the
    * `mm_wav_meta` driver query to close the encode→sniff→parse loop
    * with metadata an oracle predicts arithmetically. */
  def syntheticWav(sampleRate: Int, channels: Int, nFrames: Int): Array[Byte] = {
    val bits = 16
    val blockAlign = channels * bits / 8
    val dataLen = nFrames * blockAlign
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(36 + dataLen); buf.put("WAVE".getBytes)
    buf.put("fmt ".getBytes); buf.putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * blockAlign)
    buf.putShort(blockAlign.toShort)
    buf.putShort(bits.toShort)
    buf.put("data".getBytes); buf.putInt(dataLen)
    var i = 0
    while (i < dataLen / 2) { buf.putShort(((i * 257) % 32768).toShort); i += 1 }
    buf.array
  }

  /** Batched partition-local WAV metadata extraction (same
    * mapPartitions shape as `decodeFeatures`); undecodable payloads are
    * dropped (per-row failure isolation). */
  def wavFeatures(spark: SparkSession, df: DataFrame, id: String, bin: String): Dataset[WavMeta] = {
    import spark.implicits._
    df.select(col(id).cast("long"), col(bin))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (i, b) =>
        wavInfo(b).map { case (ch, rate, bits, frames) =>
          WavMeta(i, rate, ch, bits, frames, frames * 1000L / rate)
        }
      })
  }

  /** Deterministic synthetic PNG (REAL encoder — `ImageIO.write`): a
    * seeded RGB gradient at the given dimensions. Used by tests and the
    * `mm_decode_real` driver query to close the loop encode→sniff→decode
    * with dimensions an oracle can predict arithmetically. */
  def syntheticPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, ((x * 31 + y * 17 + seed) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Byte-level "frame sampling": every strideBytes-th byte, first
    * nFrames — the slicing/batching skeleton of video frame extraction,
    * expressed as pure column ops (engine-portable, oracle-checkable). */
  def frameSample(df: DataFrame, id: String, text: String,
      nFrames: Int = 5, strideBytes: Int = 100): DataFrame = {
    val samples = (0 until nFrames).map { f =>
      substring(col(text), f * strideBytes + 1, 1)
    }
    df.select(col(id),
      octet_length(col(text)).as("n_bytes"),
      ascii(substring(col(text), 1, 1)).as("head_byte"),
      md5(col(text)).as("content_md5"),
      concat_ws("", samples: _*).as("frame_sample"))
  }
}
