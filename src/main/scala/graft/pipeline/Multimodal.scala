package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque binary payloads with typed metadata and
  * a partition-wise feature-extraction operator.
  *
  * Audio is REAL: blobs are RIFF/WAVE containers (canonical PCM header +
  * 16-bit LE mono samples) and `decodeWav` is an actual chunk-walking WAV
  * parser — header validation, fmt negotiation, data-chunk extraction,
  * per-quarter RMS over decoded samples. The container has no image/video
  * codecs, so `sampleFrames`' per-frame feature stays a clearly-marked
  * deterministic stand-in; its windowing/batching plumbing is real.
  *
  * Scale posture: `extractFeatures` is mapPartitions over the binary column —
  * the payload never moves through a shuffle; feature extraction happens
  * where the bytes already live, exactly how a 100 TB media corpus must be
  * processed.
  */
object Multimodal {

  /** Attach a synthetic binary payload column (UTF-8 bytes of the text) —
    * stands in for an opaque blob ingested from an upstream source.
    */
  def withBlob(docs: DataFrame): DataFrame =
    docs.withColumn("blob", encode(col("text"), "UTF-8"))

  /** Pure-SQL metadata over the binary column (length, digest, magic byte).
    * This is the part of multimodal handling Catalyst can see through —
    * filters on it push down; the blob itself is never decoded.
    */
  def blobMeta(docs: DataFrame): DataFrame =
    withBlob(docs).select(
      col("doc_id"),
      octet_length(col("blob")).cast(LongType).as("n_bytes"),
      md5(col("blob")).as("content_md5"),
      substring(base64(col("blob")), 1, 8).as("head_b64"))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("features", ArrayType(DoubleType))))

  // ---- real WAV/PCM codec (pure JVM, no external deps) ----

  /** Synthesize a REAL RIFF/WAVE container: canonical 44-byte PCM header
    * (mono, 8 kHz, 16-bit) + little-endian samples. The deterministic
    * text→sample map (byte b → b·257 − 32768, spanning the full int16
    * range) stands in for upstream audio ingest; the container is a valid
    * WAV any player or parser accepts.
    */
  def wavFromBytes(data: Array[Byte]): Array[Byte] = {
    val nSamples = data.length
    val dataSize = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                    // PCM
      .putShort(1)                    // mono
      .putInt(8000)                   // sample rate
      .putInt(8000 * 2)               // byte rate
      .putShort(2)                    // block align
      .putShort(16)                   // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    data.foreach(b => buf.putShort(((b & 0xff) * 257 - 32768).toShort))
    buf.array()
  }

  /** REAL WAV decoder: walks the RIFF chunk list (not fixed offsets), checks
    * the RIFF/WAVE magics, negotiates the fmt chunk (PCM, 16-bit), extracts
    * the data chunk, and decodes little-endian int16 samples. Returns None
    * for anything that is not a well-formed 16-bit PCM WAV.
    */
  def decodeWav(bytes: Array[Byte]): Option[Array[Int]] = {
    if (bytes.length < 12) return None
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(off: Int): String =
      new String(bytes, off, 4, "US-ASCII")
    if (fourcc(0) != "RIFF" || fourcc(8) != "WAVE") return None
    var off = 12
    var fmtOk = false
    var channels = 0
    var dataOff = -1
    var dataLen = 0
    while (off + 8 <= bytes.length) {
      val id = fourcc(off)
      val size = buf.getInt(off + 4)
      if (size < 0 || off + 8 + size > bytes.length) return None
      id match {
        case "fmt " if size >= 16 =>
          val audioFormat = buf.getShort(off + 8) & 0xffff
          channels = buf.getShort(off + 10) & 0xffff
          val bits = buf.getShort(off + 22) & 0xffff
          fmtOk = audioFormat == 1 && bits == 16 && channels >= 1
        case "data" => dataOff = off + 8; dataLen = size
        case _ => // skip unknown chunks (LIST, fact, ...)
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (!fmtOk || dataOff < 0) return None
    val n = dataLen / 2
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { out(i) = buf.getShort(dataOff + 2 * i).toInt; i += 1 }
    Some(out)
  }

  /** Per-quarter RMS over decoded samples, oracle-exact: sum of squares and
    * the mean are integer (exact), the square root is one IEEE-754 op
    * (correctly rounded everywhere), and the 6-decimal floor truncation is
    * unambiguous — bit-identical in DuckDB.
    */
  def quarterRms(samples: Array[Int]): Array[Double] = {
    val n = samples.length
    (0 until 4).map { q =>
      val lo = q * n / 4
      val hi = math.min(math.max(lo + 1, (q + 1) * n / 4), n)
      if (lo >= hi) 0.0
      else {
        var sq = 0L
        var i = lo
        while (i < hi) { val v = samples(i).toLong; sq += v * v; i += 1 }
        val meanSq = sq / (hi - lo)
        (math.sqrt(meanSq.toDouble) * 1e6).toLong / 1e6
      }
    }.toArray
  }

  // ---- real PNG codec (pure JVM: java.util.zip Deflater/Inflater/CRC32) ----

  private val PngSig =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Synthesize a REAL PNG: 8-bit grayscale, 16 px wide, filter-0 scanlines,
    * one zlib-deflated IDAT, CRC-correct chunks — any PNG viewer opens it.
    * Pixel i = payload byte i (row-major), zero-padded to the last row.
    */
  def pngFromBytes(data: Array[Byte], width: Int = 16): Array[Byte] = {
    val w = width
    val h = math.max(1, (data.length + w - 1) / w)
    val raw = new Array[Byte](h * (w + 1)) // leading filter byte (0) per row
    var i = 0
    while (i < data.length) {
      raw((i / w) * (w + 1) + 1 + (i % w)) = data(i); i += 1
    }
    assemblePng(w, h, raw)
  }

  /** Deflate filtered scanlines and assemble signature/IHDR/IDAT/IEND with
    * correct CRCs (spec hook: lets tests build fixtures with non-zero
    * filter types to prove the decoder defilters).
    */
  private[graft] def assemblePng(w: Int, h: Int,
                                 rawScanlines: Array[Byte]): Array[Byte] = {
    val defl = new java.util.zip.Deflater()
    defl.setInput(rawScanlines); defl.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
    defl.end()
    val idat = out.toByteArray
    val bb = java.nio.ByteBuffer.allocate(8 + 25 + 12 + idat.length + 12)
    bb.put(PngSig)
    def chunk(tag: String, body: Array[Byte]): Unit = {
      bb.putInt(body.length)
      val tb = tag.getBytes("US-ASCII")
      bb.put(tb).put(body)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(body)
      bb.putInt(crc.getValue.toInt)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte)  // bit depth
      .put(0.toByte)  // color type 0 = grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
    chunk("IHDR", ihdr.array()); chunk("IDAT", idat)
    chunk("IEND", Array.empty[Byte])
    bb.array()
  }

  /** REAL PNG decoder for the 8-bit grayscale non-interlaced profile:
    * signature check, chunk walk with length validation, IHDR negotiation,
    * multi-IDAT concatenation, zlib inflate, and full scanline
    * DEFILTERING — all five PNG filter types (None/Sub/Up/Average/Paeth),
    * so PNGs from other encoders decode too, not just our filter-0 output.
    * Returns (width, height, row-major pixels); None for anything
    * malformed or outside the profile.
    */
  def decodePng(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes.length < 8 || !bytes.take(8).sameElements(PngSig)) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var off = 8
    var w = -1; var h = -1; var profileOk = false
    val idat = new java.io.ByteArrayOutputStream()
    while (off + 12 <= bytes.length) {
      val len = bb.getInt(off)
      if (len < 0 || off + 12 + len > bytes.length) return None
      new String(bytes, off + 4, 4, "US-ASCII") match {
        case "IHDR" if len == 13 =>
          w = bb.getInt(off + 8); h = bb.getInt(off + 12)
          profileOk = bytes(off + 16) == 8 && bytes(off + 17) == 0 &&
            bytes(off + 20) == 0 && w > 0 && h > 0 &&
            w.toLong * h < (1L << 28) // refuse absurd allocations
        case "IDAT" => idat.write(bytes, off + 8, len)
        case _ => // ancillary chunks (tEXt, pHYs, ...) skip
      }
      off += 12 + len
    }
    if (!profileOk || idat.size() == 0) return None
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    val raw = new Array[Byte](h * (w + 1))
    var got = 0
    try {
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        got += n
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    if (got < raw.length) return None
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val f = raw(y * (w + 1)) & 0xff
      var x = 0
      while (x < w) {
        val cur = raw(y * (w + 1) + 1 + x) & 0xff
        val a = if (x > 0) px(y * w + x - 1) else 0
        val b = if (y > 0) px((y - 1) * w + x) else 0
        val c = if (x > 0 && y > 0) px((y - 1) * w + x - 1) else 0
        val v = f match {
          case 0 => cur
          case 1 => (cur + a) & 0xff
          case 2 => (cur + b) & 0xff
          case 3 => (cur + (a + b) / 2) & 0xff
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            (cur + pred) & 0xff
          case _ => return None
        }
        px(y * w + x) = v
        x += 1
      }
      y += 1
    }
    Some((w, h, px))
  }

  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(DoubleType))))

  /** Partition-wise image features: synthesize the PNG at the source (the
    * ingest stand-in), run the REAL decoder (chunk walk, inflate,
    * defilter), and compute per-quarter mean luminance over the decoded
    * row-major pixels in exact integer micro-units. Width/height come from
    * the parsed IHDR.
    */
  def extractImageFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    val withB = withBlob(docs).select("doc_id", "blob")
    val rdd = withB.rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val png = pngFromBytes(r.getAs[Array[Byte]](1))
        val (w, h, px) = decodePng(png).get // our own container always parses
        val n = px.length
        val feats = (0 until 4).map { q =>
          val lo = q * n / 4
          val hi = math.min(math.max(lo + 1, (q + 1) * n / 4), n)
          if (lo >= hi) 0.0
          else {
            var s = 0L; var i = lo
            while (i < hi) { s += px(i); i += 1 }
            (s * 1000000L / (hi - lo)).toDouble / 1e6
          }
        }.toArray
        Row(id, w, h, feats)
      }
    }
    spark.createDataFrame(rdd, imageFeatureSchema)
  }

  /** Fallback for non-WAV blobs (video codecs are not available in
    * this environment): deterministic per-quarter mean byte value — the
    * documented stand-in, NOT a parser.
    */
  private def byteStatFallback(bytes: Array[Byte]): Array[Double] = {
    val n = bytes.length
    (0 until 4).map { q =>
      val lo = q * n / 4
      val hi = math.max(lo + 1, (q + 1) * n / 4)
      val slice = bytes.slice(lo, math.min(hi, n))
      if (slice.isEmpty) 0.0
      else {
        val micro = slice.foldLeft(0L)((a, b) => a + (b & 0xff)) * 1000000L / slice.length
        micro.toDouble / 1e6
      }
    }.toArray
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame_feature", DoubleType)))

  /** Frame sampling over a video-shaped blob: emit every `stride`-th
    * "frame" (fixed-size byte window) with a stub feature. One row per
    * sampled frame — the 1:N explode shape a video pipeline produces; the
    * windowing/batching is real, the decode is the deterministic fake.
    */
  def sampleFrames(spark: SparkSession, docs: DataFrame,
                   frameBytes: Int = 16, stride: Int = 4): DataFrame = {
    val withB = withBlob(docs).select("doc_id", "blob")
    val rdd = withB.rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val nFrames = math.max(1, bytes.length / frameBytes)
        (0 until nFrames by stride).map { f =>
          val slice = bytes.slice(f * frameBytes, math.min((f + 1) * frameBytes, bytes.length))
          val feat =
            if (slice.isEmpty) 0.0
            else math.round(slice.map(b => (b & 0xff).toDouble).sum / slice.length * 1e6) / 1e6
          Row(id, f, feat)
        }
      }
    }
    spark.createDataFrame(rdd, frameSchema)
  }

  /** Partition-wise feature extraction over audio blobs: synthesize the WAV
    * container at the source (the ingest stand-in), then run the REAL
    * decoder — RIFF walk, PCM negotiation, int16 decode — and per-quarter
    * RMS on the samples. n_bytes is the container's true size. Blobs the
    * parser rejects fall back to byte statistics (documented stub for
    * codec-less formats).
    */
  def extractFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    val withB = withBlob(docs).select("doc_id", "blob")
    val rdd = withB.rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val wav = wavFromBytes(r.getAs[Array[Byte]](1))
        val features = decodeWav(wav).map(quarterRms)
          .getOrElse(byteStatFallback(wav))
        Row(id, wav.length.toLong, features)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }
}
