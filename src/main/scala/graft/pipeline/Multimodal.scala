package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque binary payloads with typed metadata and
  * a partition-wise feature-extraction operator.
  *
  * The decode step is a clearly-marked deterministic FAKE (this container has
  * no image/audio codecs); everything around it — schema, batching,
  * partition-wise execution, output shape — is the real distributed plumbing
  * a decode UDF would run in. Swapping `fakeDecode` for a real codec is a
  * one-function change.
  *
  * Scale posture: `extractFeatures` is mapPartitions over the binary column —
  * the payload never moves through a shuffle; feature extraction happens
  * where the bytes already live, exactly how a 100 TB image corpus must be
  * processed.
  */
object Multimodal {

  /** Attach a synthetic binary payload column (UTF-8 bytes of the text) —
    * stands in for an image/audio blob ingested from an upstream source.
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

  /** STUB decode: a real implementation would parse the codec here. The fake
    * is deterministic — per-quarter mean byte value in micro-units via
    * integer math (sum·10⁶ div len, then ONE fp division) — so the value is
    * bit-reproducible across engines and the driver's DuckDB oracle can
    * check it exactly.
    */
  private def fakeDecode(bytes: Array[Byte]): Array[Double] = {
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

  /** Partition-wise feature extraction over the blob column. */
  def extractFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    val withB = withBlob(docs).select("doc_id", "blob")
    val rdd = withB.rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        Row(id, bytes.length.toLong, fakeDecode(bytes))
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }
}
