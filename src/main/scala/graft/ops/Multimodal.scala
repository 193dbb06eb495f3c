package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads are opaque
  * `binary` columns with typed metadata; decode / feature-extraction
  * runs as a batched partition-level transform (the Scala analog of
  * `mapInPandas`: one iterator per partition, schema declared up
  * front, arbitrary library calls inside).
  *
  * The actual media codecs are NOT in this container, so `decodeStub`
  * is a clearly-marked deterministic fake — the Spark-side plumbing
  * (binary schema, partitioning, batch iterator shape, feature schema)
  * is real and is what these operators test.
  */
object Multimodal {

  /** Input row for the partition-level decoder. */
  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features (what a real image/audio decoder would emit). */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      checksum: String,
      width: Int,     // fake-decoded dimensions
      height: Int,
      n_frames: Int)  // frame-sampling: 1 frame per 1024-byte chunk

  /** STUB decoder ======================================================
    * A real deployment would call an image/audio library here
    * (e.g. JavaCV / TwelveMonkeys) on each payload. Deterministic fake:
    * dimensions derived from payload length, checksum = MD5.
    * ==================================================================
    */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    val width = (n % 512) + 16
    val height = (n / 512 % 512) + 16
    val frames = (n + 1023) / 1024
    (width, height, frames)
  }

  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** Batched feature extraction over binary payloads. Runs once per
    * partition with an iterator (no per-row task overhead), exactly the
    * execution shape a Python `mapInPandas` decoder would have.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      // per-partition init (a real decoder would open codecs here, once)
      rows.map { r =>
        val (w, h, f) = decodeStub(r.payload)
        MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong,
          md5hex(r.payload), w, h, f)
      }
    }
  }

  /** Build a media table from the documents fixture: payload = UTF-8
    * bytes of the text (stand-in blob), media_type round-robins over
    * modalities. Partitioned by a hash of doc_id so payloads spread
    * evenly — the layout a 100 TB binary corpus needs (no partition
    * hotspotting by source/media_type).
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Resize: per-payload fixed-size thumbnail. STUB resampler ==========
    * a real deployment would decode + bilinear-resize here; the fake
    * nearest-neighbor byte sampler keeps the exact execution shape
    * (partition-level batch transform, binary in / fixed-width binary
    * out) and is deterministic for tests/oracles.
    * ==================================================================
    */
  final case class Thumbnail(doc_id: Long, media_type: String,
                             thumb: Array[Byte], thumb_checksum: String)

  def resize(media: Dataset[MediaRow], side: Int = 64): Dataset[Thumbnail] = {
    implicit val enc = Encoders.product[Thumbnail]
    val n = side * side
    media.mapPartitions { rows =>
      rows.map { r =>
        val src = r.payload
        val out = new Array[Byte](n)
        if (src.nonEmpty) {
          var i = 0
          while (i < n) { out(i) = src((i.toLong * src.length / n).toInt); i += 1 }
        }
        Thumbnail(r.doc_id, r.media_type, out, md5hex(out))
      }
    }
  }

  /** Frame sampling: explode each payload into per-frame rows (1 KiB
    * chunks), keeping every `stride`-th frame — the Spark-side shape of
    * video frame-sampling (real decode stubbed).
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 2): DataFrame =
    media.toDF()
      .withColumn("n_frames",
        ((length(col("payload")) + 1023) / 1024).cast("int"))
      .withColumn("frame_idx",
        explode(filter(sequence(lit(0), col("n_frames") - 1),
          i => i % stride === 0)))
      .withColumn("frame_bytes",
        col("payload").substr(col("frame_idx") * 1024 + 1, lit(1024)))
      .select(col("doc_id"), col("media_type"), col("frame_idx"),
        length(col("frame_bytes")).as("frame_n_bytes"))
}
