package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns flowing
  * through a typed Dataset pipeline with per-partition batch processing.
  *
  * The Spark-side shape is real — binary schema, `mapPartitions` batching,
  * typed feature rows. The decode itself is a clearly-marked STUB (this
  * container has no image/audio codecs): it derives deterministic fake
  * "frame" metadata from the leading bytes, so the pipeline is end-to-end
  * testable and oracle-checkable. Swapping in a real decoder changes only
  * `decodeStub`.
  */
object MultimodalOps {

  case class MediaBlob(doc_id: Long, media: Array[Byte])
  case class MediaFeatures(doc_id: Long, byte_len: Long, checksum: String,
      frame_w: Int, frame_h: Int)

  /** STUB decoder: in a real deployment this would decode an image/audio
    * blob (JPEG dims, sample rate, …). Here: deterministic pseudo-metadata
    * from the first two bytes + md5 checksum — enough to verify the
    * plumbing and the batch shape.
    */
  private def decodeStub(m: MediaBlob): MediaFeatures = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val checksum = md.digest(m.media).map("%02x".format(_)).mkString
    val w = if (m.media.length > 0) (m.media(0) & 0xff) % 64 + 1 else 1
    val h = if (m.media.length > 1) (m.media(1) & 0xff) % 64 + 1 else 1
    MediaFeatures(m.doc_id, m.media.length.toLong, checksum, w, h)
  }

  /** The typed pipeline: binary column in, per-partition iteration (the
    * shape a real batched decoder needs — model handles / codecs are
    * initialized once per partition, not per row), typed features out.
    */
  def extractFeatures(blobs: Dataset[MediaBlob]): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      // per-partition init would go here (codec / model handle)
      it.map(decodeStub)
    }
  }

  /** 35. Documents' text bytes treated as opaque media blobs → features. */
  def q35Multimodal(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val blobs = Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[MediaBlob]
    extractFeatures(blobs).toDF()
  }
}
