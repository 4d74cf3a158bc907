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

  /** q209: multimodal FORMAT CENSUS — per (source, container format)
    * counts, byte volume and ppm mix, with the format detected from
    * the blob's MAGIC BYTES (the first job any media lake runs: "what
    * is actually in these binary columns", catching mislabeled
    * extensions and corrupt headers before decode workers waste GPU
    * time on them). Detection is pure binary ops on the leading bytes
    * — no decode, no UDF, one scan + one map-combined aggregate.
    *
    * The blobs here are synthesized (the container has no media): each
    * doc's UTF-8 bytes get a REAL container magic (JPEG ff d8 / PNG
    * 89 50 / RIFF 52 49) chosen by the md5 of its id — deterministic
    * and engine-identical, so the census is fully oracle-checked. A
    * real deployment swaps the synthesis for the actual media column;
    * the sniffing and census stages are unchanged.
    */
  def q209FormatCensus(s: SparkSession, d: String): DataFrame = {
    val pick = expr(
      "conv(substring(md5(CAST(CAST(doc_id AS STRING) AS BINARY)), 1, 1), 16, 10)")
      .cast("int") % 3
    val magic = element_at(
      array(lit("FFD8"), lit("8950"), lit("5249")), pick + 1)
    val blobs = Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(col("source"),
        concat(unhex(magic), encode(col("text"), "UTF-8")).as("media"))
    val census = blobs
      .select(col("source"),
        when(hex(substring(col("media"), 1, 2)) === "FFD8", "jpeg")
          .when(hex(substring(col("media"), 1, 2)) === "8950", "png")
          .when(hex(substring(col("media"), 1, 2)) === "5249", "riff")
          .otherwise("unknown").as("format"),
        length(col("media")).cast("long").as("_bytes"))
      .groupBy(col("source"), col("format"))
      .agg(count(lit(1)).cast("long").as("n_blobs"),
        sum(col("_bytes")).cast("long").as("total_bytes"))
    val tot = census.groupBy(col("source"))
      .agg(sum(col("n_blobs")).cast("long").as("_n"))
    census.join(broadcast(tot), "source")
      .select(col("source"), col("format"), col("n_blobs"),
        col("total_bytes"),
        expr("(2000000 * n_blobs + _n) DIV (2 * _n)").as("mix_ppm"))
  }
}
