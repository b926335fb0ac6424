package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Decoded-media record produced by the (stubbed) decoder. */
final case class DecodedMedia(
    id: Long, format: String, nBytes: Long,
    width: Int, height: Int, channels: Int, checksum: Long)

/** Multimodal-column plumbing (SURVEY.md §2.8 north-star "multimodal
  * columns"): media as opaque `binary` columns with typed metadata.
  *
  * The container has no image/audio codec libraries, so the decode step is a
  * clearly-marked deterministic STUB ([[decodeStub]]) — it derives fake
  * dimensions from the byte content. Everything around it is the real
  * 100-TB-shaped plumbing: binary column + metadata struct schema, partition-
  * parallel `mapPartitions` batch iteration (the Scala analog of
  * `mapInPandas` batches), and a typed `Dataset[DecodedMedia]` output that
  * downstream relational operators consume normally.
  */
object Multimodal {

  /** Attach an opaque binary payload + typed metadata struct. In production
    * the payload would come from an object store; here it is the UTF-8 bytes
    * of the text column (real bytes, fake media).
    */
  def attachBinary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit("fake/raw").as("format"),
        length(col(textCol).cast("binary")).cast("long").as("n_bytes")).as("meta"))

  /** STUB decoder — stands in for an image/audio codec call.
    *
    * Real implementation would hand `payload` to a native decoder per
    * partition batch; this derives deterministic pseudo-dimensions from the
    * bytes so the full pipeline (schema, batching, typed output) is
    * exercised and testable without codec libraries.
    */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.select(col("id"), col("payload"), col("meta.format").as("format"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        it.map { case (id, bytes, fmt) =>
          // ??? real decode goes here; deterministic fake below
          var cs = 1469598103934665603L // FNV-1a over payload bytes
          var i = 0
          while (i < bytes.length) { cs = (cs ^ (bytes(i) & 0xffL)) * 1099511628211L; i += 1 }
          val w = 64 + (math.abs(cs) % 577).toInt
          val h = 64 + (math.abs(cs / 769) % 433).toInt
          DecodedMedia(id, fmt, bytes.length.toLong, w, h, 3, cs)
        }
      }
  }

  /** Frame sampling over a decoded stream: every `stride`-th record per
    * partition-ordered id (deterministic, no shuffle beyond the sort).
    */
  def sampleEvery(decoded: Dataset[DecodedMedia], stride: Int): Dataset[DecodedMedia] =
    decoded.filter(d => d.id % stride == 0)

  /** Byte-statistics projection used by the declared multimodal query —
    * pure relational ops over the binary column (no decode).
    */
  def byteStats(media: DataFrame): DataFrame =
    media.select(
      col("id"),
      col("meta.n_bytes").as("n_bytes"),
      (col("meta.n_bytes") % 256).as("fake_channel"))
}
