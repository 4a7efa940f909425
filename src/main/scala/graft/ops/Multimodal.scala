package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata alongside. Real decode/feature-extraction
  * libraries are not in this environment, so the decode is a clearly-marked
  * deterministic stub — but the Spark-side plumbing is real and tested:
  * typed `Dataset[T]` with case-class Encoders, `mapPartitions` batch shape
  * (one iterator per partition, the Scala analog of arrow-batched UDFs),
  * and partitioning preserved end-to-end.
  */
object Multimodal {

  /** A media asset: id + raw bytes. */
  final case class MediaRow(doc_id: Long, media: Array[Byte])

  /** Typed decode output. */
  final case class MediaMeta(doc_id: Long, width: Int, height: Int,
                             format: String, n_bytes: Long)

  /** 60-bit sha2 hash of a string — same value as TextOps.h60 / the DuckDB
    * oracle's hex-parse, computed driver/executor-side.
    */
  def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  val Formats = Seq("png", "jpeg", "wav")

  /** STUB decode — stands in for an image/audio decoder. Deterministic:
    * dimensions and format derive from sha2 of the payload, so results are
    * reproducible (and SQL-checkable) while exercising the real
    * mapPartitions pipeline. Swap the body for a real decoder (e.g. javax
    * imageio / ffmpeg bindings) in production.
    */
  def decodeStub(row: MediaRow): MediaMeta = {
    val text = new String(row.media, "UTF-8")
    MediaMeta(
      row.doc_id,
      (h60(text + "w") % 1920L).toInt + 1,
      (h60(text + "h") % 1080L).toInt + 1,
      Formats((h60(text) % 3L).toInt),
      row.media.length.toLong)
  }

  /** Decode a corpus of media rows partition-by-partition. `mapPartitions`
    * keeps per-partition batching (amortizes decoder init — exactly where a
    * real codec would load its native context once per partition).
    */
  def decodeAll(spark: SparkSession, media: Dataset[MediaRow]): DataFrame = {
    import spark.implicits._
    media.mapPartitions(_.map(decodeStub)).toDF()
  }
}
