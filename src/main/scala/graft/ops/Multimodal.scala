package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata alongside, decoded partition-by-partition
  * through `mapPartitions` (one iterator per partition — the Scala analog
  * of arrow-batched UDFs; a real codec loads its native context once per
  * partition there).
  *
  * The decode seam is REAL for binary PPM (P6): `decodePpm` parses the
  * wire format any netpbm tool writes — ASCII header, raw RGB samples —
  * and derives dimensions and pixel statistics from the actual bytes.
  * Formats that need native codec libraries (JPEG/PNG/WAV) are not
  * decodable in this environment; their metadata path (m1/m2) treats the
  * payload as opaque bytes, which is exactly what it would be.
  */
object Multimodal {

  /** A media asset: id + raw bytes. */
  final case class MediaRow(doc_id: Long, media: Array[Byte])

  /** Typed decode output of a PPM payload: dimensions from the parsed
    * header, pixel statistics from the raw samples.
    */
  final case class PpmMeta(doc_id: Long, width: Int, height: Int,
                           format: String, n_bytes: Long,
                           px_sum: Long, px_mean: Double)

  /** 60-bit sha2 hash of a string — same value as TextOps.h60 / the DuckDB
    * oracle's hex-parse, computed driver/executor-side.
    */
  def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  val Formats = Seq("png", "jpeg", "wav")

  /** Parse a binary PPM (P6) payload: magic, whitespace-separated
    * width/height/maxval ASCII header, one whitespace byte, then
    * width*height*3 raw samples. A real decoder over a real wire format —
    * dimensions come from the parsed header and the pixel sum/mean from
    * the sample bytes; malformed payloads fail loudly rather than
    * producing fabricated stats.
    */
  def decodePpm(row: MediaRow): PpmMeta = {
    val b = row.media
    require(b.length >= 2 && b(0) == 'P' && b(1) == '6',
      s"PPM: bad magic in doc ${row.doc_id}")
    var i = 2
    def isWs(c: Byte) = c == '\n' || c == ' ' || c == '\t' || c == '\r'
    def int(): Int = {
      while (i < b.length && isWs(b(i))) i += 1
      require(i < b.length && b(i) >= '0' && b(i) <= '9',
        s"PPM: expected digit at offset $i in doc ${row.doc_id}")
      var v = 0
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0'); i += 1
      }
      v
    }
    val w = int(); val h = int(); val maxv = int()
    require(maxv == 255, s"PPM: unsupported maxval $maxv in doc ${row.doc_id}")
    require(i < b.length && isWs(b(i)), s"PPM: missing header terminator in doc ${row.doc_id}")
    i += 1 // exactly one whitespace byte separates header from samples
    val n = w * h * 3
    require(b.length - i == n,
      s"PPM: expected $n samples, got ${b.length - i} in doc ${row.doc_id}")
    var s = 0L
    var j = i
    while (j < b.length) { s += b(j) & 0xff; j += 1 }
    PpmMeta(row.doc_id, w, h, "ppm", b.length.toLong, s, s.toDouble / n)
  }

  /** Deterministic P6 fixture payload for a doc id: dimensions derived
    * from the id, samples from the affine byte pattern
    * `(id*131 + i*7) % 256`. The oracle recomputes the statistics
    * analytically from this formula; the decoder never sees it — it
    * parses the bytes like any other PPM.
    */
  def ppmFixture(docId: Long): MediaRow = {
    val w = (docId % 16).toInt + 1
    val h = ((docId / 16) % 16).toInt + 1
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val n = w * h * 3
    val out = new Array[Byte](header.length + n)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < n) {
      out(header.length + i) = ((docId * 131 + i * 7) % 256).toByte
      i += 1
    }
    MediaRow(docId, out)
  }

  /** Decode a corpus of media rows partition-by-partition with the given
    * decoder. `mapPartitions` keeps per-partition batching (amortizes
    * decoder init — exactly where a real codec loads its native context
    * once per partition) and preserves partitioning end-to-end.
    */
  def decodeAll[T: Encoder](spark: SparkSession, media: Dataset[MediaRow],
                            decode: MediaRow => T): DataFrame = {
    media.mapPartitions(_.map(decode)).toDF()
  }
}
