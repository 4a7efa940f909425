package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata alongside, decoded partition-by-partition
  * through `mapPartitions` (one iterator per partition — the Scala analog
  * of arrow-batched UDFs; a real codec loads its native context once per
  * partition there).
  *
  * The decode seam is REAL for two formats needing no native codec:
  * binary PPM (P6) — `decodePpm` parses the wire format any netpbm tool
  * writes (ASCII header, raw RGB samples) — and PCM WAV — `decodeWav`
  * parses the RIFF container (little-endian header fields, signed 16-bit
  * samples). Formats that need native codec libraries (JPEG/PNG/Opus) are
  * not decodable in this environment; their metadata path (m1/m2) treats
  * the payload as opaque bytes, which is exactly what it would be.
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

  /** Parsed P6 header: dimensions plus the offset of the first sample
    * byte. Shared by every PPM decoder here (decodePpm, resizePpmHalf,
    * dHashPpm) so the wire-format validation lives once.
    */
  private final case class PpmHeader(w: Int, h: Int, dataOff: Int)

  /** Parse and validate a binary-PPM (P6) header: magic, whitespace-
    * separated width/height/maxval ASCII fields, one whitespace byte, then
    * exactly width*height*3 raw samples. Malformed payloads fail loudly
    * rather than producing fabricated stats.
    */
  private def parsePpmHeader(b: Array[Byte], docId: Long): PpmHeader = {
    require(b.length >= 2 && b(0) == 'P' && b(1) == '6',
      s"PPM: bad magic in doc $docId")
    var i = 2
    def isWs(c: Byte) = c == '\n' || c == ' ' || c == '\t' || c == '\r'
    def int(): Int = {
      while (i < b.length && isWs(b(i))) i += 1
      require(i < b.length && b(i) >= '0' && b(i) <= '9',
        s"PPM: expected digit at offset $i in doc $docId")
      var v = 0
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0'); i += 1
      }
      v
    }
    val w = int(); val h = int(); val maxv = int()
    require(maxv == 255, s"PPM: unsupported maxval $maxv in doc $docId")
    require(i < b.length && isWs(b(i)), s"PPM: missing header terminator in doc $docId")
    i += 1 // exactly one whitespace byte separates header from samples
    require(b.length - i == w * h * 3,
      s"PPM: expected ${w * h * 3} samples, got ${b.length - i} in doc $docId")
    PpmHeader(w, h, i)
  }

  /** Parse a binary PPM (P6) payload — dimensions come from the parsed
    * header and the pixel sum/mean from the sample bytes.
    */
  def decodePpm(row: MediaRow): PpmMeta = {
    val b = row.media
    val hd = parsePpmHeader(b, row.doc_id)
    val n = hd.w * hd.h * 3
    var s = 0L
    var j = hd.dataOff
    while (j < b.length) { s += b(j) & 0xff; j += 1 }
    PpmMeta(row.doc_id, hd.w, hd.h, "ppm", b.length.toLong, s, s.toDouble / n)
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

  /** Typed decode output of a PCM WAV payload: format fields from the
    * parsed RIFF header, amplitude statistics from the raw little-endian
    * 16-bit samples.
    */
  final case class WavMeta(doc_id: Long, n_channels: Int, sample_rate: Int,
                           n_frames: Long, n_bytes: Long,
                           amp_sum: Long, amp_peak: Int, duration_s: Double)

  /** Parse a canonical 44-byte-header PCM WAV (RIFF/WAVE, fmt 16, 16-bit)
    * payload — the second real decoder behind the multimodal seam, and the
    * audio counterpart to decodePpm: every field is read from the actual
    * bytes (little-endian, as the wire format specifies), internal size
    * fields are cross-checked against the payload length, and the
    * amplitude stats come from the decoded signed samples. Malformed
    * payloads fail loudly.
    */
  def decodeWav(row: MediaRow): WavMeta = {
    val b = row.media
    def u16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def u32(o: Int): Long =
      ((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16)).toLong |
        ((b(o + 3) & 0xffL) << 24)
    def tag(o: Int): String = new String(b, o, 4, "US-ASCII")
    require(b.length >= 44, s"WAV: payload too short in doc ${row.doc_id}")
    require(tag(0) == "RIFF" && tag(8) == "WAVE",
      s"WAV: bad RIFF/WAVE magic in doc ${row.doc_id}")
    require(u32(4) == b.length - 8, s"WAV: RIFF size mismatch in doc ${row.doc_id}")
    require(tag(12) == "fmt " && u32(16) == 16,
      s"WAV: missing 16-byte fmt chunk in doc ${row.doc_id}")
    require(u16(20) == 1, s"WAV: not PCM in doc ${row.doc_id}")
    val ch = u16(22)
    val rate = u32(24).toInt
    val bits = u16(34)
    require(bits == 16, s"WAV: unsupported bit depth $bits in doc ${row.doc_id}")
    require(u16(32) == ch * 2, s"WAV: block align mismatch in doc ${row.doc_id}")
    require(u32(28) == rate.toLong * ch * 2, s"WAV: byte rate mismatch in doc ${row.doc_id}")
    require(tag(36) == "data", s"WAV: missing data chunk in doc ${row.doc_id}")
    val dataSize = u32(40).toInt
    require(b.length - 44 == dataSize && dataSize % (2 * ch) == 0,
      s"WAV: data size mismatch in doc ${row.doc_id}")
    val n = dataSize / 2
    var i = 0
    var sum = 0L
    var peak = 0
    while (i < n) {
      val v = (((b(44 + 2 * i) & 0xff) | (b(45 + 2 * i) << 8)).toShort).toInt
      sum += v
      val a = if (v < 0) -v else v
      if (a > peak) peak = a
      i += 1
    }
    val frames = n / ch
    WavMeta(row.doc_id, ch, rate, frames.toLong, b.length.toLong,
      sum, peak, frames.toDouble / rate)
  }

  /** Deterministic PCM WAV fixture for a doc id: channel count, sample
    * rate and frame count derived from the id, interleaved 16-bit samples
    * from `((id*37 + i*101) % 65536) - 32768`. The oracle recomputes the
    * stats analytically from the formula; the decoder only ever sees the
    * serialized RIFF bytes.
    */
  def wavFixture(docId: Long): MediaRow = {
    val ch = (docId % 2).toInt + 1
    val rate = 8000 + (docId % 4).toInt * 4000
    val frames = (docId % 50).toInt + 10
    val n = frames * ch
    val dataSize = n * 2
    val out = new Array[Byte](44 + dataSize)
    def w16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def w32(o: Int, v: Long): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte; out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    def wtag(o: Int, s: String): Unit =
      System.arraycopy(s.getBytes("US-ASCII"), 0, out, o, 4)
    wtag(0, "RIFF"); w32(4, 36L + dataSize); wtag(8, "WAVE")
    wtag(12, "fmt "); w32(16, 16L); w16(20, 1); w16(22, ch)
    w32(24, rate.toLong); w32(28, rate.toLong * ch * 2); w16(32, ch * 2); w16(34, 16)
    wtag(36, "data"); w32(40, dataSize.toLong)
    var i = 0
    while (i < n) {
      val v = ((docId * 37 + i.toLong * 101) % 65536).toInt - 32768
      w16(44 + 2 * i, v & 0xffff)
      i += 1
    }
    MediaRow(docId, out)
  }

  /** Nearest-neighbor half-scale resize of a binary PPM (P6) payload — a
    * REAL image transform over the real wire format, both directions: the
    * input bytes are parsed (header + samples), the output is a genuine P6
    * payload any netpbm tool reads. Output dims are ceil(w/2) × ceil(h/2);
    * output pixel (x, y) samples source pixel (2x, 2y) — the standard
    * nearest-neighbor decimation. Runs per-row inside `mapPartitions`
    * (decodeAll), so a 100 TB image corpus resizes map-only: no shuffle,
    * partitioning preserved end-to-end.
    */
  def resizePpmHalf(row: MediaRow): MediaRow = {
    val b = row.media
    val hd = parsePpmHeader(b, row.doc_id)
    val w = hd.w; val h = hd.h; val i = hd.dataOff
    val w2 = (w + 1) / 2
    val h2 = (h + 1) / 2
    val header = s"P6\n$w2 $h2\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w2 * h2 * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        val src = i + ((y * 2) * w + x * 2) * 3
        val dst = header.length + (y * w2 + x) * 3
        out(dst) = b(src); out(dst + 1) = b(src + 1); out(dst + 2) = b(src + 2)
        x += 1
      }
      y += 1
    }
    MediaRow(row.doc_id, out)
  }

  /** Typed audio features of a PCM WAV payload, channel 0: exact integer
    * energy (sum of squares), quantized RMS, zero-crossing count, peak.
    * All-BIGINT so any engine reproduces them bit-for-bit (`rms_q` =
    * floor(sqrt(sumsq div n)) — integer division then a correctly-rounded
    * IEEE sqrt, deterministic cross-engine; a raw double RMS would hash on
    * its last ulp).
    */
  final case class WavFeatures(doc_id: Long, n_frames: Long, amp_sumsq: Long,
                               rms_q: Long, zcr: Long, amp_peak: Int)

  /** Feature extraction over a PCM WAV payload — the audio counterpart of
    * resizePpmHalf: parses the RIFF header (same validation as decodeWav),
    * then computes channel-0 energy / RMS / zero-crossings / peak from the
    * decoded signed samples. Map-only per row; a real feature extractor
    * (mel filterbank, VAD) slots into the same per-partition seam.
    */
  def wavFeatures(row: MediaRow): WavFeatures = {
    val b = row.media
    def u16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def u32(o: Int): Long =
      ((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16)).toLong |
        ((b(o + 3) & 0xffL) << 24)
    def tag(o: Int): String = new String(b, o, 4, "US-ASCII")
    require(b.length >= 44 && tag(0) == "RIFF" && tag(8) == "WAVE",
      s"WAV: bad RIFF/WAVE magic in doc ${row.doc_id}")
    require(tag(12) == "fmt " && u32(16) == 16 && u16(20) == 1 && u16(34) == 16,
      s"WAV: not 16-bit PCM in doc ${row.doc_id}")
    val ch = u16(22)
    require(tag(36) == "data", s"WAV: missing data chunk in doc ${row.doc_id}")
    val dataSize = u32(40).toInt
    require(b.length - 44 == dataSize && dataSize % (2 * ch) == 0,
      s"WAV: data size mismatch in doc ${row.doc_id}")
    val frames = dataSize / 2 / ch
    var j = 0
    var sumsq = 0L
    var zcr = 0L
    var peak = 0
    var prev = 0
    while (j < frames) {
      val o = 44 + 2 * (j * ch) // channel 0 of frame j
      val v = (((b(o) & 0xff) | (b(o + 1) << 8)).toShort).toInt
      sumsq += v.toLong * v
      if (j > 0 && (v < 0) != (prev < 0)) zcr += 1
      val a = if (v < 0) -v else v
      if (a > peak) peak = a
      prev = v
      j += 1
    }
    val rmsQ = if (frames == 0) 0L else math.floor(math.sqrt((sumsq / frames).toDouble)).toLong
    WavFeatures(row.doc_id, frames.toLong, sumsq, rmsQ, zcr, peak)
  }

  /** 64-bit perceptual signature of an image, packed as two 32-bit words
    * (`dhash_lo` bits 0-31, `dhash_hi` bits 32-63) — the e7b sign-word
    * layout, so the same pigeonhole band join does image near-dup.
    */
  final case class DHashRow(doc_id: Long, width: Int, height: Int,
                            dhash_lo: Long, dhash_hi: Long)

  /** Difference-hash (dHash) of a binary PPM payload — the standard cheap
    * perceptual image fingerprint: sample a 9×8 luminance grid by nearest
    * neighbor (the fast-resize kernel, same family as resizePpmHalf), set
    * bit r*8+c iff luminance increases left→right between adjacent grid
    * samples of row r. Horizontal-gradient structure survives global
    * brightness/contrast shifts (a uniform luma offset flips no
    * comparison), which is what makes dHash a NEAR-dup key rather than an
    * exact-byte digest. Luminance is the exact integer channel sum
    * (0-765) — no rounding, so any engine reproduces the bits.
    *
    * Map-only per row like every decoder here; at 100 TB the signature
    * computation rides the ingest scan and only the 16-byte signatures
    * ever reach a shuffle (the banded near-dup join in m8).
    */
  def dHashPpm(row: MediaRow): DHashRow = {
    val b = row.media
    val hd = parsePpmHeader(b, row.doc_id)
    val w = hd.w; val h = hd.h; val off = hd.dataOff
    def luma(x: Int, y: Int): Int = {
      val p = off + (y * w + x) * 3
      (b(p) & 0xff) + (b(p + 1) & 0xff) + (b(p + 2) & 0xff)
    }
    var lo = 0L
    var hi = 0L
    var r = 0
    while (r < 8) {
      val gy = r * h / 8
      var c = 0
      while (c < 8) {
        if (luma((c + 1) * w / 9, gy) > luma(c * w / 9, gy)) {
          val k = r * 8 + c
          if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
        }
        c += 1
      }
      r += 1
    }
    DHashRow(row.doc_id, w, h, lo, hi)
  }

  /** Deterministic P6 fixture for the perceptual-hash gates (m7/m8).
    * Distinct from `ppmFixture` on purpose: dHash needs images large
    * enough that every 9×8 grid sample hits a distinct pixel (the m3
    * fixture's 1-16 px images collapse to degenerate all-zero hashes), so
    * dims run 17-32, and the byte pattern carries a per-doc multiplier
    * plus a quadratic term — without it, two affine images of the same
    * shape differ by a near-constant offset and hash identically, turning
    * the near-dup gate into a quadratic all-match. Measured on this
    * pattern: zero cross-doc collisions at 5,000 docs.
    */
  def dhashFixture(docId: Long): MediaRow = {
    val w = 17 + (docId % 16).toInt
    val h = 17 + ((docId / 16) % 16).toInt
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val n = w * h * 3
    val out = new Array[Byte](header.length + n)
    System.arraycopy(header, 0, out, 0, header.length)
    val m = (docId % 97) + 3
    var i = 0
    while (i < n) {
      out(header.length + i) =
        ((docId * 131 + i * m + (i.toLong * i) % 251) % 256).toByte
      i += 1
    }
    MediaRow(docId, out)
  }

  /** Near-duplicate twin of `dhashFixture(docId)`: same image with one
    * horizontal stripe (source row docId % h) brightness-flipped by +128
    * mod 256. Only grid rows that sample the perturbed stripe can change,
    * so the twin lands within hamming 8 of its base (0 when the stripe
    * falls between grid samples) — the guaranteed-detectable pairs the m8
    * gate asserts on. Twin ids live at +`DHashTwinIdOffset` — 2^40, far
    * above any synthesized probe corpus's id space (the scale probe
    * offsets copies by max(doc_id)+1 per copy; a small offset like 10^6
    * would collide with copy ids past ~200x).
    */
  val DHashTwinIdOffset = 1L << 40

  def dhashTwinFixture(docId: Long): MediaRow = {
    val base = dhashFixture(docId)
    val b = base.media
    val hd = parsePpmHeader(b, docId)
    val y0 = (docId % hd.h).toInt
    val from = hd.dataOff + y0 * hd.w * 3
    var i = from
    while (i < from + hd.w * 3) {
      b(i) = (((b(i) & 0xff) + 128) % 256).toByte
      i += 1
    }
    MediaRow(docId + DHashTwinIdOffset, b)
  }

  /** Payload for the m1 mixed-corpus metadata gate: ids cycle through the
    * two real wire-format fixtures (P6 PPM, RIFF/WAVE PCM) and raw text
    * bytes — so the metadata pass sees a corpus where format is a property
    * of the BYTES, not of any column the pipeline could cheat from.
    */
  def mixedFixture(docId: Long, text: String): MediaRow =
    (docId % 3) match {
      case 0 => ppmFixture(docId)
      case 1 => wavFixture(docId)
      case _ => MediaRow(docId, text.getBytes("UTF-8"))
    }

  /** Content-derived format sniff over the payload's magic bytes — what a
    * real media pipeline dispatches decoders on (never a filename, never a
    * hash): "P6" + one whitespace byte → ppm; "RIFF" with "WAVE" at offset
    * 8 → wav; anything else stays opaque binary. Pure codegen'd column
    * functions, so the sniff rides any 100 TB scan for free.
    */
  def sniffFormat(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val m2 = upper(hex(substring(payload, 1, 2)))
    val ws3 = upper(hex(substring(payload, 3, 1)))
    val riff = upper(hex(substring(payload, 1, 4)))
    val wave = upper(hex(substring(payload, 9, 4)))
    when(m2 === "5036" && ws3.isin("0A", "20", "09", "0D"), "ppm")
      .when(riff === "52494646" && wave === "57415645", "wav")
      .otherwise("bin")
  }

  /** Spread a small id/manifest dataset across the cluster BEFORE
    * per-payload work fans out from it. A media manifest is bytes-tiny
    * while its decode cost is proportional to the payloads it names: read
    * from a handful of manifest files, every downstream map/join inherits
    * the scan's partition count — often 1 — which serializes not just the
    * decode but everything derived from it (measured: m8's 157M-candidate
    * band join ran single-threaded off a one-file id scan, 82 s at the
    * 10× probe; the spread restores all-cores parallelism for a shuffle
    * of ids alone). The same seam at 100 TB: repartition the manifest,
    * never the decoded payloads.
    */
  def spreadManifest[T](ds: Dataset[T]): Dataset[T] =
    ds.repartition(ds.sparkSession.sparkContext.defaultParallelism)

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
