package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.ops.Multimodal.{MediaRow, PpmMeta}

/** Test double standing in for a codec this environment lacks — the retired
  * hash-derived stub, now living only in tests to exercise the generic
  * decodeAll seam with a second decoder type. (Top-level: a spec-nested
  * case class can't get a clean product Encoder.)
  */
final case class FakeMeta(doc_id: Long, format: String, n_bytes: Long)

object FakeCodec {
  // top-level (not a spec method): the decode closure ships to executors,
  // and a spec-bound method would drag the non-serializable suite with it
  def decode(row: MediaRow): FakeMeta =
    FakeMeta(row.doc_id,
      Multimodal.Formats((Multimodal.h60(new String(row.media, "UTF-8")) % 3L).toInt),
      row.media.length.toLong)
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodePpm parses a hand-written P6 payload byte-for-byte") {
    // 2x1 image, samples 10,20,30 / 250,251,252 — written out by hand, so
    // this checks the parser against the PPM spec rather than against the
    // fixture builder.
    val bytes = "P6\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 250.toByte, 251.toByte, 252.toByte)
    val m = Multimodal.decodePpm(MediaRow(3L, bytes))
    assert(m == PpmMeta(3L, 2, 1, "ppm", bytes.length.toLong,
      10 + 20 + 30 + 250 + 251 + 252, (10 + 20 + 30 + 250 + 251 + 252) / 6.0))
  }

  test("decodePpm round-trips the fixture and matches its formula") {
    for (id <- Seq(0L, 7L, 16L, 255L, 511L)) {
      val m = Multimodal.decodePpm(Multimodal.ppmFixture(id))
      val w = (id % 16).toInt + 1
      val h = ((id / 16) % 16).toInt + 1
      assert(m.width == w && m.height == h && m.format == "ppm")
      val expSum = (0 until w * h * 3).map(i => (id * 131 + i * 7) % 256).sum
      assert(m.px_sum == expSum, s"id=$id")
      assert(m.n_bytes == Multimodal.ppmFixture(id).media.length.toLong)
    }
  }

  test("decodePpm rejects malformed payloads loudly") {
    // bad magic
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm(MediaRow(1L, "P5\n1 1\n255\n...".getBytes("US-ASCII")))
    }
    // truncated samples
    val short = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm(MediaRow(2L, short))
    }
    // unsupported maxval
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm(MediaRow(3L, ("P6\n1 1\n65535\n" + "xxxxxx").getBytes("US-ASCII")))
    }
  }

  test("decodeWav parses a hand-written PCM payload byte-for-byte") {
    // 1 channel, 8000 Hz, 3 frames: samples +1, -2, +32767 — serialized
    // by hand against the RIFF spec, independent of the fixture builder.
    val data = Array[Byte](
      0x01, 0x00, // +1
      0xfe.toByte, 0xff.toByte, // -2
      0xff.toByte, 0x7f) // +32767
    val hdr = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hdr.put("RIFF".getBytes("US-ASCII")).putInt(36 + 6).put("WAVE".getBytes("US-ASCII"))
    hdr.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(1)
    hdr.putInt(8000).putInt(16000).putShort(2).putShort(16)
    hdr.put("data".getBytes("US-ASCII")).putInt(6)
    val m = Multimodal.decodeWav(MediaRow(5L, hdr.array() ++ data))
    assert(m.n_channels == 1 && m.sample_rate == 8000 && m.n_frames == 3L)
    assert(m.amp_sum == 1L - 2L + 32767L)
    assert(m.amp_peak == 32767)
    assert(m.duration_s == 3.0 / 8000)
  }

  test("decodeWav round-trips the fixture and matches its formula") {
    for (id <- Seq(0L, 1L, 13L, 49L, 777L)) {
      val m = Multimodal.decodeWav(Multimodal.wavFixture(id))
      val ch = (id % 2).toInt + 1
      val frames = (id % 50).toInt + 10
      assert(m.n_channels == ch && m.sample_rate == 8000 + (id % 4).toInt * 4000)
      assert(m.n_frames == frames.toLong, s"id=$id")
      val vs = (0 until frames * ch).map(i => ((id * 37 + i * 101) % 65536).toInt - 32768)
      assert(m.amp_sum == vs.map(_.toLong).sum, s"id=$id")
      assert(m.amp_peak == vs.map(math.abs).max, s"id=$id")
      assert(m.n_bytes == 44L + frames * ch * 2)
    }
  }

  test("decodeWav rejects malformed payloads loudly") {
    val good = Multimodal.wavFixture(3L).media
    // bad magic
    val badMagic = good.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav(MediaRow(1L, badMagic))
    }
    // truncated data
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav(MediaRow(2L, good.dropRight(2)))
    }
    // internal size field inconsistent with payload
    val badSize = good.clone(); badSize(40) = (badSize(40) + 2).toByte
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav(MediaRow(3L, badSize))
    }
  }

  test("decodeAll preserves rows and partitioning through mapPartitions") {
    val media = spark.range(100)
      .select(col("id").as("doc_id"))
      .as[Long].map(Multimodal.ppmFixture _)
      .repartition(7)
    val out = Multimodal.decodeAll(spark, media, Multimodal.decodePpm)
    assert(out.count() == 100)
    assert(out.rdd.getNumPartitions == 7) // mapPartitions is partition-preserving
    assert(out.select("doc_id").distinct().count() == 100)
    assert(out.where(col("format") === "ppm").count() == 100)
  }

  test("sniffFormat dispatches on payload magic bytes, not provenance") {
    val rows = Seq(
      (0L, Multimodal.ppmFixture(48L).media),            // "P6\n..."
      (1L, Multimodal.wavFixture(7L).media),             // RIFF....WAVE
      (2L, "plain text payload".getBytes("UTF-8")),      // opaque
      (3L, "RIFFxxxxJUNK padded".getBytes("UTF-8")),     // RIFF but not WAVE
      (4L, "P6without-whitespace".getBytes("UTF-8")),    // P6 but no ws byte
      (5L, Array[Byte]('P', '6', ' ', '1'))              // P6 + space ws
    ).toDF("doc_id", "payload")
    val got = rows.select(col("doc_id"),
        Multimodal.sniffFormat(col("payload")).as("format"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(0L -> "ppm", 1L -> "wav", 2L -> "bin",
      3L -> "bin", 4L -> "bin", 5L -> "ppm"))
  }

  test("resizePpmHalf nearest-neighbor samples a hand-written 3x3 image") {
    // 3x3, pixel (x,y) has RGB (10x, 10y, x+y) — a 2x2 output must sample
    // exactly source pixels (0,0),(2,0),(0,2),(2,2); anything else (a
    // box-filter, an off-by-one grid) produces different bytes.
    val px = for (y <- 0 until 3; x <- 0 until 3;
                  v <- Seq(10 * x, 10 * y, x + y)) yield v.toByte
    val in = MediaRow(9L, "P6\n3 3\n255\n".getBytes("US-ASCII") ++ px.toArray)
    val out = Multimodal.resizePpmHalf(in)
    val expPx = for ((x, y) <- Seq((0, 0), (2, 0), (0, 2), (2, 2));
                     v <- Seq(10 * x, 10 * y, x + y)) yield v.toByte
    assert(out.media.sameElements(
      "P6\n2 2\n255\n".getBytes("US-ASCII") ++ expPx.toArray))
    // and the output is itself a well-formed PPM the decoder accepts
    val m = Multimodal.decodePpm(out)
    assert(m.width == 2 && m.height == 2)
  }

  test("resizePpmHalf handles degenerate and odd dimensions") {
    // 1x1 resizes to itself (ceil semantics); odd dims keep the last row/col
    val one = MediaRow(1L, "P6\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](7, 8, 9))
    assert(Multimodal.resizePpmHalf(one).media.sameElements(one.media))
    for (id <- Seq(0L, 5L, 16L, 254L, 511L)) {
      val m = Multimodal.decodePpm(Multimodal.resizePpmHalf(Multimodal.ppmFixture(id)))
      val w = (id % 16).toInt + 1; val h = ((id / 16) % 16).toInt + 1
      assert(m.width == (w + 1) / 2 && m.height == (h + 1) / 2, s"id=$id")
      // expected sum from the fixture formula + the NN sampling map
      val exp = (for (y <- 0 until (h + 1) / 2; x <- 0 until (w + 1) / 2; c <- 0 until 3)
        yield (id * 131 + ((y * 2 * w + x * 2) * 3 + c) * 7) % 256).sum
      assert(m.px_sum == exp, s"id=$id")
    }
  }

  test("wavFeatures computes channel-0 energy/zcr/peak on a crafted signal") {
    // mono 4-sample signal 100, -50, 25, -25: 3 sign flips, peak 100,
    // sumsq 10000+2500+625+625 = 13750, rms_q = floor(sqrt(13750/4 = 3437)) = 58
    val data = Array(100, -50, 25, -25)
    val hdr = java.nio.ByteBuffer.allocate(44 + 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hdr.put("RIFF".getBytes("US-ASCII")).putInt(36 + 8).put("WAVE".getBytes("US-ASCII"))
    hdr.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(1)
    hdr.putInt(8000).putInt(16000).putShort(2).putShort(16)
    hdr.put("data".getBytes("US-ASCII")).putInt(8)
    data.foreach(v => hdr.putShort(v.toShort))
    val f = Multimodal.wavFeatures(MediaRow(4L, hdr.array()))
    assert(f.n_frames == 4L && f.amp_sumsq == 13750L)
    assert(f.zcr == 3L && f.amp_peak == 100 && f.rms_q == 58L)
  }

  test("wavFeatures reads channel 0 of interleaved stereo, not the stream") {
    // stereo: ch0 = [1000, -1000], ch1 = [30000, 30000]. A stride bug that
    // reads the interleaved stream would see peak 30000 and zcr 2.
    val samples = Array(1000, 30000, -1000, 30000)
    val hdr = java.nio.ByteBuffer.allocate(44 + 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hdr.put("RIFF".getBytes("US-ASCII")).putInt(36 + 8).put("WAVE".getBytes("US-ASCII"))
    hdr.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(2)
    hdr.putInt(8000).putInt(32000).putShort(4).putShort(16)
    hdr.put("data".getBytes("US-ASCII")).putInt(8)
    samples.foreach(v => hdr.putShort(v.toShort))
    val f = Multimodal.wavFeatures(MediaRow(6L, hdr.array()))
    assert(f.n_frames == 2L && f.amp_peak == 1000 && f.zcr == 1L)
    assert(f.amp_sumsq == 2L * 1000L * 1000L)
  }

  test("dHashPpm is invariant under global brightness shift") {
    // The perceptual property that distinguishes dHash from a byte digest:
    // adding a uniform offset to every sample (no wraparound) shifts every
    // luminance equally, so no left-right comparison flips and the hash is
    // bit-identical — while the byte payloads differ everywhere.
    val hdrLen = "P6\n12 10\n255\n".length
    val base = "P6\n12 10\n255\n".getBytes("US-ASCII") ++
      Array.tabulate(12 * 10 * 3)(i => ((i * 37) % 200).toByte)
    val brighter = base.clone()
    for (i <- hdrLen until brighter.length)
      brighter(i) = ((brighter(i) & 0xff) + 40).toByte // 0..199 -> 40..239
    val h1 = Multimodal.dHashPpm(MediaRow(1L, base))
    val h2 = Multimodal.dHashPpm(MediaRow(1L, brighter))
    assert((h1.dhash_lo, h1.dhash_hi) == (h2.dhash_lo, h2.dhash_hi))
    assert(!java.util.Arrays.equals(base, brighter))
  }

  test("dHashPpm matches the generative formula bit-for-bit") {
    for (id <- Seq(0L, 8L, 95L, 255L, 499L)) {
      val row = Multimodal.dhashFixture(id)
      val got = Multimodal.dHashPpm(row)
      val w = 17 + (id % 16).toInt
      val h = 17 + ((id / 16) % 16).toInt
      val m = (id % 97) + 3
      def luma(x: Int, y: Int): Long = (0 to 2).map { ch =>
        val i = (y * w + x) * 3 + ch
        (id * 131 + i * m + (i.toLong * i) % 251) % 256
      }.sum
      var lo = 0L; var hi = 0L
      for (r <- 0 until 8; c <- 0 until 8)
        if (luma((c + 1) * w / 9, r * h / 8) > luma(c * w / 9, r * h / 8)) {
          val k = r * 8 + c
          if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
        }
      assert(got == Multimodal.DHashRow(id, w, h, lo, hi), s"id=$id")
    }
  }

  test("dhashTwinFixture lands within hamming 8 of its base") {
    for (id <- 0L until 256L by 8L) {
      val b = Multimodal.dHashPpm(Multimodal.dhashFixture(id))
      val t = Multimodal.dHashPpm(Multimodal.dhashTwinFixture(id))
      assert(t.doc_id == id + Multimodal.DHashTwinIdOffset)
      val ham = java.lang.Long.bitCount(b.dhash_lo ^ t.dhash_lo) +
        java.lang.Long.bitCount(b.dhash_hi ^ t.dhash_hi)
      assert(ham <= 8, s"id=$id ham=$ham")
    }
  }

  test("decodeAll is decoder-generic: the codec test double plugs in") {
    val media = spark.range(20)
      .select(col("id").as("doc_id"), concat(lit("payload-"), col("id")).cast("binary").as("media"))
      .as[MediaRow]
    val out = Multimodal.decodeAll(spark, media, FakeCodec.decode)
    assert(out.count() == 20)
    assert(out.where(col("format").isin(Multimodal.Formats: _*)).count() == 20)
  }
}
