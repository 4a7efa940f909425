package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Multimodal, Relational}

/** Event-stream batch analytics (JSON extraction, gap sessionization) and
  * multimodal binary-column plumbing. `ts` is decoded to epoch-µs through
  * the schema-adaptive `Tables.eventTimeUs` seam (TIMESTAMP(µs) canonical,
  * legacy INT64-nanos accepted); the oracle uses epoch_us on its side.
  */
object EventQueries {

  /** m8's hamming threshold — ≤ bands-1 (8 for the 9-band layout), so the
    * pigeonhole band join is COMPLETE and the oracle needs no band
    * predicate: band-join result ≡ brute-force pair scan.
    */
  val M8MaxHamming = 8

  /** DuckDB luma at fixture sample index `i` (a channel-triple start) —
    * the exact integer channel sum of the m7 generative byte formula
    * `(doc_id*131 + i*m + i²%251) % 256`, with the twin stripe's +128
    * (`delta`, "0" for base images) applied inside each channel's mod.
    */
  private def dLum(i: String, delta: String): String =
    (0 to 2).map { ch =>
      val s = s"($i + $ch)"
      s"(doc_id*131 + $s*m + ($s*$s) % 251 + $delta) % 256"
    }.mkString("(", " + ", ")")

  /** Shared dHash oracle pipeline over an id relation carrying `doc_id`
    * (+ optionally `img_id`/`tw` for the twin corpus): dims → 64 grid
    * bits → sampled luma pair per bit → packed two-word signature. Mirrors
    * `Multimodal.dHashPpm` bit-for-bit from the generative formula.
    */
  private def dHashSql(idsCte: String, idCol: String, twDelta: String): String = {
    val idSel = if (idCol == "doc_id") "doc_id" else s"$idCol, doc_id"
    idsCte +
      s"dims AS (SELECT $idSel, tw, (17 + doc_id % 16)::BIGINT w, " +
      "(17 + (doc_id // 16) % 16)::BIGINT h, (doc_id % 97 + 3)::BIGINT m FROM ids), " +
      s"g AS (SELECT $idSel, tw, w, h, m, k, k // 8 AS r, k % 8 AS c " +
      "FROM dims, unnest(range(0, 64)) u(k)), " +
      s"p AS (SELECT $idSel, w, h, m, k, " +
      "(((r * h) // 8) * w + (c * w) // 9) * 3 AS i1, " +
      "(((r * h) // 8) * w + ((c + 1) * w) // 9) * 3 AS i2, " +
      s"$twDelta AS dlt FROM g), " +
      s"l AS (SELECT $idCol, w, h, k, ${dLum("i1", "dlt")} AS lum1, " +
      s"${dLum("i2", "dlt")} AS lum2 FROM p), " +
      s"hsh AS (SELECT $idCol, any_value(w) AS w, any_value(h) AS h, " +
      "coalesce(sum(CASE WHEN k < 32 AND lum2 > lum1 THEN (1::BIGINT << k) ELSE 0 END), 0)::BIGINT AS dhash_lo, " +
      "coalesce(sum(CASE WHEN k >= 32 AND lum2 > lum1 THEN (1::BIGINT << (k - 32)) ELSE 0 END), 0)::BIGINT AS dhash_hi " +
      s"FROM l GROUP BY $idCol) "
  }

  /** Base-corpus dHash CTEs (m7): one signature per document id. */
  private def dHashCtes(table: String): String =
    dHashSql(s"WITH ids AS (SELECT doc_id, 0::BIGINT AS tw FROM $table), ",
      "doc_id", "0")

  /** Twin-corpus dHash CTEs (m8): every base image plus the stripe-
    * perturbed twin of every 8th, twins at +2^40. The stripe delta
    * applies iff the bit's grid row samples the perturbed source row
    * (gy == doc_id % h).
    */
  private def dHashTwinCtes: String =
    dHashSql("WITH ids AS (SELECT doc_id, doc_id AS img_id, 0::BIGINT AS tw " +
      s"FROM documents UNION ALL SELECT doc_id, doc_id + ${Multimodal.DHashTwinIdOffset}, 1::BIGINT " +
      "FROM documents WHERE doc_id % 8 = 0), ",
      "img_id",
      "CASE WHEN tw = 1 AND (r * h) // 8 = doc_id % h THEN 128 ELSE 0 END")

  val all: Seq[(String, GQ)] = Seq(

    // Batch form of the stream-stream interval join (EventStreams.
    // clickAttribution, spec'd streaming==batch): attribute each purchase
    // to every click by the same user in the preceding hour. The SAME
    // function builds the batch plan here and the streaming plan in
    // production — this gate pins its values against the oracle, and the
    // StreamingSpec restart case pins the state semantics. Timestamps are
    // compared as epoch-µs decoded through the schema-adaptive
    // Tables.eventTimeUs seam (the oracle's epoch_us reads the same
    // values) — the cross-engine-exact representation.
    "ev_click_attribution" -> GQ(
      (s, d) => graft.streaming.EventStreams.clickAttribution(
          Tables.load(s, d, "events"), Tables.load(s, d, "events"))
        .select(col("purchase_id"), col("user_id"), col("click_id"),
          unix_micros(col("purchase_time")).as("purchase_us"),
          unix_micros(col("click_time")).as("click_us")),
      "WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) us FROM events), " +
        "c AS (SELECT user_id cu, event_id click_id, us click_us FROM e " +
        "WHERE event_type = 'click'), " +
        "p AS (SELECT user_id, event_id purchase_id, us purchase_us FROM e " +
        "WHERE event_type = 'purchase') " +
        "SELECT purchase_id, user_id, click_id, purchase_us, click_us " +
        "FROM p JOIN c ON user_id = cu AND click_us <= purchase_us " +
        "AND click_us >= purchase_us - 3600000000"),

    // JSON property extraction — per-row, pushdown-friendly projection.
    "ev_json_extract" -> GQ(
      (s, d) => Tables.load(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("prop_k")),
      "SELECT event_id, json_extract_string(props, '$.k')::INT AS prop_k FROM events"),

    // Gap-based sessionization (30-min inactivity gap), the batch analog of
    // streaming session windows: lag -> new-session flag -> running sum as
    // session index -> per-session rollup. One shuffle by user_id; sessions
    // of one user stay on one partition — the layout a cluster wants.
    "ev_sessionize" -> GQ(
      (s, d) => {
        val gapUs = 1800L * 1000000L
        val w = Window.partitionBy(col("user_id")).orderBy(col("tus"))
        val ev = Tables.load(s, d, "events")
        ev.withColumn("tus", Tables.eventTimeUs(ev))
          .withColumn("new_sess",
            when(lag(col("tus"), 1).over(w).isNull ||
              col("tus") - lag(col("tus"), 1).over(w) > gapUs, 1L).otherwise(0L))
          .withColumn("session_idx", sum(col("new_sess")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("session_idx"))
          .agg(count(lit(1)).as("n_events"),
            min(col("tus")).as("start_us"),
            max(col("tus")).as("end_us"),
            round(sum(col("value")), 2).as("session_value"))
          .withColumn("duration_s", ((col("end_us") - col("start_us")) / 1000000L).cast("long"))
      },
      "WITH e AS (SELECT user_id, epoch_us(ts) tus, value FROM events), " +
        "flagged AS (SELECT user_id, tus, value, CASE WHEN " +
        "lag(tus) OVER (PARTITION BY user_id ORDER BY tus) IS NULL OR " +
        "tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus) > 1800000000 " +
        "THEN 1 ELSE 0 END new_sess FROM e), " +
        "sess AS (SELECT user_id, tus, value, sum(new_sess) OVER " +
        "(PARTITION BY user_id ORDER BY tus ROWS UNBOUNDED PRECEDING) session_idx " +
        "FROM flagged) " +
        "SELECT user_id, session_idx::BIGINT AS session_idx, count(*) AS n_events, " +
        "min(tus) AS start_us, max(tus) AS end_us, round(sum(value), 2) AS session_value, " +
        "((max(tus) - min(tus)) // 1000000)::BIGINT AS duration_s " +
        "FROM sess GROUP BY 1, 2"),

    // EV-FUNNEL — ordered event-sequence funnel (click → view → purchase,
    // each step within 24 h of the previous) — the sequential-pattern
    // operator product analytics runs. Semantics are FIRST-TOUCH GREEDY:
    // t1 = first click, t2 = first view in [t1, t1+24h], t3 = first
    // purchase in [t2, t2+24h]. Each step anchors on the EARLIEST
    // qualifying event and never re-anchors — a later view whose window
    // would have reached a purchase does not resurrect the chain, so this
    // reports the first-touch path (the standard attribution convention),
    // NOT maximal-chain existence (that variant needs per-user ordered
    // scan state — a different operator)
    // (the 24 h step horizon populates every reachable depth on this
    // corpus: 103/28/19 users at depths 1/2/3 of 150 at sf0.01 — a 1 h
    // horizon left depth 3 empty, a weaker gate).
    // Shape: THREE chained full-partition window mins over the SAME
    // user_id partitioning — Spark plans one shuffle and reuses it (no
    // joins, no per-event state); each step's predicate reads the previous
    // step's per-user constant. At 100 TB users partition the work and a
    // user's events fit one partition — the same contract ev_sessionize
    // rides.
    "ev_funnel" -> GQ(
      (s, d) => {
        val horizonUs = 86400L * 1000000L
        val raw = Tables.load(s, d, "events")
        val ev = raw.select(col("user_id"), col("event_type"),
          Tables.eventTimeUs(raw).as("tus"))
        val wu = Window.partitionBy("user_id")
        val s3 = ev
          .withColumn("t1", min(when(col("event_type") === "click",
            col("tus"))).over(wu))
          .withColumn("t2", min(when(col("event_type") === "view" &&
            col("tus") >= col("t1") && col("tus") <= col("t1") + horizonUs,
            col("tus"))).over(wu))
          .withColumn("t3", min(when(col("event_type") === "purchase" &&
            col("tus") >= col("t2") && col("tus") <= col("t2") + horizonUs,
            col("tus"))).over(wu))
        s3.groupBy(col("user_id"))
          .agg(max(col("t1")).as("t1x"), max(col("t2")).as("t2x"),
            max(col("t3")).as("t3x"))
          .select(col("user_id"),
            coalesce(col("t1x"), lit(-1L)).as("click_us"),
            coalesce(col("t2x"), lit(-1L)).as("view_us"),
            coalesce(col("t3x"), lit(-1L)).as("purchase_us"),
            when(col("t3x").isNotNull, 3L).when(col("t2x").isNotNull, 2L)
              .when(col("t1x").isNotNull, 1L).otherwise(0L).as("funnel_depth"))
      },
      "WITH e AS (SELECT user_id, event_type, epoch_us(ts) tus FROM events), " +
        "s1 AS (SELECT *, min(CASE WHEN event_type = 'click' THEN tus END) " +
        "OVER (PARTITION BY user_id) t1 FROM e), " +
        "s2 AS (SELECT *, min(CASE WHEN event_type = 'view' AND tus >= t1 " +
        "AND tus <= t1 + 86400000000 THEN tus END) OVER (PARTITION BY user_id) t2 FROM s1), " +
        "s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND tus >= t2 " +
        "AND tus <= t2 + 86400000000 THEN tus END) OVER (PARTITION BY user_id) t3 FROM s2) " +
        "SELECT user_id, coalesce(max(t1), -1) AS click_us, " +
        "coalesce(max(t2), -1) AS view_us, coalesce(max(t3), -1) AS purchase_us, " +
        "(CASE WHEN max(t3) IS NOT NULL THEN 3 WHEN max(t2) IS NOT NULL THEN 2 " +
        "WHEN max(t1) IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS funnel_depth " +
        "FROM s3 GROUP BY user_id"),

    // J7 — as-of join: each purchase event picks up the user's most recent
    // click at or before it, looking back at most one hour — the "state as
    // of this event" enrichment every event pipeline runs (attribution,
    // last-config, last-tick). Bucketed one-sided band join + min_by
    // (Relational.asOfJoin): the shuffle key is (user, hour-bucket), never
    // a range predicate, and the arg-min partial-aggregates map-side.
    "j7_asof_join" -> GQ(
      (s, d) => {
        val raw = Tables.load(s, d, "events")
        val ev = raw.withColumn("tus", Tables.eventTimeUs(raw))
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("tus"))
        val clicks = ev.where(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("c_event_id"),
            col("tus").as("c_tus"))
        // unmatched probes keep left-join nulls in the operator; the GATE
        // coalesces them to -1 sentinels (the column-sorting comparator
        // can't order mixed null/non-null values)
        Relational.asOfJoin(purchases, "event_id", "tus",
            clicks, "c_tus", 3600L * 1000000L, Seq("user_id"), "c_event_id")
          .select(col("event_id"), col("user_id"), col("tus"),
            coalesce(col("c_event_id"), lit(-1L)).as("c_event_id"),
            coalesce(col("c_tus"), lit(-1L)).as("c_tus"),
            coalesce(((col("tus") - col("c_tus")) / 1000000L).cast("long"),
              lit(-1L)).as("gap_s"))
      },
      "WITH p AS (SELECT event_id, user_id, epoch_us(ts) tus FROM events " +
        "WHERE event_type = 'purchase'), " +
        "c AS (SELECT user_id, event_id c_event_id, epoch_us(ts) c_tus " +
        "FROM events WHERE event_type = 'click') " +
        "SELECT p.event_id, p.user_id, p.tus, " +
        "coalesce(c_event_id, -1) AS c_event_id, " +
        "coalesce(c_tus, -1) AS c_tus, " +
        "coalesce((p.tus - c_tus) // 1000000, -1) AS gap_s " +
        "FROM p LEFT JOIN c ON p.user_id = c.user_id AND c_tus <= p.tus " +
        "AND p.tus - c_tus <= 3600000000 " +
        "QUALIFY row_number() OVER (PARTITION BY p.event_id " +
        "ORDER BY c_tus DESC, c_event_id) = 1"),

    // X2 — PII pattern scrub: sequential regexp redaction of email /
    // IPv4 / digit-run patterns with per-pattern match counts — the
    // pre-training privacy scrub pass. Pure per-row projection (no
    // shuffle, whole-stage codegen'd regexes precompiled per task), so it
    // composes with any scan at 100 TB. Patterns are RE2-safe (no
    // lookaround) so any engine reproduces them; on this synthetic corpus
    // only digit runs fire, which the counts make visible. Each stage
    // scrubs the previous stage's output and counts on its own input, so
    // nothing double-counts (replacement tokens contain no digits).
    "x2_pii_scrub" -> GQ(
      (s, d) => graft.ops.TextOps.piiScrub(
        Tables.load(s, d, "events"), "event_id", "props"),
      "WITH s AS (SELECT event_id, props, " +
        "regexp_replace(props, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') s1 " +
        "FROM events), " +
        "s2t AS (SELECT *, regexp_replace(s1, '\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b', '<IP>', 'g') s2 FROM s), " +
        "s3t AS (SELECT *, regexp_replace(s2, '[0-9]+', '<NUM>', 'g') s3 FROM s2t) " +
        "SELECT event_id, " +
        "len(regexp_extract_all(props, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails, " +
        "len(regexp_extract_all(s1, '\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b')) AS n_ipv4, " +
        "len(regexp_extract_all(s2, '[0-9]+')) AS n_digit_runs, " +
        "s3 AS scrubbed, length(props) - length(s3) AS len_delta FROM s3t"),

    // M1 — multimodal metadata over a MIXED corpus: each doc id carries a
    // payload that is a real P6 PPM, a real RIFF/WAVE PCM, or raw text
    // bytes (Multimodal.mixedFixture cycles the three). Byte length, a
    // source-record digest, the magic-prefix hex, and a format SNIFFED
    // FROM THE PAYLOAD BYTES (Multimodal.sniffFormat — magic-byte
    // dispatch, the thing a real media pipeline keys decoders on). The
    // oracle recomputes everything analytically from the fixture formulas
    // (m3/m4's oracles pin the same generative constants) and mirrors the
    // sniff on the text branch — a sniffer that misread magic bytes
    // hash-mismatches.
    "m1_media_metadata" -> GQ(
      (s, d) => {
        import s.implicits._
        val media = Multimodal.spreadManifest(Tables.load(s, d, "documents")
          .select(col("doc_id"), col("text")).as[(Long, String)])
          .map { case (id, text) =>
            (id, text, Multimodal.mixedFixture(id, text).media) }
          .toDF("doc_id", "text", "payload")
        media.select(
          col("doc_id"),
          length(col("payload")).cast("long").as("n_bytes"),
          sha2(col("text").cast("binary"), 256).as("src_digest"),
          upper(hex(substring(col("payload"), 1, 4))).as("magic"),
          Multimodal.sniffFormat(col("payload")).as("format"))
      },
      // hex-then-substr (8 hex chars = 4 bytes): Spark slices the first 4
      // BYTES of the payload; substr on VARCHAR would take 4 CHARACTERS
      // and diverge on any document starting with multibyte UTF-8. DuckDB
      // has no BLOB substr, so slice the hex encoding instead.
      "WITH dims AS (SELECT doc_id, text, (doc_id % 16 + 1)::INT w, " +
        "((doc_id // 16) % 16 + 1)::INT h, ((doc_id % 2) + 1)::BIGINT c, " +
        "(doc_id % 50 + 10)::BIGINT f FROM documents) " +
        "SELECT doc_id, " +
        "CASE WHEN doc_id % 3 = 0 THEN (9 + length(w::VARCHAR) + length(h::VARCHAR) + w * h * 3)::BIGINT " +
        "WHEN doc_id % 3 = 1 THEN (44 + f * c * 2)::BIGINT " +
        "ELSE octet_length(encode(text))::BIGINT END AS n_bytes, " +
        "sha256(text) AS src_digest, " +
        "CASE WHEN doc_id % 3 = 0 THEN upper(hex('P6' || chr(10) || substr(w::VARCHAR, 1, 1))) " +
        "WHEN doc_id % 3 = 1 THEN '52494646' " +
        "ELSE upper(substr(hex(encode(text)), 1, 8)) END AS magic, " +
        "CASE WHEN doc_id % 3 = 0 THEN 'ppm' WHEN doc_id % 3 = 1 THEN 'wav' " +
        "ELSE (CASE WHEN upper(substr(hex(encode(text)), 1, 4)) = '5036' " +
        "AND upper(substr(hex(encode(text)), 5, 2)) IN ('0A', '20', '09', '0D') THEN 'ppm' " +
        "WHEN upper(substr(hex(encode(text)), 1, 8)) = '52494646' " +
        "AND upper(substr(hex(encode(text)), 17, 8)) = '57415645' THEN 'wav' " +
        "ELSE 'bin' END) END AS format FROM dims"),

    // M2 — frame sampling plumbing: 4 fixed-size byte slices at a
    // stride-derived offset per payload (posexplode = one row per frame),
    // each digested. The schema/batch shape a video frame-sampler produces.
    "m2_frame_sample" -> GQ(
      (s, d) => {
        val stride = (length(col("text")) / 4).cast("int")
        Tables.load(s, d, "documents")
          .select(col("doc_id"),
            posexplode(transform(sequence(lit(0), lit(3)),
              i => col("text").substr(i * stride + 1, lit(8)))))
          .toDF("doc_id", "frame_idx", "frame")
          .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
            sha2(col("frame"), 256).as("frame_sha"),
            length(col("frame")).cast("long").as("frame_len"))
      },
      "WITH f AS (SELECT doc_id, (length(text) // 4)::INT stride, text FROM documents) " +
        "SELECT doc_id, i AS frame_idx, sha256(substr(text, (i * stride + 1)::INT, 8)) " +
        "AS frame_sha, length(substr(text, (i * stride + 1)::INT, 8)) AS frame_len " +
        "FROM f, unnest(range(0, 4)) u(i)"),

    // M3 — REAL decode through the typed mapPartitions seam: each doc id
    // synthesizes a deterministic binary PPM (P6) payload — genuine wire
    // format: ASCII header + raw RGB samples — and Multimodal.decodePpm
    // PARSES those bytes back (dimensions from the header, pixel sum/mean
    // from the samples). The decoder knows nothing about the generative
    // formula; the oracle recomputes the expected stats analytically from
    // it, so a parser that misread the header or skipped sample bytes
    // hash-mismatches. Exercises case-class Encoders and the per-partition
    // iterator batch shape a native codec plugs into.
    "m3_ppm_decode" -> GQ(
      (s, d) => {
        import s.implicits._
        val media = Multimodal.spreadManifest(Tables.load(s, d, "documents")
          .select(col("doc_id")).as[Long]).map(Multimodal.ppmFixture _)
        Multimodal.decodeAll(s, media, Multimodal.decodePpm)
          .withColumn("px_mean", round(col("px_mean"), 6))
      },
      "WITH dims AS (SELECT doc_id, (doc_id % 16 + 1)::INT w, " +
        "((doc_id // 16) % 16 + 1)::INT h FROM documents), " +
        "px AS (SELECT doc_id, w, h, sum((doc_id * 131 + i * 7) % 256)::BIGINT s " +
        "FROM dims, unnest(range(0, (w * h * 3)::BIGINT)) u(i) GROUP BY 1, 2, 3) " +
        "SELECT doc_id, w AS width, h AS height, 'ppm' AS format, " +
        "(9 + length(w::VARCHAR) + length(h::VARCHAR) + w * h * 3)::BIGINT AS n_bytes, " +
        "s AS px_sum, round(s / (w * h * 3), 6) AS px_mean FROM px"),

    // M4 — REAL audio decode through the same seam: each doc id
    // synthesizes a deterministic PCM WAV (RIFF container, little-endian
    // 16-bit samples) and Multimodal.decodeWav PARSES the bytes back —
    // format fields from the header (cross-checked against payload
    // length), amplitude stats from the decoded signed samples. The oracle
    // recomputes the stats analytically from the generative formula, so an
    // endianness slip, a sign error, or a skipped header field
    // hash-mismatches.
    "m4_wav_decode" -> GQ(
      (s, d) => {
        import s.implicits._
        val media = Multimodal.spreadManifest(Tables.load(s, d, "documents")
          .select(col("doc_id")).as[Long]).map(Multimodal.wavFixture _)
        Multimodal.decodeAll(s, media, Multimodal.decodeWav)
          .withColumn("duration_s", round(col("duration_s"), 6))
      },
      "WITH p AS (SELECT doc_id, ((doc_id % 2) + 1)::INT c, " +
        "(8000 + (doc_id % 4) * 4000)::INT rate, (doc_id % 50 + 10)::BIGINT f " +
        "FROM documents), " +
        "s AS (SELECT doc_id, c, rate, f, " +
        "sum(((doc_id * 37 + i * 101) % 65536) - 32768)::BIGINT amp_sum, " +
        "max(abs(((doc_id * 37 + i * 101) % 65536) - 32768))::INT amp_peak " +
        "FROM p, unnest(range(0, f * c)) u(i) GROUP BY 1, 2, 3, 4) " +
        "SELECT doc_id, c AS n_channels, rate AS sample_rate, f AS n_frames, " +
        "(44 + f * c * 2)::BIGINT AS n_bytes, amp_sum, amp_peak, " +
        "round(f::DOUBLE / rate, 6) AS duration_s FROM s"),

    // M5 — REAL image transform through the seam: fixture PPM →
    // nearest-neighbor half-scale resize (Multimodal.resizePpmHalf — parses
    // the wire bytes, emits a genuine P6 payload) → decodePpm re-parses the
    // RESIZED bytes for the gated stats. The oracle recomputes the expected
    // stats analytically from the generative formula + the NN sampling map
    // (out pixel (x,y) ← source (2x,2y)), so an off-by-one in the sampling
    // grid, the output header, or the re-encode hash-mismatches. Map-only
    // per row (mapPartitions): at 100 TB the resize rides the scan with no
    // shuffle — the shape of every production thumbnail/downsample pass.
    "m5_ppm_resize" -> GQ(
      (s, d) => {
        import s.implicits._
        val media = Multimodal.spreadManifest(Tables.load(s, d, "documents")
          .select(col("doc_id")).as[Long])
          .map(id => Multimodal.resizePpmHalf(Multimodal.ppmFixture(id)))
        Multimodal.decodeAll(s, media, Multimodal.decodePpm)
          .withColumn("px_mean", round(col("px_mean"), 6))
      },
      "WITH dims AS (SELECT doc_id, (doc_id % 16 + 1)::INT w, " +
        "((doc_id // 16) % 16 + 1)::INT h FROM documents), " +
        "d2 AS (SELECT doc_id, w, ((w + 1) // 2)::INT w2, ((h + 1) // 2)::INT h2 FROM dims), " +
        // i enumerates resized samples; recover (y2, x2, ch), then the
        // source sample index ((2*y2)*w + 2*x2)*3 + ch of the NN map
        "px AS (SELECT doc_id, w2, h2, sum((doc_id * 131 + " +
        "(((i // (w2 * 3)) * 2 * w + ((i % (w2 * 3)) // 3) * 2) * 3 + i % 3) * 7) % 256)::BIGINT s " +
        "FROM d2, unnest(range(0, (w2 * h2 * 3)::BIGINT)) u(i) GROUP BY 1, 2, 3) " +
        "SELECT doc_id, w2 AS width, h2 AS height, 'ppm' AS format, " +
        "(9 + length(w2::VARCHAR) + length(h2::VARCHAR) + w2 * h2 * 3)::BIGINT AS n_bytes, " +
        "s AS px_sum, round(s / (w2 * h2 * 3), 6) AS px_mean FROM px"),

    // M6 — audio feature extraction through the seam: parse the RIFF/PCM
    // payload, compute channel-0 energy / quantized RMS / zero-crossings /
    // peak (Multimodal.wavFeatures). All-BIGINT outputs (rms_q =
    // floor(sqrt(sumsq div n)) — integer division then correctly-rounded
    // IEEE sqrt) so the oracle reproduces every value bit-for-bit from the
    // generative formula; a stride slip (reading interleaved channels as
    // mono), a sign error, or an off-by-one in the crossing count
    // hash-mismatches. Map-only, shuffle-free — the VAD/filterbank shape.
    "m6_wav_features" -> GQ(
      (s, d) => {
        import s.implicits._
        val media = Multimodal.spreadManifest(Tables.load(s, d, "documents")
          .select(col("doc_id")).as[Long]).map(Multimodal.wavFixture _)
        Multimodal.decodeAll(s, media, Multimodal.wavFeatures)
      },
      "WITH p AS (SELECT doc_id, ((doc_id % 2) + 1)::BIGINT c, " +
        "(doc_id % 50 + 10)::BIGINT f FROM documents), " +
        "v AS (SELECT doc_id, f, j, " +
        "(((doc_id * 37 + (j * c) * 101) % 65536) - 32768) v, " +
        "(((doc_id * 37 + ((j - 1) * c) * 101) % 65536) - 32768) pv " +
        "FROM p, unnest(range(0, f)) u(j)), " +
        "s AS (SELECT doc_id, f, sum(v * v)::BIGINT sumsq, " +
        "sum(CASE WHEN j > 0 AND ((v < 0) != (pv < 0)) THEN 1 ELSE 0 END)::BIGINT zcr, " +
        "max(abs(v))::INT peak FROM v GROUP BY 1, 2) " +
        "SELECT doc_id, f AS n_frames, sumsq AS amp_sumsq, " +
        "floor(sqrt((sumsq // f)::DOUBLE))::BIGINT AS rms_q, zcr, peak AS amp_peak FROM s"),

    // M7 — perceptual image fingerprint (dHash) through the real decode
    // seam: each payload is a genuine P6 the decoder parses byte-by-byte;
    // the signature is the 9×8 nearest-neighbor luminance grid's
    // horizontal-gradient bits, packed into the e7b two-word layout. The
    // oracle recomputes every bit analytically from the generative pixel
    // formula, so a grid-mapping slip, a channel-order error, or a packing
    // off-by-one hash-mismatches. Map-only: at 100 TB the hash rides the
    // ingest scan; only 16-byte signatures reach m8's shuffle.
    "m7_image_dhash" -> GQ(
      (s, d) => {
        import s.implicits._
        val media = Multimodal.spreadManifest(Tables.load(s, d, "documents")
          .select(col("doc_id")).as[Long]).map(Multimodal.dhashFixture _)
        Multimodal.decodeAll(s, media, Multimodal.dHashPpm)
      },
      dHashCtes("documents") +
        "SELECT doc_id, w::INT AS width, h::INT AS height, dhash_lo, dhash_hi FROM hsh"),

    // M8 — image NEAR-duplicate pairs: the multimodal×dedup crossover. The
    // corpus is every m7 fixture plus a brightness-flipped-stripe twin for
    // every 8th image (hamming ≤ 8 from its base by construction); pairs
    // come from the SAME pigeonhole band join the binary-embedding
    // near-dup uses (VectorOps.bandedHammingPairs) with the SAME
    // occupancy-adaptive band ladder as e7b: at gate scale (≤65k images)
    // the ladder selects the 9-band layout, where maxHamming 8 is
    // COMPLETE — so the oracle is the plain all-pairs hamming filter —
    // and past 65k/262k images the wider 6-/4-band layouts keep candidate
    // volume near-linear (the approximate regime, e7b's documented
    // contract). At 100 TB the band key partitions the shuffle; image
    // bytes never leave the map side.
    "m8_image_neardup" -> GQ(
      (s, d) => {
        import s.implicits._
        val ids = Tables.load(s, d, "documents").select(col("doc_id"))
        // One aggregate pass for both counts — Bench constructs this query
        // several times per run, so a second full-table count job here is
        // pure waste.
        val cRow = ids.agg(count(lit(1)).as("nd"),
          count(when(col("doc_id") % 8 === 0, lit(1))).as("nt")).head()
        val nImgs = cRow.getLong(0) + cRow.getLong(1)
        val media = Multimodal.spreadManifest(ids.as[Long]).flatMap { id =>
            val base = Multimodal.dhashFixture(id)
            if (id % 8 == 0) Seq(base, Multimodal.dhashTwinFixture(id))
            else Seq(base)
          }
        val sigs = Multimodal.decodeAll(s, media, Multimodal.dHashPpm)
          .select(col("doc_id").as("img_id"), col("dhash_lo"), col("dhash_hi"))
        graft.ops.VectorOps.bandedHammingPairs(
          sigs, "img_id", "dhash_lo", "dhash_hi", M8MaxHamming,
          graft.ops.VectorOps.adaptiveSignBands(nImgs))
      },
      dHashTwinCtes +
        "SELECT x.img_id AS img_id_1, y.img_id AS img_id_2, " +
        "(bit_count(xor(x.dhash_lo, y.dhash_lo)) + bit_count(xor(x.dhash_hi, y.dhash_hi)))::BIGINT AS hamming " +
        "FROM hsh x JOIN hsh y ON x.img_id < y.img_id " +
        "WHERE bit_count(xor(x.dhash_lo, y.dhash_lo)) + bit_count(xor(x.dhash_hi, y.dhash_hi)) " +
        s"<= $M8MaxHamming"),

    // W3 — time-range rolling window: per event, the count and value-sum of
    // the same user's events in the trailing hour (inclusive), via a RANGE
    // frame on epoch-µs — the sliding-aggregate every feature store and
    // rate-limiter computes. One shuffle by user_id (the same partitioning
    // ev_sessionize/ev_funnel ride); the range frame scans each partition
    // once with two moving pointers, never materializing per-row windows.
    // Values sum as exact per-row cents (round(value*100) ties away from
    // zero in both engines) so the frame's summation order can't drift the
    // hash the way a double sum could.
    "w3_rolling_window" -> GQ(
      (s, d) => {
        val raw = Tables.load(s, d, "events")
        val ev = raw.select(col("event_id"), col("user_id"), col("value"),
          Tables.eventTimeUs(raw).as("tus"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("tus"))
          .rangeBetween(-3600000000L, 0L)
        ev.select(col("event_id"), col("user_id"), col("tus"),
          count(lit(1)).over(w).as("n_1h"),
          sum(round(col("value") * 100, 0).cast("long")).over(w).as("cents_1h"))
      },
      "WITH e AS (SELECT event_id, user_id, epoch_us(ts) tus, " +
        "round(value * 100)::BIGINT cents FROM events) " +
        "SELECT event_id, user_id, tus, " +
        "count(*) OVER w AS n_1h, (sum(cents) OVER w)::BIGINT AS cents_1h FROM e " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY tus " +
        "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)"),

    // EV-RETENTION — cohort retention: each user's cohort is their first
    // active day; the matrix counts users active at each (cohort, day
    // offset) — THE product-analytics rollup. Day index is exact integer
    // division of epoch-µs (`div`, never double division — a double
    // quotient can round up across a midnight boundary at e15 magnitudes).
    // Shape: distinct (user, day) → per-user min via the user_id-partition
    // window (rides the distinct's shuffle) → one groupBy on the (cohort,
    // offset) matrix key. Users partition the work; the matrix is tiny.
    "ev_retention" -> GQ(
      (s, d) => {
        val raw = Tables.load(s, d, "events")
        val ud = raw.select(col("user_id"), Tables.eventTimeUs(raw).as("tus"))
          .select(col("user_id"), expr("tus div 86400000000").as("day"))
          .distinct()
        ud.withColumn("first_day",
            min(col("day")).over(Window.partitionBy(col("user_id"))))
          .groupBy(col("first_day").as("cohort_day"),
            (col("day") - col("first_day")).as("day_offset"))
          .agg(count(lit(1)).as("n_users"))
      },
      "WITH e AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events), " +
        "f AS (SELECT user_id, day, min(day) OVER (PARTITION BY user_id) first_day FROM e) " +
        "SELECT first_day AS cohort_day, day - first_day AS day_offset, " +
        "count(*) AS n_users FROM f GROUP BY 1, 2"),

    // SCD2 — slowly-changing-dimension type-2 history: compress each
    // user's attribute stream (a tier extracted from the event payload)
    // into validity intervals — keep only CHANGE rows (attr IS DISTINCT
    // FROM its predecessor; `<=>` gives the null-safe semantics both
    // engines agree on), then valid_to = next change's valid_from and the
    // open interval marks current. The warehouse-native history table
    // every dimension load maintains. Both windows share the user_id
    // partitioning, so the whole op is ONE shuffle; at 100 TB the change
    // filter also collapses the second window's input to change rows only.
    "scd2_user_history" -> GQ(
      (s, d) => {
        val raw = Tables.load(s, d, "events")
        // FLOOR division (Relational.floorDivExact), not Spark's
        // truncating `div`: the oracle's DuckDB `//` floors, and the two
        // differ on negative operands — the tier contract must not depend
        // on the generator happening to emit non-negative k values.
        // Compression itself is the shared Relational.scd2Compress — the
        // same definition the streaming maintenance twin merges with, so
        // gate and maintained table cannot diverge. anchor_eid is the
        // maintenance handle; the gate's contract has no use for it.
        Relational.scd2Compress(raw.select(col("user_id"), col("event_id"),
            Tables.eventTimeUs(raw).as("tus"),
            Relational.floorDivExact(
              expr("cast(get_json_object(props, '$.k') as bigint)"), 25L).as("tier")))
          .drop("anchor_eid")
      },
      "WITH e AS (SELECT user_id, event_id, epoch_us(ts) tus, " +
        "json_extract_string(props, '$.k')::BIGINT // 25 AS tier FROM events), " +
        "c AS (SELECT *, lag(tier) OVER (PARTITION BY user_id ORDER BY tus, event_id) prev FROM e), " +
        "f AS (SELECT user_id, event_id, tier, tus FROM c WHERE prev IS DISTINCT FROM tier) " +
        "SELECT user_id, tier, tus AS valid_from_us, " +
        "lead(tus) OVER w2 AS valid_to_us, " +
        "(lead(tus) OVER w2 IS NULL)::INT AS is_current FROM f " +
        "WINDOW w2 AS (PARTITION BY user_id ORDER BY tus, event_id)"),

    // EV-GAPFILL — time-spine gap fill with forward fill: each user's
    // daily last-observed value carried across inactive days — the shape
    // every feature store / metrics backfill computes. Spine days come
    // from `sequence(min_day, max_day)` PER USER (bounded by each user's
    // own active span — never a global calendar cross join), the fill is
    // `last(ignoreNulls)` over the user-partitioned day window, and the
    // daily last observation is deterministic ((tus, event_id) order, the
    // w2 top-1 idiom). Values as exact cents so the fill can't drift a
    // double across engines. Everything after the daily rollup rides the
    // same user_id partitioning.
    "ev_gapfill" -> GQ(
      (s, d) => {
        val raw = Tables.load(s, d, "events")
        val ev = raw.select(col("user_id"), col("event_id"),
          Tables.eventTimeUs(raw).as("tus"),
          round(col("value") * 100, 0).cast("long").as("cents"))
          .withColumn("day", expr("tus div 86400000000"))
        // Daily last observation via max_by (the w2 min_by idiom, mirrored):
        // rn=1 under (tus DESC, event_id DESC) is exactly the row with the
        // lexicographic max (tus, event_id) — unique since event_id is —
        // and the partial-aggregating groupBy collapses each (user, day)
        // map-side instead of shuffle-sorting every event row.
        val daily = ev.groupBy(col("user_id"), col("day"))
          .agg(max_by(col("cents"),
            struct(col("tus"), col("event_id"))).as("cents"))
        val spine = daily.groupBy(col("user_id"))
          .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
          .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
        val wf = Window.partitionBy(col("user_id")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        spine.join(daily, Seq("user_id", "day"), "left")
          .select(col("user_id"), col("day"),
            last(col("cents"), ignoreNulls = true).over(wf).as("cents_filled"),
            col("cents").isNotNull.cast("int").as("observed"))
      },
      "WITH e AS (SELECT user_id, event_id, epoch_us(ts) tus, " +
        "round(value * 100)::BIGINT cents, epoch_us(ts) // 86400000000 AS day FROM events), " +
        "daily AS (SELECT user_id, day, cents FROM e QUALIFY " +
        "row_number() OVER (PARTITION BY user_id, day ORDER BY tus DESC, event_id DESC) = 1), " +
        "b AS (SELECT user_id, min(day) d0, max(day) d1 FROM daily GROUP BY 1), " +
        "spine AS (SELECT user_id, unnest(range(d0, d1 + 1)) AS day FROM b), " +
        "j AS (SELECT s.user_id, s.day, d.cents FROM spine s " +
        "LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day) " +
        "SELECT user_id, day, last_value(cents IGNORE NULLS) OVER " +
        "(PARTITION BY user_id ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "AS cents_filled, (cents IS NOT NULL)::INT AS observed FROM j"))
}
