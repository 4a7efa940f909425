package graft

import org.apache.spark.sql.functions._
import graft.ops.Checks

/** The event-time contract: `Tables.eventTimeUs` decodes every supported
  * physical `ts` encoding to the same epoch-µs value, rejects unsupported
  * encodings at PLAN time, and `Checks.epochRangeUs` catches the one
  * confusion schema dispatch cannot (a Long in the wrong unit) at VALUE
  * time. Round 9 shipped a silent 1000×-off streaming read; these tests
  * make every unit-confusion path fail loudly forever.
  */
class EventTimeSpec extends SparkSpec {
  import spark.implicits._

  private val us2026 = 1767225600L * 1000000L // 2026-01-01T00:00Z epoch-µs

  test("canonical naive TIMESTAMP(µs) events decode via unix_micros and pass the epoch guard") {
    val ev = Tables.load(spark, Sf0001, "events")
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
    val decoded = ev.withColumn("tus", Tables.eventTimeUs(ev))
    assert(Checks.epochRangeUs(decoded, "tus").isRight)
    // exactness: decode agrees with an independent string-parse path per
    // row (date_format of the naive value re-parsed as a UTC instant)
    val diff = decoded
      .withColumn("via_str", unix_micros(to_timestamp(
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))))
      .where(col("tus") =!= col("via_str")).count()
    assert(diff == 0)
  }

  test("legacy Long-nanos frames decode via div-1000 to identical µs values") {
    val canonical = Tables.load(spark, Sf0001, "events")
    val asNanos = canonical.withColumn("ts",
      Tables.eventTimeUs(canonical) * 1000L)
    assert(asNanos.schema("ts").dataType == org.apache.spark.sql.types.LongType)
    val a = canonical.withColumn("tus", Tables.eventTimeUs(canonical))
      .select("event_id", "tus")
    val b = asNanos.withColumn("tus", Tables.eventTimeUs(asNanos))
      .select("event_id", "tus")
    assert(a.exceptAll(b).count() == 0)
    assert(b.exceptAll(a).count() == 0)
    assert(Checks.epochRangeUs(b, "tus").isRight)
  }

  test("a millisecond-encoded Long (ms read as ns) fails the epoch-range guard loudly") {
    // ms values put through the legacy ns branch come out 1e6× too small:
    // epoch lands in 1970, far outside [2000, 2100).
    val ms = Seq((1L, us2026 / 1000L), (2L, us2026 / 1000L + 60000L))
      .toDF("event_id", "ts")
    val decoded = ms.withColumn("tus", Tables.eventTimeUs(ms))
    val res = Checks.epochRangeUs(decoded, "tus")
    assert(res.isLeft)
    assert(res.swap.toOption.get.detail.contains("unit confusion"))
  }

  test("a microsecond-encoded Long mistaken for nanos also fails the guard") {
    val us = Seq((1L, us2026), (2L, us2026 + 60L * 1000000L)).toDF("event_id", "ts")
    val decoded = us.withColumn("tus", Tables.eventTimeUs(us))
    assert(Checks.epochRangeUs(decoded, "tus").isLeft)
  }

  test("an unsupported ts encoding is rejected at plan time, not silently decoded") {
    val weird = Seq((1L, "2026-01-01")).toDF("event_id", "ts")
    val e = intercept[IllegalArgumentException] { Tables.eventTimeUs(weird) }
    assert(e.getMessage.contains("unsupported event-time encoding"))
  }

  test("epochRangeUs passes an empty frame (nothing to mis-decode)") {
    val empty = Seq.empty[(Long, Long)].toDF("event_id", "tus")
    assert(Checks.epochRangeUs(empty, "tus").isRight)
  }

  test("epochRangeUs rejects a non-Long column as a Violation, not a cast crash") {
    val ints = Seq((1L, 1767225600)).toDF("event_id", "tus") // Integer seconds
    val res = Checks.epochRangeUs(ints, "tus")
    assert(res.isLeft)
    assert(res.swap.toOption.get.detail.contains("not LongType"))
  }

  test("epochRangeUs passes an all-null Long column (a completeness question, not a unit one)") {
    val nulls = Seq(1L, 2L).toDF("event_id")
      .withColumn("tus", lit(null).cast("long"))
    assert(Checks.epochRangeUs(nulls, "tus").isRight)
  }

  test("eventTimeUs refuses to decode naive TIMESTAMP in a non-UTC session") {
    val ev = Tables.load(spark, Sf0001, "events")
    val tzKey = "spark.sql.session.timeZone"
    spark.conf.set(tzKey, "America/New_York")
    try {
      val e = intercept[IllegalStateException] { Tables.eventTimeUs(ev) }
      assert(e.getMessage.contains("UTC"))
    } finally spark.conf.set(tzKey, "UTC")
  }

  test("incrementalIngest gates ms-as-µs producer values loudly (production epochRangeUs call site)") {
    // Physically valid TIMESTAMP(µs) whose VALUES are epoch-ms — the slip
    // schema dispatch cannot see. The ingest must land the files, then
    // fail the run on the range guard instead of returning cleanly.
    val base = java.nio.file.Files.createTempDirectory("graft_ingest_").toString
    Seq((1L, us2026 / 1000L, 7L, "click", 1.0, "{}"),
        (2L, us2026 / 1000L + 60000000L, 8L, "view", 2.0, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$base/src")
    val e = intercept[IllegalStateException] {
      graft.streaming.EventStreams.incrementalIngest(
        spark, s"$base/src", s"$base/sink", s"$base/ckpt")
    }
    assert(e.getMessage.contains("epochRangeUs"))

    // The poisoned files are quarantined in the durable gate ledger: a
    // later run with GOOD new files must pass — one bad batch alarms its
    // run, it does not wedge the ingest forever.
    Seq((3L, us2026, 9L, "click", 3.0, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(s"$base/src")
    graft.streaming.EventStreams.incrementalIngest(
      spark, s"$base/src", s"$base/sink", s"$base/ckpt") // must not throw
    // and a run that lands nothing (no new source files) has nothing to
    // gate — also must not throw
    graft.streaming.EventStreams.incrementalIngest(
      spark, s"$base/src", s"$base/sink", s"$base/ckpt")
    // The ledger records both verdicts
    val ledger = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$base/ckpt/graft_gate_ledger.txt"))
    assert(ledger.contains("POISONED\t") && ledger.contains("OK\t"))
    // Crash-window coverage: a ledger lost after sink commit (the run died
    // between commit and gate) means every committed file is unseen again —
    // the next run must RE-GATE them and re-throw on the poison, not
    // silently exempt it.
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$base/ckpt/graft_gate_ledger.txt"))
    val e2 = intercept[IllegalStateException] {
      graft.streaming.EventStreams.incrementalIngest(
        spark, s"$base/src", s"$base/sink", s"$base/ckpt")
    }
    assert(e2.getMessage.contains("epochRangeUs"))
    // ...and after the re-quarantine, ingest is clean again
    graft.streaming.EventStreams.incrementalIngest(
      spark, s"$base/src", s"$base/sink", s"$base/ckpt")
  }

  test("batch eventsExtract gates ms-as-µs values loudly and passes + appends good landings") {
    // The BATCH twin of the streaming ingest gate: the extract path must
    // not trust its inputs either (the round-11 gap — only the stream
    // quarantined). Same slip: physically valid TIMESTAMP(µs), values 1000× off.
    def evDf(rows: Seq[(Long, Long)]) =
      rows.map { case (id, us) => (id, us, 7L, "click", 1.0, "{}") }
        .toDF("event_id", "us", "user_id", "event_type", "value", "props")
        .withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val base = java.nio.file.Files.createTempDirectory("graft_evx_").toString
    evDf(Seq((1L, us2026 / 1000L), (2L, us2026 / 1000L + 60000000L)))
      .write.parquet(s"$base/bad")
    val e = intercept[IllegalStateException] {
      graft.warehouse.Jobs.eventsExtract(spark, s"$base/bad", s"$base/out")
    }
    assert(e.getMessage.contains("epochRangeUs"))
    // the gate fires BEFORE the write: nothing landed
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base/out")))

    // good landing passes; re-extract is incrementally idempotent; a new
    // slice appends and only the fresh rows are gated
    evDf(Seq((1L, us2026), (2L, us2026 + 60L * 1000000L))).write.parquet(s"$base/good")
    graft.warehouse.Jobs.eventsExtract(spark, s"$base/good", s"$base/out")
    graft.warehouse.Jobs.eventsExtract(spark, s"$base/good", s"$base/out")
    assert(spark.read.parquet(s"$base/out").count() == 2)
    evDf(Seq((3L, us2026 + 120L * 1000000L))).write.mode("append").parquet(s"$base/good")
    graft.warehouse.Jobs.eventsExtract(spark, s"$base/good", s"$base/out")
    assert(spark.read.parquet(s"$base/out").count() == 3)
  }

  test("incrementalIngest over an empty landing zone completes without a sink to read") {
    val base = java.nio.file.Files.createTempDirectory("graft_ingest0_").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/src"))
    graft.streaming.EventStreams.incrementalIngest(
      spark, s"$base/src", s"$base/sink", s"$base/ckpt") // zero batches: no gate, no crash
  }
}
