package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loaders for the driver-generated test data
  * (see /root/repo/TESTDATA.md). At cluster scale these would be
  * catalog tables / object-store paths; the path-parameterized shape
  * mirrors the reference's storage-mediated dataflow
  * (reference: airflow/main-dw-project.py:114-243 — every job takes
  * in/out paths as arguments).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Event time in epoch MICROSECONDS, whatever the physical encoding of
    * the `ts` column. A 100 TB lakehouse never controls its producers'
    * timestamp encodings — upstream re-encodes happen (the driver's own
    * testdata switched from INT64 epoch-nanos to TIMESTAMP(µs) between
    * rounds) — so the engine absorbs the encoding exactly once, here at
    * the loader seam, instead of in every query:
    *   - TimestampNTZType (canonical since 2026-08: the testdata carries
    *     naive TIMESTAMP(µs), isAdjustedToUTC=false): cast to instant then
    *     `unix_micros` — face-value-exact because every graft session pins
    *     spark.sql.session.timeZone=UTC, matching the oracle's epoch_us
    *     read of the same naive values.
    *   - TimestampType: `unix_micros` directly — exact, codegen'd.
    *   - LongType (legacy INT64 epoch-nanos, read via
    *     spark.sql.legacy.parquet.nanosAsLong): integral `div 1000` —
    *     truncation matches the oracle's parquet reader, which truncates
    *     nanosecond timestamps to µs.
    * Any other physical type fails LOUDLY at plan time — a silent
    * unit-confused read (ms-as-µs is 1000× off) is the worst failure mode
    * an event pipeline has. Pair with `Checks.epochRangeUs` for the
    * value-level guard (schema dispatch can't tell ms-Longs from ns-Longs).
    */
  def eventTimeUs(df: DataFrame, ts: String = "ts"): Column =
    df.schema(ts).dataType match {
      case TimestampNTZType =>
        // The NTZ→instant cast is zone-sensitive: a non-UTC session would
        // shift every decoded value by its zone offset — well inside the
        // epochRangeUs window, so the value guard can't catch it. Fail as
        // loudly as the unsupported-encoding case instead of decoding
        // shifted values. (Sessions.local pins UTC; this guards every
        // other entry point.)
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        if (tz != "UTC") throw new IllegalStateException(
          s"eventTimeUs requires spark.sql.session.timeZone=UTC to decode " +
            s"naive TIMESTAMP '$ts' face-value-exactly; session has '$tz'")
        unix_micros(col(ts).cast(TimestampType))
      case TimestampType    => unix_micros(col(ts))
      case LongType         => expr(s"`$ts` div 1000")
      case other => throw new IllegalArgumentException(
        s"unsupported event-time encoding for column '$ts': $other " +
          "(expected TIMESTAMP or legacy INT64 epoch-nanos)")
    }
}
