package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Physical-type-adaptive time handling for the `events` table.
  *
  * The driver-generated events parquet has shipped `ts` as BOTH
  * int64 epoch-nanoseconds (TIMESTAMP(NANOS) physical, read as LONG
  * under `spark.sql.legacy.parquet.nanosAsLong`) and, after a testdata
  * regeneration, as `timestamp[us]` (read as TIMESTAMP_NTZ). Every
  * event query works in integer epoch seconds/micros — which also
  * sidesteps engine-specific timestamp rendering in the DuckDB oracle
  * compare — so this object is the ONE place that knows how to get
  * from whatever `ts` physically is to those integers. Hard-coding
  * either layout at a call site is how round 11 lost 34 correctness
  * rows to a silent schema drift; never branch on the ts type anywhere
  * else.
  *
  * NTZ note: converting TIMESTAMP_NTZ to epoch integers goes through a
  * cast to TIMESTAMP (local-time interpretation), which uses the
  * session time zone. All entry points (Bench/Verify/Plans/SparkSpec)
  * pin `spark.sql.session.timeZone=UTC`, so the integers are stable
  * and match DuckDB's `epoch()` of the same naive timestamp.
  */
object EventsTime {

  /** Epoch-microseconds expression for `df`'s `ts` column. */
  def epochMicros(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType => expr("ts DIV 1000")
    case TimestampType | TimestampNTZType =>
      unix_micros(col("ts").cast(TimestampType))
    case other => throw new IllegalArgumentException(
      s"events.ts: expected int64-nanos or timestamp, got $other")
  }

  /** Epoch-seconds expression for `df`'s `ts` column. (Positive epochs
    * only: DIV truncates toward zero, matching the oracle's
    * `floor(epoch(ts))` for the synthetic 2024-era data.) */
  def epochSeconds(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType => expr("ts DIV 1000000000")
    case TimestampType | TimestampNTZType =>
      expr("unix_micros(CAST(ts AS timestamp)) DIV 1000000")
    case other => throw new IllegalArgumentException(
      s"events.ts: expected int64-nanos or timestamp, got $other")
  }

  /** A proper TimestampType column for Structured Streaming
    * watermarks/windows, whatever `ts` physically is. */
  def eventTime(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType => timestamp_micros(expr("ts DIV 1000"))
    case TimestampNTZType => col("ts").cast(TimestampType)
    case TimestampType => col("ts")
    case other => throw new IllegalArgumentException(
      s"events.ts: expected int64-nanos or timestamp, got $other")
  }

  /** Adds `ts_us` (epoch micros, BIGINT) next to whatever is there. */
  def withEpochMicros(df: DataFrame): DataFrame =
    df.withColumn("ts_us", epochMicros(df))

  /** Batch-reads `<dir>/events.parquet` with `ts_s` (epoch seconds,
    * BIGINT) attached. Sets the legacy nanos conf FIRST so int64-nanos
    * vintages of the table still load; it is a no-op for timestamp
    * vintages. */
  def load(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.withColumn("ts_s", epochSeconds(raw))
  }
}
