package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.EventsTime

/** EventsTime must derive IDENTICAL epoch integers from both physical
  * vintages of the events table — int64 epoch-nanos and
  * timestamp[us]/NTZ — or a future testdata regeneration silently
  * flips epoch values instead of failing loudly. The live testdata
  * only exercises one branch at a time, so this spec feeds the
  * adapter BOTH layouts of the same instants and pins equality. */
class EventsTimeSpec extends SparkSpec {
  import spark.implicits._

  // three instants: epoch, a 2024 microsecond-precise point, and a
  // second-boundary point (DIV truncation edge)
  private val micros = Seq(0L, 1704067200123456L, 1704067201000000L)

  private def asNanos = micros.map(_ * 1000L).toDF("ts")
  private def asTimestamp = micros.toDF("us")
    .select(timestamp_micros($"us").as("ts"))

  test("epochSeconds and epochMicros agree across physical types") {
    def ints(df: org.apache.spark.sql.DataFrame) = df
      .select(EventsTime.epochMicros(df).as("us"),
        EventsTime.epochSeconds(df).as("s"))
      .as[(Long, Long)].collect().toSeq.sorted
    val fromLong = ints(asNanos)
    val fromTs = ints(asTimestamp)
    assert(fromLong == fromTs, s"$fromLong != $fromTs")
    assert(fromLong == micros.map(u => (u, u / 1000000L)).sorted)
  }

  test("eventTime yields the same timestamp from both types") {
    def times(df: org.apache.spark.sql.DataFrame) = df
      .select(unix_micros(EventsTime.eventTime(df).cast(TimestampType)))
      .as[Long].collect().toSeq.sorted
    assert(times(asNanos) == times(asTimestamp))
    assert(times(asNanos) == micros.sorted)
  }

  test("NTZ vintage matches the LTZ reading under the pinned UTC session") {
    val ntz = micros.toDF("us")
      .select(timestamp_micros($"us").cast(TimestampNTZType).as("ts"))
    val got = ntz.select(EventsTime.epochMicros(ntz)).as[Long].collect().toSeq.sorted
    assert(got == micros.sorted)
  }

  test("unsupported ts type fails loudly, not with a wrong epoch") {
    val bad = Seq("2024-01-01").toDF("ts")
    intercept[IllegalArgumentException](EventsTime.epochMicros(bad))
    intercept[IllegalArgumentException](EventsTime.epochSeconds(bad))
    intercept[IllegalArgumentException](EventsTime.eventTime(bad))
  }
}
