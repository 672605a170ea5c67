package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared harness for the cumulative-state streaming twins
  * (EwmaStreamSpec, CusumStreamSpec): a time-quartile file feed plus a
  * far-future sentinel writer. The subtleties live HERE once —
  * Append-mode restarts must feed time-forward (the StreamRecoverySpec
  * lesson: id-mod splits make later runs "late" vs the recovered
  * watermark and rows silently vanish), and the sentinel (one event
  * per type, 30 days past the corpus) advances the watermark far
  * enough to FINALIZE every real bucket while its own bucket stays
  * open and out of the state. */
trait StreamFeedHarness { self: SparkSpec =>

  protected def feedDir: String = "/root/testdata/sf0.001"

  protected def batchEvents: DataFrame =
    sources.EventsTime.load(spark, feedDir)

  /** (srcDir, addQuartile(0..3), addSentinel). */
  protected def timeQuartileFeed(prefix: String)
      : (String, Int => Unit, () => Unit) = {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory(prefix).toString
    val (lo, hi) = batchEvents.agg(min("ts_s"), max("ts_s"))
      .as[(Long, Long)].head()
    val width = (hi - lo) / 4 + 1
    val all = batchEvents.withColumn("part",
      floor((col("ts_s") - lo) / width).cast("int"))
    val addFile = (p: Int) => all.filter(col("part") === p).drop("part")
      .coalesce(1).write.mode("append").parquet(src)
    val addSentinel = () => batchEvents
      .groupBy("event_type").agg(min("event_id").as("event_id"))
      .join(batchEvents.drop("event_type"), "event_id")
      .withColumn("ts_s", lit(hi + 30L * 86400))
      .select(batchEvents.columns.map(col): _*)
      .coalesce(1).write.mode("append").parquet(src)
    (src, addFile, addSentinel)
  }

  protected def streamFrom(src: String): DataFrame = {
    val schema = spark.read.parquet(src).schema
    val events = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    events.withColumn("event_time",
      timestamp_micros(expr("(ts_s * 1000000)")))
  }
}
