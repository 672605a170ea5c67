package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, Session}

/** Drives the streaming pipelines end-to-end on the real events parquet
  * (file source → streaming query → memory sink, processAllAvailable)
  * and checks them against the equivalent batch computation. */
class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // shared adaptive loader: ts_s derived whatever ts physically is
  private def batchEvents = sources.EventsTime.load(spark, dir)

  test("windowed type counts: streaming result equals batch groupBy") {
    val q = EventStreams.windowedTypeCounts(EventStreams.readEvents(spark, dir))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("win_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("win_out")
      .select("bucket", "event_type", "n")
      .as[(Long, String, Long)].collect().toSet
    val want = batchEvents
      .groupBy((col("ts_s") - pmod(col("ts_s"), lit(300L))).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == want)
  }

  test("windowed value drift: streaming TV rows equal the batch run bit-for-bit") {
    // reference = the corpus-global decile histogram (what the batch
    // profile gate would publish); both runs score windows against it
    val bin = least(lit(9L), floor(col("value") / 50).cast("long"))
    val hist = batchEvents.filter(col("value").isNotNull)
      .groupBy(bin.as("b")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val ref = (0L until 10L).map(b => hist.getOrElse(b, 0L))

    val q = EventStreams.windowedValueDrift(
      EventStreams.readEvents(spark, dir).filter(col("value").isNotNull), ref)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("drift_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("drift_out")
      .as[(Long, Long, Double)].collect().toSet
    val want = EventStreams.windowedValueDrift(
      batchEvents.filter(col("value").isNotNull)
        .withColumn("event_time", timestamp_seconds(col("ts_s"))), ref)
      .as[(Long, Long, Double)].collect().toSet
    assert(got.nonEmpty)
    // exact integer histograms + one shared double formula → row-equal
    // (unlike the MG twin, where merge-order-dependent estimates make
    // only the contract comparable)
    assert(got == want)
    got.foreach { case (b, n, tv) =>
      assert(n > 0 && tv >= 0.0 && tv <= 1.0, s"window $b out of contract: n=$n tv=$tv")
    }
  }

  test("windowed approx uniques: streaming estimates equal the batch run exactly") {
    // HLL registers merge by MAX (order-free), so the micro-batched
    // stream and the one-shot batch run land on the SAME estimate per
    // window — row-equality, not just the ≤2% contract
    val q = EventStreams.windowedApproxUniques(
      EventStreams.readEvents(spark, dir))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("uniq_out").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("uniq_out").as[(Long, Long)].collect().toSet
    val want = EventStreams.windowedApproxUniques(
      batchEvents.withColumn("event_time", timestamp_seconds(col("ts_s"))))
      .as[(Long, Long)].collect().toSet
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("windowed value drift counts negative values in bin 0, not nowhere") {
    // batch mode (watermark no-op): two negatives clamp into bin 0 and
    // MUST appear in n_window — before the lower clamp they matched no
    // conditional sum and a negative-drifting window under-reported
    val df = Seq((0L, -75.0), (10L, -1.0), (20L, 25.0), (30L, 9999.0))
      .toDF("ts_s", "value")
      .withColumn("event_time", timestamp_seconds(col("ts_s")))
    val ref = Seq.fill(10)(1L) // uniform reference, nRef = 10
    val got = EventStreams.windowedValueDrift(df, ref)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((0L, 4L,
      // bins: c0 = 3 (−75, −1 clamped + 25), c9 = 1 (9999 clamped);
      // sum_abs = |30−4| + 8·|0−4| + |10−4| = 64 → tv = 64/(2·4·10)
      64.0 / 80.0)))
  }

  test("windowed heavy hitters: every window satisfies the Misra-Gries contract") {
    val k = 4
    val q = EventStreams
      .windowedHeavyHitters(EventStreams.readEvents(spark, dir), k)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("hh_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("hh_out")
      .select("bucket", "event_type", "est")
      .as[(Long, String, Long)].collect()
      .groupBy(_._1).map { case (b, rows) =>
        b -> rows.map(r => r._2 -> r._3).toMap
      }
    val exact = batchEvents
      .groupBy((col("ts_s") - pmod(col("ts_s"), lit(300L))).as("bucket"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .as[(Long, String, Long)].collect()
      .groupBy(_._1).map { case (b, rows) =>
        b -> rows.map(r => r._2 -> r._3).toMap
      }
    assert(got.keySet == exact.keySet)
    exact.foreach { case (bucket, cnts) =>
      val n = cnts.values.sum
      val tracked = got(bucket)
      assert(tracked.size <= k)
      // every true-heavy key of the window is tracked
      cnts.filter { case (_, c) => c * (k + 1) > n }.keys.foreach { key =>
        assert(tracked.contains(key),
          s"bucket $bucket: heavy key $key missing from $tracked (exact $cnts)")
      }
      // no tracked key overcounts; undercount bounded for all tracked
      tracked.foreach { case (key, est) =>
        assert(est <= cnts(key), s"bucket $bucket: overcount for $key")
        assert((cnts(key) - est) * (k + 1) <= n,
          s"bucket $bucket: undercount beyond N/(k+1) for $key")
      }
    }
  }

  test("hopping window counts: streaming result equals the batch sliding query") {
    val q = EventStreams.hoppingTypeCounts(EventStreams.readEvents(spark, dir))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("hop_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("hop_out")
      .as[(Long, String, Long)].collect().toSet
    val want = SparkEntry.all.find(_.name == "ev_sliding_window").get
      .run(spark, dir).as[(Long, String, Long)].collect().toSet
    assert(got == want)
  }

  test("streaming dedup: duplicate (user_id, event_time) rows collapse to one") {
    // duplicate the stream by unioning it with itself: every event
    // appears twice; watermarked dropDuplicates must emit each once
    val src = EventStreams.readEvents(spark, dir)
    val doubled = src.unionAll(src)
    val q = EventStreams.dedupEvents(doubled, Seq("user_id"))
      .select("event_id")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_out").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("dedup_out").as[Long].collect().sorted
    val want = batchEvents.select("event_id").as[Long].collect().sorted
    assert(got.toSeq == want.toSeq)
  }

  test("stream-static enrichment join: equals batch join, dim broadcast") {
    // dimension: a segment per user id — deliberately missing some
    // users (sf0.001 has user_ids 0-14; left_outer must keep events of
    // users >= 10 with a null segment)
    val dim = spark.range(0, 10).select(col("id").as("user_id"),
      concat(lit("seg"), pmod(col("id"), lit(3))).as("segment"))
    val enriched = EventStreams.enrichEvents(
      EventStreams.readEvents(spark, dir), dim, "user_id")
    // the broadcast hint must survive analysis — at scale this join
    // must never shuffle the stream side
    assert(enriched.queryExecution.analyzed.toString.contains("ResolvedHint"))
    val q = enriched.select("event_id", "user_id", "segment")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("enrich_out").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("enrich_out")
      .as[(Long, Long, Option[String])].collect().toSet
    val want = batchEvents.join(dim, Seq("user_id"), "left_outer")
      .select("event_id", "user_id", "segment")
      .as[(Long, Long, Option[String])].collect().toSet
    assert(got == want)
    assert(got.exists(_._3.isEmpty)) // uncovered users really occur
  }

  test("stream-stream join: equals the batch bounded range join") {
    val q = EventStreams.purchasesWithRecentClicks(EventStreams.readEvents(spark, dir))
      .select("purchase_id", "click_id")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ssj_out").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("ssj_out").as[(Long, Long)].collect().toSet

    val e = sources.EventsTime.withEpochMicros(batchEvents)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts_us"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us").as("cts"), col("event_id").as("click_id"))
    val want = graft.operators.TemporalJoins.boundedRangeJoin(
      purchases, clicks.select(col("user_id"), col("cts"), col("click_id")),
      Seq("user_id"), "ts_us", "cts", lo = -600L * 1000000, hi = 0,
      payload = Seq("click_id"))
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("left-outer stream-stream join: unmatched purchases emit nulls on watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Long)]
    val events = mem.toDF().toDF("event_id", "user_id", "event_type", "ts_s")
      .withColumn("event_time", timestamp_seconds(col("ts_s")))
    val q = EventStreams.purchasesWithRecentClicksOuter(events)
      .select("purchase_id", "click_id")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ssj_outer_out").start()
    try {
      // user 1: click 100 s before the purchase → matched pair;
      // user 2: purchase with no click anywhere near it
      mem.addData((1L, 1L, "click", 9900L), (2L, 1L, "purchase", 10000L),
        (3L, 2L, "purchase", 20000L))
      q.processAllAvailable()
      val matchedOnly = spark.table("ssj_outer_out")
        .as[(Long, Option[Long])].collect().toSet
      assert(matchedOnly == Set((2L, Some(1L))),
        s"inner match emits immediately, the null verdict must wait: $matchedOnly")
      // far-future traffic on BOTH sides pushes the global watermark
      // past user 2's join window → the unmatched purchase must emit
      mem.addData((90L, 98L, "purchase", 100000L), (91L, 99L, "click", 100000L))
      q.processAllAvailable()
      mem.addData((92L, 98L, "purchase", 100001L), (93L, 99L, "click", 100001L))
      q.processAllAvailable()
      val got = spark.table("ssj_outer_out").as[(Long, Option[Long])].collect().toSet
      assert(got.contains((3L, None)),
        s"watermark-proven matchless purchase must emit with null click: $got")
      assert(!got.contains((2L, None)), s"matched purchase must not also emit a null row: $got")
    } finally q.stop()
  }

  test("streaming interval overlap: equals the batch intervalOverlapJoin on real events") {
    // intervals: [event_time, event_time + (event_id % 600 + 1) s),
    // clicks vs purchases per user — length cap 601 s by construction
    val ev = EventStreams.readEvents(spark, dir)
      .withColumn("end_time",
        expr("timestampadd(SECOND, event_id % 600 + 1, event_time)"))
    val l = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("l_user"), col("event_id").as("l_id"),
        col("event_time").as("l_st"), col("end_time").as("l_en"))
    val r = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("r_user"), col("event_id").as("r_id"),
        col("event_time").as("r_st"), col("end_time").as("r_en"))
    val q = EventStreams.streamingIntervalOverlap(l, r, "l_user", "r_user",
        "l_st", "l_en", "r_st", "r_en", maxLenSeconds = 601L)
      .select("l_id", "r_id")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("siov_out").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("siov_out").as[(Long, Long)].collect().toSet

    val be = batchEvents
      .withColumn("en_s", col("ts_s") + col("event_id") % 600 + 1)
    val bl = be.filter(col("event_type") === "click")
      .select(col("user_id").as("l_user"), col("event_id").as("l_id"),
        col("ts_s").as("l_st"), col("en_s").as("l_en"))
    val br = be.filter(col("event_type") === "purchase")
      .select(col("user_id").as("r_user"), col("event_id").as("r_id"),
        col("ts_s").as("r_st"), col("en_s").as("r_en"))
    val want = graft.operators.TemporalJoins.intervalOverlapJoin(
        bl.withColumnRenamed("l_user", "user_id"),
        br.withColumnRenamed("r_user", "user_id"),
        Seq("user_id"), "l_st", "l_en", "r_st", "r_en", slot = 128L)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(got == want, s"stream ${got.size} pairs != batch ${want.size}")
    assert(got.nonEmpty)
  }

  test("streaming interval overlap: onOverlong policies — drop sheds the poison row, fail kills the batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // i99's 2000-s interval exceeds the 600-s cap; i1/i101 overlap
    def run(onOverlong: String): Set[(Long, Long)] = {
      val mem = MemoryStream[(String, Long, Long, Long, Long)]
      val all = mem.toDF().toDF("side", "uid", "iid", "st_s", "en_s")
        .withColumn("st", timestamp_seconds(col("st_s")))
        .withColumn("en", timestamp_seconds(col("en_s")))
      val l = all.filter(col("side") === "L")
        .select(col("uid").as("l_user"), col("iid").as("l_id"),
          col("st").as("l_st"), col("en").as("l_en"))
      val r = all.filter(col("side") === "R")
        .select(col("uid").as("r_user"), col("iid").as("r_id"),
          col("st").as("r_st"), col("en").as("r_en"))
      val q = EventStreams.streamingIntervalOverlap(l, r, "l_user", "r_user",
          "l_st", "l_en", "r_st", "r_en", maxLenSeconds = 600L,
          onOverlong = onOverlong)
        .select("l_id", "r_id")
        .writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName(s"siov_pol_$onOverlong").start()
      try {
        mem.addData(("L", 1L, 1L, 1000L, 1300L), ("L", 1L, 99L, 1000L, 3000L),
          ("R", 1L, 101L, 1200L, 1400L))
        q.processAllAvailable()
      } finally q.stop()
      spark.table(s"siov_pol_$onOverlong").as[(Long, Long)].collect().toSet
    }
    assert(run("drop") == Set((1L, 101L)),
      "drop mode must shed ONLY the overlong interval and keep flowing")
    val e = intercept[Exception] { run("fail") }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("exceeds maxLenSeconds")),
      s"fail mode must name the violated cap: $msgs")
  }

  test("streaming interval overlap: kill-and-restart matches intervals across the crash boundary") {
    // run 1 buffers left interval L1 in join state; run 2's right
    // interval R102 overlaps it — the pair exists ONLY if the
    // recovered checkpoint still holds L1. Sink is parquet (the
    // memory sink refuses Append-mode checkpoint recovery).
    val src = java.nio.file.Files.createTempDirectory("siov_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("siov_ck").toString
    val out = java.nio.file.Files.createTempDirectory("siov_out").toString
    def addFile(rows: (String, Long, Long, Long, Long)*): Unit =
      rows.toSeq.toDF("side", "uid", "iid", "st_s", "en_s")
        .coalesce(1).write.mode("append").parquet(src)
    addFile(("L", 1L, 1L, 1000L, 1300L), ("R", 1L, 101L, 1200L, 1400L))
    val schema = spark.read.parquet(src).schema
    def startQuery() = {
      val all = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .withColumn("st", timestamp_seconds(col("st_s")))
        .withColumn("en", timestamp_seconds(col("en_s")))
      val l = all.filter(col("side") === "L")
        .select(col("uid").as("l_user"), col("iid").as("l_id"),
          col("st").as("l_st"), col("en").as("l_en"))
      val r = all.filter(col("side") === "R")
        .select(col("uid").as("r_user"), col("iid").as("r_id"),
          col("st").as("r_st"), col("en").as("r_en"))
      EventStreams.streamingIntervalOverlap(l, r, "l_user", "r_user",
          "l_st", "l_en", "r_st", "r_en", maxLenSeconds = 600L)
        .select("l_id", "r_id")
        .writeStream.outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out).start()
    }
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    def readOut(): Set[(Long, Long)] = {
      val s = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("l_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("r_id",
          org.apache.spark.sql.types.LongType)))
      spark.read.schema(s).parquet(out).as[(Long, Long)].collect().toSet
    }
    assert(readOut() == Set((1L, 101L)),
      s"run 1 must emit exactly the in-flight pair; got ${readOut()}")
    // R102 overlaps L1 (buffered in run 1); L2 on another key matches
    // nothing; both verdicts need the RECOVERED state
    addFile(("R", 1L, 102L, 1250L, 1350L), ("L", 2L, 2L, 5000L, 5100L))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    assert(readOut() == Set((1L, 101L), (1L, 102L)),
      s"recovered run must match across the crash boundary; got ${readOut()}")
  }

  test("checkpoint recovery: restart resumes aggregation state exactly") {
    // split events into 4 files; feed 2, stop, add 2, restart from the
    // SAME checkpoint — the recovered state must make the final result
    // equal the batch answer over all 4
    val src = java.nio.file.Files.createTempDirectory("ckpt_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt_st").toString
    val all = batchEvents.withColumn("part", pmod(col("event_id"), lit(4)))
    def addFile(p: Int): Unit =
      all.filter(col("part") === p).drop("part")
        .coalesce(1).write.mode("append").parquet(src)
    addFile(0); addFile(1)

    val schema = spark.read.parquet(src).schema
    def startQuery() = {
      val events = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .withColumn("event_time", timestamp_micros(expr("(ts_s * 1000000)")))
      EventStreams.windowedTypeCounts(events)
        .writeStream.outputMode(OutputMode.Complete())
        .option("checkpointLocation", ckpt)
        .format("memory").queryName("ckpt_out").start()
    }
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    val partial = spark.table("ckpt_out").count()

    addFile(2); addFile(3)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.table("ckpt_out")
      .select("bucket", "event_type", "n").as[(Long, String, Long)].collect().toSet
    val want = batchEvents
      .groupBy((col("ts_s") - pmod(col("ts_s"), lit(300L))).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n")).as[(Long, String, Long)].collect().toSet
    assert(got == want, "state recovered from checkpoint must complete to the batch answer")
    assert(partial > 0 && partial <= want.size)
  }

  test("idempotent foreachBatch sink: kill + restart yields exactly-once output") {
    val src = java.nio.file.Files.createTempDirectory("idem_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("idem_ck").toString
    val out = java.nio.file.Files.createTempDirectory("idem_out").toString
    val all = batchEvents.withColumn("part", pmod(col("event_id"), lit(4)))
    def addFile(p: Int): Unit =
      all.filter(col("part") === p).drop("part")
        .coalesce(1).write.mode("append").parquet(src)
    addFile(0); addFile(1)
    val schema = spark.read.parquet(src).schema
    def startQuery() = {
      val events = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .select("event_id", "user_id", "event_type")
      EventStreams.idempotentParquetSink(events, out, ckpt)
    }
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).count() > 0)
    // restart from the same checkpoint with more input: recovery may
    // REPLAY the last batch — the overwrite-by-batch-id sink must not
    // duplicate it
    addFile(2); addFile(3)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(out).select("event_id")
      .as[Long].collect().sorted.toSeq
    val want = batchEvents.select("event_id").as[Long].collect().sorted.toSeq
    assert(got == want, "sink must hold every input row exactly once")
  }

  test("incremental sessionize: emits closed sessions plus watermark-expired tails") {
    val raw = EventStreams.readEvents(spark, dir)
    val stream = raw
      .select(col("user_id"),
        sources.EventsTime.epochSeconds(raw).as("ts_s"), col("value"))
      .as[Event]
    val q = EventStreams.sessionize(stream)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("sess_out").as[Session].collect()
      .map(x => (x.user_id, x.session_start, x.session_end, x.n_events)).toSet

    // batch expectation: gap-split per user → every CLOSED session, plus
    // each user's tail session IF the final watermark (max ts − 10 min
    // delay) passed its gap expiry (end + 1800) — those time out and
    // are emitted; tails still within gap stay in state, unemitted.
    val rows = batchEvents.select("user_id", "ts_s").as[(Long, Long)].collect()
    val wmS = rows.map(_._2).max - 600
    val want = rows.groupBy(_._1).flatMap { case (u, rs) =>
      val ts = rs.map(_._2).sorted
      val sessions = ts.foldLeft(Vector.empty[Vector[Long]]) { (acc, t) =>
        if (acc.nonEmpty && t - acc.last.last <= 1800) acc.init :+ (acc.last :+ t)
        else acc :+ Vector(t)
      }
      val closed = sessions.dropRight(1)
      val expiredTail = sessions.takeRight(1).filter(sess => sess.last + 1800 < wmS)
      (closed ++ expiredTail).map(sess => (u, sess.head, sess.last, sess.size.toLong))
    }.toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("sessionize emits an idle user's tail session via event-time timeout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val events = mem.toDF().toDF("user_id", "ts_s", "value").as[Event]
    val q = EventStreams.sessionize(events)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("idle_out").start()
    try {
      mem.addData((1L, 1000L, 1.0), (1L, 1100L, 1.0))
      q.processAllAvailable()
      assert(spark.table("idle_out").count() == 0, "session still open — nothing to emit")
      // user 2's much-later events advance the watermark past user 1's
      // gap expiry (1100 + 1800 = 2900 < 10000 - 600); user 1 sends
      // NOTHING further — the timeout alone must close their session
      mem.addData((2L, 10000L, 1.0))
      q.processAllAvailable()
      mem.addData((2L, 10001L, 1.0)) // one more batch so the timeout fires
      q.processAllAvailable()
      val got = spark.table("idle_out").as[Session].collect().toSet
      assert(got.contains(Session(1L, 1000L, 1100L, 2L)),
        s"idle tail session not emitted; got $got")
    } finally q.stop()
  }

  test("sessionize: a late in-gap event must not move the session end backward") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val events = mem.toDF().toDF("user_id", "ts_s", "value").as[Event]
    val q = EventStreams.sessionize(events)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("late_out").start()
    try {
      mem.addData((1L, 1000L, 1.0), (1L, 2000L, 1.0))
      q.processAllAvailable()
      // a LATE event inside the session (watermark still lags) — the
      // session end must stay 2000, not regress to 1500 (which would
      // both mis-split later events and fire the timeout too early)
      mem.addData((1L, 1500L, 1.0))
      q.processAllAvailable()
      // push the watermark far past 2000 + gap so the tail times out
      mem.addData((2L, 100000L, 1.0))
      q.processAllAvailable()
      mem.addData((2L, 100001L, 1.0))
      q.processAllAvailable()
      val got = spark.table("late_out").as[Session].collect().toSet
      assert(got.contains(Session(1L, 1000L, 2000L, 3L)),
        s"expected session end 2000 with 3 events; got $got")
    } finally q.stop()
  }

  test("sessionize: a late in-gap event BEFORE the session start widens it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val events = mem.toDF().toDF("user_id", "ts_s", "value").as[Event]
    val q = EventStreams.sessionize(events)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("latestart_out").start()
    try {
      mem.addData((1L, 2000L, 1.0), (1L, 2500L, 1.0))
      q.processAllAvailable()
      // a late cross-batch event 50 s BEFORE the recorded start — above
      // the watermark (2500 - 600 = 1900) so it is admitted: the
      // session must widen to [1950, 2500], not report a start that
      // excludes a counted event
      mem.addData((1L, 1950L, 1.0))
      q.processAllAvailable()
      mem.addData((2L, 100000L, 1.0))
      q.processAllAvailable()
      mem.addData((2L, 100001L, 1.0))
      q.processAllAvailable()
      val got = spark.table("latestart_out").as[Session].collect().toSet
      assert(got.contains(Session(1L, 1950L, 2500L, 3L)),
        s"expected session [1950, 2500] with 3 events; got $got")
    } finally q.stop()
  }

  test("sessionize rejects a watermark delay longer than the session gap") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val events = mem.toDF().toDF("user_id", "ts_s", "value").as[Event]
    val e = intercept[IllegalArgumentException] {
      EventStreams.sessionize(events, gapSeconds = 1800, watermarkDelay = "1 hour")
    }
    assert(e.getMessage.contains("watermarkDelay"))
  }

  test("trendingTopK finalizes each window's top types exactly once, on watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventStreams.Trend
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val events = mem.toDF().toDF("ts_s", "event_type")
      .withColumn("event_time", timestamp_seconds(col("ts_s")))
    val q = EventStreams.trendingTopK(events, k = 2, windowSeconds = 300)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("trend_out").start()
    try {
      // window [0, 300): a×3, b×2, c×1 — split across two batches
      mem.addData((10L, "a"), (20L, "b"), (30L, "a"))
      q.processAllAvailable()
      mem.addData((40L, "b"), (50L, "a"), (60L, "c"))
      q.processAllAvailable()
      assert(spark.table("trend_out").count() == 0, "window still open")
      // events far ahead advance the watermark past 300 → finalize
      mem.addData((10000L, "z"))
      q.processAllAvailable()
      mem.addData((10001L, "z"))
      q.processAllAvailable()
      val got = spark.table("trend_out").as[Trend].collect().toSet
      assert(got == Set(Trend(0L, "a", 3L, 1), Trend(0L, "b", 2L, 2)),
        s"expected exactly the k=2 top types of window 0, got $got")
    } finally q.stop()
  }

  test("sessionize: kill-and-restart recovers hand-rolled session state from the checkpoint") {
    // the session-state map is exactly where recovery bugs live: the
    // stop falls BETWEEN a session's merge (run 1) and its close
    // (run 2) — if state were lost, u1's [1000,1500,3] could never be
    // emitted and u2's open session would vanish. Sink is parquet: the
    // memory sink refuses Append-mode checkpoint recovery.
    val src = java.nio.file.Files.createTempDirectory("sessrec_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sessrec_ck").toString
    val out = java.nio.file.Files.createTempDirectory("sessrec_out").toString
    def addFile(rows: (Long, Long)*): Unit =
      rows.map { case (u, t) => (u, t, 1.0) }
        .toDF("user_id", "ts_s", "value")
        .coalesce(1).write.mode("append").parquet(src)
    // u2's 3000 closes u2's first session but keeps the watermark
    // (3000 - 600 = 2400) below u1's gap expiry (1500 + 1800), so u1's
    // merged session is still OPEN STATE at the stop
    addFile((1L, 1000L), (1L, 1100L), (2L, 1000L))
    addFile((1L, 1500L), (2L, 3000L))

    val schema = spark.read.parquet(src).schema
    val outSchema = org.apache.spark.sql.Encoders.product[Session].schema
    def readOut() = spark.read.schema(outSchema).parquet(out).as[Session].collect().toSet
    def startQuery() = {
      val events = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src).as[Event]
      EventStreams.sessionize(events)
        .writeStream.outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out).start()
    }
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    val run1 = readOut()
    assert(run1 == Set(Session(2L, 1000L, 1000L, 1L)),
      s"run 1 should close exactly u2's first session; got $run1")

    // run 2: u1's 4000 closes the RECOVERED [1000,1500,3]; the far
    // events then advance the watermark past both tails' gap expiry
    addFile((1L, 4000L))
    addFile((3L, 100000L))
    addFile((3L, 100001L))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    assert(readOut() == Set(
      Session(1L, 1000L, 1500L, 3L), // merged in run 1, closed in run 2
      Session(2L, 1000L, 1000L, 1L),
      Session(1L, 4000L, 4000L, 1L), // tails, via event-time timeout
      Session(2L, 3000L, 3000L, 1L)),
      s"recovered run must complete to the no-restart answer; got ${readOut()}")
  }

  test("trendingTopK: kill-and-restart recovers per-window count state from the checkpoint") {
    import graft.streaming.EventStreams.Trend
    val src = java.nio.file.Files.createTempDirectory("trendrec_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("trendrec_ck").toString
    val out = java.nio.file.Files.createTempDirectory("trendrec_out").toString
    def addFile(rows: (Long, String)*): Unit =
      rows.toDF("ts_s", "event_type")
        .coalesce(1).write.mode("append").parquet(src)
    addFile((10L, "a"), (20L, "a"), (30L, "b"))
    addFile((40L, "b"), (50L, "a"), (60L, "c")) // window 0 so far: a3 b2 c1

    val schema = spark.read.parquet(src).schema
    val outSchema = org.apache.spark.sql.Encoders.product[Trend].schema
    def readOut() = spark.read.schema(outSchema).parquet(out).as[Trend].collect().toSet
    def startQuery() = {
      val events = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .withColumn("event_time", timestamp_seconds(col("ts_s")))
      EventStreams.trendingTopK(events, k = 2, windowSeconds = 300)
        .writeStream.outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out).start()
    }
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    assert(readOut().isEmpty, "window 0 still open at the stop")

    // run 2 merges new counts into the RECOVERED map (c overtakes a
    // only if the pre-restart c=1 survived), then finalizes on watermark
    addFile((70L, "c"), (80L, "c"), (90L, "c"))
    addFile((10000L, "z"))
    addFile((10001L, "z"))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    assert(readOut() == Set(Trend(0L, "c", 4L, 1), Trend(0L, "a", 3L, 2)),
      s"expected window 0 finalized once from recovered counts; got ${readOut()}")
  }

  test("native session_window stream: finalized sessions equal the ev_session_native batch query") {
    // same second-floored event time the batch twin uses
    val raw = EventStreams.readEvents(spark, dir)
    val stream = raw.withColumn("event_time",
      timestamp_seconds(sources.EventsTime.epochSeconds(raw)))
    val q = EventStreams.sessionWindowCounts(stream)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("swin_out").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("swin_out")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = SparkEntry.all.find(_.name == "ev_session_native").get
      .run(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    val wmS = batchEvents.agg(max("ts_s")).as[Long].head() - 600
    // Append only withholds sessions the final watermark has not yet
    // finalized (window end = last event + gap): everything emitted
    // must be a true batch session, everything provably finalized must
    // be emitted, and only not-yet-expired tails may be withheld.
    assert(got.subsetOf(batch), s"stream emitted a non-batch session: ${got -- batch}")
    val mustEmit = batch.filter { case (_, _, end, _) => end + 1800 < wmS }
    assert(mustEmit.subsetOf(got), s"missing finalized sessions: ${mustEmit -- got}")
    val mayHold = batch.filter { case (_, _, end, _) => end + 1800 >= wmS }
    assert((batch -- got).subsetOf(mayHold),
      s"withheld a session the watermark already finalized: ${(batch -- got) -- mayHold}")
    assert(got.nonEmpty)
  }

  test("sessionWindowCounts: merges at exactly the gap, splits strictly beyond it, emits once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val events = mem.toDF().toDF("user_id", "ts_s")
      .withColumn("event_time", timestamp_seconds(col("ts_s")))
    val q = EventStreams.sessionWindowCounts(events)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("swin_mem_out").start()
    try {
      // user 1: 1000 and 2000 merge (gap 1000); 3800 sits at EXACTLY
      // prev + gap — Spark merges adjacent windows (batch agrees:
      // probed empirically), so all three are ONE session. user 3:
      // 1801-second gap (strictly > gap) really splits.
      mem.addData((1L, 1000L), (1L, 2000L), (1L, 3800L),
        (3L, 1000L), (3L, 2801L))
      q.processAllAvailable()
      // the batch's own watermark (3800 − 600 = 3200) already passes
      // u3's first window end (1000 + 1800) → exactly that one emits
      assert(spark.table("swin_mem_out").as[(Long, Long, Long, Long)]
        .collect().toSet == Set((3L, 1000L, 1000L, 1L)),
        "only u3's gap-split first session is finalized so far")
      mem.addData((2L, 100000L))
      q.processAllAvailable()
      mem.addData((2L, 100001L))
      q.processAllAvailable()
      val got = spark.table("swin_mem_out")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 1000L, 3800L, 3L),
        (3L, 1000L, 1000L, 1L), (3L, 2801L, 2801L, 1L)),
        s"expected exact-gap merge for u1 and a strict-> split for u3; got $got")
    } finally q.stop()
  }

  test("dedupEventsByKey: first event per key wins within the watermark window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val events = mem.toDF().toDF("user_id", "ts_s")
      .withColumn("event_time", timestamp_seconds(col("ts_s")))
    val q = EventStreams.dedupEventsByKey(events, Seq("user_id"))
      .select("user_id").writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("keydedup_out").start()
    try {
      mem.addData((1L, 1000L), (1L, 1200L), (2L, 1000L))
      q.processAllAvailable()
      assert(spark.table("keydedup_out").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
      mem.addData((1L, 1300L)) // same key, within watermark → dropped
      q.processAllAvailable()
      assert(spark.table("keydedup_out").count() == 2)
    } finally q.stop()
  }
}
