package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salting must never change results — only partitioning. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed: 90% of rows share key 0
  private lazy val skewed = Seq.tabulate(2000)(i =>
    (if (i % 10 == 0) i.toLong % 7 else 0L, i.toLong)).toDF("k", "x")
  private lazy val dim = Seq.tabulate(7)(i => (i.toLong, s"name_$i")).toDF("k", "name")

  test("saltedJoin equals the plain inner join") {
    val plain = skewed.join(dim, Seq("k"))
      .select("k", "x", "name").as[(Long, Long, String)].collect().sorted
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), salts = 8)
      .select("k", "x", "name").as[(Long, Long, String)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedAggregate equals the plain groupBy sum/count") {
    val plain = skewed.groupBy("k")
      .agg(sum("x").as("sum_x"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().sorted
    val salted = Skew.saltedAggregate(skewed, Seq("k"), "x", salts = 8)
      .as[(Long, Long, Long)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted join spreads a hot key over multiple salt values") {
    val salts = Seq.tabulate(2000)(i => (0L, i.toLong)).toDF("k", "x")
      .withColumn("__salt", pmod(xxhash64(col("x")), lit(8)))
      .select("__salt").distinct().count()
    assert(salts > 4) // content hash actually scatters
  }

  test("sessionizeTwoLevel: hand fixture with sessions straddling bucket boundaries") {
    // gap 100, bucket 1000. user 1: events at 950, 1020 (straddle —
    // diff 70 <= gap, MUST merge across the boundary), then 2000
    // (diff 980 > gap, new session). user 2: 999 and 1100 (diff 101 >
    // gap: adjacent buckets but NO merge). user 3: a chain crossing
    // TWO boundaries via 990, 1060 … 1990, 2050, all <= gap apart.
    val df = Seq(
      (1L, 950L, 1L), (1L, 1020L, 2L), (1L, 2000L, 3L),
      (2L, 999L, 4L), (2L, 1100L, 5L),
      (3L, 990L, 6L), (3L, 1060L, 7L), (3L, 1130L, 8L), (3L, 1950L, 9L),
      (3L, 1990L, 10L), (3L, 2050L, 11L),
    ).toDF("user_id", "ts_s", "event_id")
    val got = Skew.sessionizeTwoLevel(df, gapSeconds = 100L, bucketSeconds = 1000L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, 2L, 70L), (1L, 2L, 1L, 0L),
      (2L, 1L, 1L, 0L), (2L, 2L, 1L, 0L),
      // user 3: [990, 1060, 1130] merges across the 0→1 boundary
      // (session 1, duration 140); 1130→1950 is 820 > gap, then
      // [1950, 1990, 2050] merges across the 1→2 boundary (session 2)
      (3L, 1L, 3L, 140L), (3L, 2L, 3L, 100L)))
  }

  test("sessionizeTwoLevel equals the single-window sessionize on random streams") {
    // randomized model check incl. bucket width SMALLER than the gap
    // (soundness does not need W >= gap: empty buckets between runs
    // still compare true end/start times)
    val rnd = new scala.util.Random(14)
    for (bucket <- Seq(7L, 100L, 1000L); trial <- 1 to 3) {
      val gap = 50L
      val events = (1 to 400).map { i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(2000).toLong, i.toLong)
      }
      val df = events.toDF("user_id", "ts_s", "event_id")
      // reference: the plain single-window form (ev_sessionize shape)
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_s").asc, col("event_id").asc)
      val want = df
        .withColumn("prev_ts", lag(col("ts_s"), 1).over(byUser))
        .withColumn("new_session", when(col("prev_ts").isNull ||
          col("ts_s") - col("prev_ts") > gap, 1L).otherwise(0L))
        .withColumn("session_idx", sum(col("new_session")).over(byUser
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"),
          (max(col("ts_s")) - min(col("ts_s"))).as("duration_s"))
        .as[(Long, Long, Long, Long)].collect().toSet
      val got = Skew.sessionizeTwoLevel(df, gapSeconds = gap, bucketSeconds = bucket)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == want, s"bucket=$bucket trial=$trial: two-level diverged; " +
        s"extra=${got -- want} missing=${want -- got}")
    }
  }

  test("sessionPathsTwoLevel equals the single-window path build on random streams") {
    // the payload-carrying variant: local segments must concatenate in
    // exactly the global (ts, event_id) order across bucket boundaries
    val rnd = new scala.util.Random(41)
    val types = Array("a", "b", "c")
    for (bucket <- Seq(7L, 300L)) {
      val events = (1 to 300).map { i =>
        (rnd.nextInt(4).toLong, rnd.nextInt(1500).toLong, i.toLong,
          types(rnd.nextInt(3)))
      }
      val df = events.toDF("user_id", "ts_s", "event_id", "event_type")
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_s").asc, col("event_id").asc)
      val want = df
        .withColumn("prev_ts", lag(col("ts_s"), 1).over(byUser))
        .withColumn("new_session", when(col("prev_ts").isNull ||
          col("ts_s") - col("prev_ts") > 50L, 1L).otherwise(0L))
        .withColumn("session_idx", sum(col("new_session")).over(byUser
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_idx")
        .agg(concat_ws(">", transform(
          array_sort(collect_list(struct(col("ts_s"), col("event_id"),
            col("event_type")))),
          x => x.getField("event_type"))).as("path"))
        .as[(Long, Long, String)].collect().toSet
      val got = Skew.sessionPathsTwoLevel(df,
        gapSeconds = 50L, bucketSeconds = bucket)
        .as[(Long, Long, String)].collect().toSet
      assert(got == want, s"bucket=$bucket: paths diverged; " +
        s"extra=${got -- want} missing=${want -- got}")
    }
  }

  test("AQE splits a skewed sort-merge join partition at runtime (engine-native salting)") {
    // the OTHER skew tool beside explicit salting: Spark's adaptive
    // skew-join split. Pin that it actually fires on the shape we'd
    // rely on at scale — one hot key dominating a shuffle partition —
    // with thresholds lowered so the tiny fixture trips them.
    val conf = spark.conf
    val keys = Seq("spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> scala.util.Try(conf.get(k)).toOption)
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // 100k rows on key 0 + a sprinkle on 200 cold keys → one shuffle
      // partition orders of magnitude over the median
      val big = spark.range(0, 100000).select(lit(0L).as("k"), col("id").as("x"))
        .unionAll(spark.range(0, 2000)
          .select((pmod(col("id"), lit(200L)) + 1L).as("k"), col("id").as("x")))
      val dim = spark.range(0, 201).select(col("id").as("k"),
        concat(lit("n"), col("id")).as("name"))
      val j = big.join(dim, Seq("k"))
      // execute THIS DataFrame's own plan (a write goes through a fresh
      // QueryExecution and would leave j's adaptive plan un-finalized)
      assert(j.collect().length == 102000)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"AQE must have re-planned:\n$plan")
      assert(plan.contains("skew=true") || plan.toLowerCase.contains("skewed"),
        s"the hot partition must be split by the skew-join rule:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
