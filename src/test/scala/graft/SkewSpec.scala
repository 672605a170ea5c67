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
