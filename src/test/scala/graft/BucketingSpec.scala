package graft

import org.apache.spark.sql.functions._

/** Proves the co-located-join story with a plan assertion: two tables
  * bucketed on their join key produce a sort-merge join with NO shuffle
  * exchange — at 100 TB, bucketing the fact tables once turns every
  * subsequent key join/aggregation into a map-side operation. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed tables join without a shuffle; results match the plain join") {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    // a previous JVM's warehouse dir survives while the in-memory
    // catalog does not — clear both
    Seq("orders_bucketed", "customer_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_bucketed")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_bucketed")

    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a non-broadcast join
      "spark.sql.adaptive.enabled" -> "false") {      // inspect the static plan

      val bucketed = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"),
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name")
      val bPlan = bucketed.queryExecution.executedPlan.toString
      assert(!bPlan.contains("Exchange"), s"bucketed join should not shuffle:\n$bPlan")

      val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name")
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"),
        "control: the unbucketed join does shuffle")

      assert(bucketed.as[(Long, String)].collect().sorted.toSeq ==
        plain.as[(Long, String)].collect().sorted.toSeq)
    }
  }

  test("groupBy on the bucket key aggregates without a shuffle") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val agg = spark.table("orders_bucketed").groupBy("o_custkey")
        .agg(count(lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucket-key aggregation should not shuffle:\n$plan")
      assert(agg.count() > 0)
    }
  }
}
