package graft

import org.apache.spark.sql.functions._

/** Asserts the two runtime-filtering mechanisms that matter at 100 TB
  * are active through our plan shapes: dynamic partition pruning (a
  * filtered dimension prunes fact partitions at runtime) and bloom-
  * filter join pruning (the selective side's keys pre-filter the big
  * side's scan). Both are Catalyst features — the point of these tests
  * is that OUR query shapes qualify for them. */
class RuntimeFilteringSpec extends SparkSpec {
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

  test("dynamic partition pruning fires on a partitioned fact table") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS lineitem_part")
    val loc = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "lineitem_part")
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.partitionBy("l_returnflag").mode("overwrite")
      .saveAsTable("lineitem_part")
    // dim must be file-backed: a LocalRelation's filter constant-folds
    // away before the PartitionPruning rule can see a selective predicate
    val dimPath = java.nio.file.Files.createTempDirectory("dim").toString
    Seq(("R", "returned"), ("X", "unused")).toDF("flag", "label")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)

    withConf(
      "spark.sql.adaptive.enabled" -> "false",
      // the sf0.001 fixture is tiny; skip the size-based benefit
      // heuristic so the mechanism itself is assertable
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10000") {
      val q = spark.table("lineitem_part")
        .join(dim.filter(col("label") === "returned"),
          col("l_returnflag") === col("flag"))
        .groupBy("l_returnflag")
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"expected dynamic partition pruning in:\n$plan")
      assert(q.select("l_returnflag").distinct().count() === 1) // only R survives
    }
  }

  test("bloom-filter join pruning fires for a selective build side") {
    val dir = "/root/testdata/sf0.001"
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val o = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val q = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_quantity")
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter") || optimized.contains("BloomFilter"),
        s"expected a runtime bloom filter in:\n$optimized")
      assert(q.count() > 0)
    }
  }
}
