package graft

import org.apache.spark.sql.functions._

import graft.operators.Profiling

/** Hand-computable fixture for the single-scan column profiler; the
  * driver's q_profile_orders oracle cross-checks it against DuckDB on
  * real data. */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("profile: nulls, distincts, min/max per column in one pass") {
    val df = Seq(
      (1L, Some("a"), Some(10L)),
      (2L, Some("b"), None),
      (3L, Some("a"), Some(30L)),
      (4L, None, Some(10L)),
    ).toDF("id", "s", "v")
    val got = Profiling.profile(df, Seq("id", "s", "v"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got("id") == ((4L, 0L, 4L, "1", "4")))
    assert(got("s") == ((4L, 1L, 2L, "a", "b")))
    assert(got("v") == ((4L, 1L, 2L, "10", "30")))
  }

  test("groupQuantiles: exact interpolated quantiles per group") {
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), // q50 = 2.5
      ("b", 10L), ("b", 20L), ("b", 40L),         // q50 = 20, q25 = 15
    ).toDF("g", "v")
    val got = Profiling.groupQuantiles(df, Seq("g"), "v", Seq(0.25, 0.5))
      .as[(String, Double, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("a") == ((1.75, 2.5, 4L)))
    assert(got("b") == ((15.0, 20.0, 3L)))
  }

  test("profile reads the input exactly once (single scan in the plan)") {
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val plan = Profiling.profile(df,
      Seq("o_orderkey", "o_custkey", "o_orderstatus")).queryExecution
      .executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 parquet scan, got $scans:\n$plan")
  }
}
