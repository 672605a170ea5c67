package graft

import org.apache.spark.sql.functions._

/** Invariant pins for the round-7 relational surface (q_full_join,
  * q_unpivot, q_exists_corr, q_window_lag, q_ntile). Exact values are
  * pinned cross-engine by the DuckDB oracle; these specs assert the
  * structural properties that the hash compare can't localize when they
  * break (null handling, melt arity, bucket balance).
  */
class RelationalExtSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    Queries.relational.find(_.name == name).get.run(spark, dir)

  test("q_full_join covers every nation present on either side, no null keys") {
    val out = q("q_full_join").collect()
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_nationkey").cast("long")).distinct().collect().map(_.getLong(0)).toSet
    val supp = spark.read.parquet(s"$dir/supplier.parquet")
      .select(col("s_nationkey").cast("long")).distinct().collect().map(_.getLong(0)).toSet
    assert(out.map(_.getLong(0)).toSet == (cust ++ supp))
    // a key on one side only must surface with the other count coalesced to 0
    assert(out.forall(r => !r.isNullAt(1) && !r.isNullAt(2)))
    assert(out.forall(r => r.getLong(1) > 0 || r.getLong(2) > 0))
  }

  test("q_unpivot emits exactly 4 rows per lineitem, measures complete") {
    val n = spark.read.parquet(s"$dir/lineitem.parquet").count()
    val out = q("q_unpivot")
    assert(out.count() == 4 * n)
    val measures = out.select("measure").distinct().collect().map(_.getString(0)).toSet
    assert(measures == Set("quantity", "extendedprice", "discount", "tax"))
  }

  test("q_exists_corr equals the distinct-join reformulation") {
    val byJoin = {
      val o = spark.read.parquet(s"$dir/orders.parquet")
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      o.join(li, o("o_orderkey") === li("l_orderkey") &&
          li("l_quantity") > 45 && li("l_extendedprice") > o("o_totalprice") * 0.5)
        .select("o_orderkey", "o_totalprice").distinct()
    }
    assert(q("q_exists_corr").exceptAll(byJoin).isEmpty &&
      byJoin.exceptAll(q("q_exists_corr")).isEmpty)
  }

  test("q_window_lag: exactly one null gap per customer (the first order)") {
    val out = q("q_window_lag")
    val customers = out.select("o_custkey").distinct().count()
    assert(out.filter(col("gap_days").isNull).count() == customers)
    assert(out.filter(col("gap_days") < 0).count() == 0)
    // lead: exactly one null next_key per customer (the last order)
    assert(out.filter(col("next_key").isNull).count() == customers)
  }

  test("q_ntile: buckets 1..4, sizes within one of each other per segment") {
    val out = q("q_ntile")
    assert(out.agg(min("quartile"), max("quartile")).collect()(0).toSeq == Seq(1L, 4L))
    val sizes = out.groupBy("c_mktsegment", "quartile").count()
      .groupBy("c_mktsegment")
      .agg((max("count") - min("count")).as("spread"))
      .collect()
    assert(sizes.forall(_.getLong(1) <= 1L))
  }

  test("q_tpch_q18 scans lineitem exactly once (qualify-and-carry, not the two-scan SQL)") {
    // the rewrite's point: one partial-agg pass both filters orders
    // (sum > 200) and carries sum_qty — a regression to the textbook
    // IN-subquery shape would show a second lineitem scan (and
    // measured 3.4x instead of 1.2x at 10x data)
    val plan = q("q_tpch_q18").queryExecution.executedPlan.toString
    val lineitemScans = "lineitem\\.parquet".r.findAllIn(plan).length
    assert(lineitemScans == 1,
      s"expected exactly 1 lineitem scan, got $lineitemScans:\n$plan")
  }
}
