package graft

import org.apache.spark.sql.functions._

import graft.operators.RuntimeFilter

/** Bloom-pruned join: output-invariance (no false negatives) plus the
  * pruning actually pruning (the filter's whole point), plus the plan
  * staying codegen'd (no UDF black box in the probe side's hot path). */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val big = (0L until 1000L).map(i => (i, s"row$i")).toDF("k", "payload")
  private lazy val small = Seq(3L, 500L, 999L, 3L).toDF("k")

  test("bloomPrunedJoin returns exactly the plain join rows") {
    val got = RuntimeFilter.bloomPrunedJoin(big, small.distinct(), "k", mBits = 1 << 10)
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == Seq((3L, "row3"), (500L, "row500"), (999L, "row999")))
  }

  test("the bloom filter prunes the probe side hard at low fpp") {
    val words = RuntimeFilter.buildBloom(small, "k", mBits = 1 << 10, k = 3)
    assert(words.length == (1 << 10) / 64)
    // 3 distinct keys × 3 hashes in 1024 bits → fpp ≈ (9/1024)^3 ≈ 7e-7;
    // the surviving probe rows must be the 3 true matches, not ~1000
    val survivors = RuntimeFilter.prune(big, "k", words, mBits = 1 << 10).count()
    assert(survivors == 3)
  }

  test("membership test stays codegen'd on a parquet scan (no UDF)") {
    // local Seqs get ConvertToLocalRelation-folded, so drive a real scan
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val keys = Seq(1L, 7L, 42L).toDF("l_orderkey")
    val words = RuntimeFilter.buildBloom(keys, "l_orderkey", mBits = 1 << 10, k = 3)
    val pruned = RuntimeFilter.prune(
      li.select("l_orderkey", "l_quantity"), "l_orderkey", words, 1 << 10)
    pruned.collect() // finalize THIS df's AQE plan (count() builds a new QE)
    val plan = pruned.queryExecution.executedPlan.toString
    // the "*(n)" prefix is the WholeStageCodegen marker in simpleString;
    // the MEMBERSHIP TEST ITSELF (the xxhash64 probe against the
    // broadcast bitmap column) must sit on a codegen'd node — asserting
    // "some codegen stage exists" and "xxhash64 appears somewhere"
    // independently would pass even if only the scan were codegen'd
    val codegenMembership =
      """(?m)^\s*(?:[:+\- ]*)\*\(\d+\) .*xxhash64""".r.findFirstIn(plan)
    assert(codegenMembership.isDefined,
      s"xxhash64 membership test not inside a *(n) codegen node:\n$plan")
    assert(plan.contains("__bloom_words"), plan)
    assert(!plan.contains("BatchEvalPython"), plan)
    // and the pruned scan still returns every true match
    val trueMatches = li.join(keys, Seq("l_orderkey")).count()
    assert(pruned.join(keys, Seq("l_orderkey")).count() == trueMatches)
  }

  test("plan size stays O(1) in mBits: one bitmap copy, no literal blowup") {
    // at the default mBits = 2^20 the bitmap is 16,384 longs; inlined as
    // an expression literal it appeared SIX times through the plan
    // (k=3 probes × both join sides via constraint propagation) — a
    // multi-MB plan that broke codegen. Bound once as broadcast relation
    // data, every plan string must stay small no matter the mBits.
    val joined = RuntimeFilter.bloomPrunedJoin(big, small.distinct(), "k",
      mBits = 1 << 20)
    val qe = joined.queryExecution
    val planChars =
      qe.optimizedPlan.toString.length + qe.executedPlan.toString.length
    assert(planChars < 100000,
      s"plan strings total $planChars chars — bitmap leaked into the plan?")
    // output invariance must survive the rebinding
    val got = joined.orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == Seq((3L, "row3"), (500L, "row500"), (999L, "row999")))
  }

  test("prune survives a caller column named __bloom_words") {
    val withClash = big.withColumn("__bloom_words", lit("mine"))
    val words = RuntimeFilter.buildBloom(small, "k", mBits = 1 << 10, k = 3)
    val pruned = RuntimeFilter.prune(withClash, "k", words, mBits = 1 << 10)
    // the caller's column must come through untouched, not be dropped
    // or made ambiguous by the broadcast frame's internal column
    assert(pruned.columns.toSeq == Seq("k", "payload", "__bloom_words"))
    val rows = pruned.orderBy("k")
      .as[(Long, String, String)].collect().toSeq
    assert(rows == Seq((3L, "row3", "mine"), (500L, "row500", "mine"),
      (999L, "row999", "mine")))
  }
}
