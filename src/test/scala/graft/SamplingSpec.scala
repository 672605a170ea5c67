package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Pins the properties that make hash-gated sampling the right
  * primitive at 100 TB: layout-independence (same sample under any
  * partitioning), nesting (smaller rates are subsets of larger), exact
  * stratification, and disjoint-exhaustive splits. The hash itself is
  * cross-engine verified by the driver's DuckDB oracle
  * (doc_sample_strat / doc_split_assign re-derive xxh64 in SQL). */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (0L until 2000L).toDF("id")

  test("sample is a pure function of the id: invariant under re-layout") {
    val a = Sampling.hashSample(ids, "id", 0.3).as[Long].collect().sorted.toSeq
    val b = Sampling.hashSample(ids.repartition(17, col("id") % 7), "id", 0.3)
      .as[Long].collect().sorted.toSeq
    val c = Sampling.hashSample(ids.coalesce(1), "id", 0.3)
      .as[Long].collect().sorted.toSeq
    assert(a == b && a == c)
    // rate is approximately honored (hash uniformity, not exactness)
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05)
  }

  test("samples nest: rate r1 < r2 gives a strict subset") {
    val small = Sampling.hashSample(ids, "id", 0.05).as[Long].collect().toSet
    val big = Sampling.hashSample(ids, "id", 0.5).as[Long].collect().toSet
    assert(small.subsetOf(big))
    assert(small.size < big.size)
  }

  test("rate 0 keeps nothing; rate 1 keeps everything") {
    assert(Sampling.hashSample(ids, "id", 0.0).isEmpty)
    assert(Sampling.hashSample(ids, "id", 1.0).count() == 2000L)
  }

  test("rebalanceClasses: minority kept whole, majorities downsampled toward it") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val kept = Sampling.rebalanceClasses(docs, "doc_id", "lang")
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minN = before.values.min
    // the minority class's rate is exactly 1.0 → kept in full
    val minorityLang = before.minBy(_._2)._1
    assert(after(minorityLang) == minN)
    // every class lands near the minority count (hash-gate variance)
    after.foreach { case (l, n) =>
      assert(math.abs(n - minN) <= math.max(6L, (minN * 0.35).toLong),
        s"$l kept $n vs target $minN (before ${before(l)})")
    }
    // kept set is a subset of the input, layout-independent
    assert(kept.count() ==
      Sampling.rebalanceClasses(docs.repartition(13), "doc_id", "lang").count())
  }

  test("stratified sample applies each stratum's own rate") {
    val strat = ids.withColumn("grp",
      when(col("id") % 2 === 0, "even").otherwise("odd"))
    val got = Sampling.stratifiedHashSample(strat, "id", "grp",
      Map("even" -> 0.8), defaultRate = 0.1)
    val byGrp = got.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(math.abs(byGrp("even") / 1000.0 - 0.8) < 0.08)
    assert(math.abs(byGrp("odd") / 1000.0 - 0.1) < 0.08)
    // per-row membership equals the plain sample at that stratum's rate
    val evens = Sampling.hashSample(strat.filter(col("grp") === "even"), "id", 0.8)
      .as[(Long, String)].collect().toSet
    assert(got.filter(col("grp") === "even")
      .as[(Long, String)].collect().toSet == evens)
  }

  test("splits are disjoint, exhaustive, and consistent with sampling") {
    val split = Sampling.assignSplits(ids, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(split.count() == 2000L)
    val byName = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byName.keySet == Set("train", "val", "test"))
    assert(byName.values.sum == 2000L)
    assert(math.abs(byName("train") / 2000.0 - 0.8) < 0.05)
    // the train split IS the 80% hash sample — shrink/grow comparable
    val train = split.filter(col("split") === "train").select("id")
      .as[Long].collect().toSet
    assert(train == Sampling.hashSample(ids, "id", 0.8).as[Long].collect().toSet)
  }

  test("reservoirPerGroup: exact count, deterministic, nested by rank") {
    val df = ids.withColumn("grp",
      when(col("id") % 3 === 0, "a").otherwise("b"))
    val got = Sampling.reservoirPerGroup(df, Seq("grp"), "id", k = 50)
    val counts = got.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(counts == Map("a" -> 50L, "b" -> 50L))
    // deterministic under re-layout
    val again = Sampling.reservoirPerGroup(
      df.repartition(13, col("id") % 5), Seq("grp"), "id", k = 50)
      .as[(String, Long, Long)].collect().toSet
    assert(again == got.as[(String, Long, Long)].collect().toSet)
    // a smaller reservoir is the rank-prefix of the bigger one
    val small = Sampling.reservoirPerGroup(df, Seq("grp"), "id", k = 10)
      .as[(String, Long, Long)].collect().toSet
    assert(small == got.filter(col("rank") <= 10)
      .as[(String, Long, Long)].collect().toSet)
    // a group smaller than k yields the whole group
    val tiny = df.filter(col("id") < 5) // grp a: {0,3}, b: {1,2,4}
    val t = Sampling.reservoirPerGroup(tiny, Seq("grp"), "id", k = 50)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(t == Map("a" -> 2L, "b" -> 3L))
  }

  test("prioritySample: deterministic, exact-k, weight-dominated") {
    val df = ids.withColumn("w",
      when(col("id") < 100, lit(1000.0)).otherwise(lit(1.0)))
    val s1 = Sampling.prioritySample(df, "id", "w", 50)
      .select("id").as[Long].collect().toSet
    val s2 = Sampling.prioritySample(df.repartition(7), "id", "w", 50)
      .select("id").as[Long].collect().toSet
    assert(s1 == s2) // layout-independent like every sampler here
    assert(s1.size == 50)
    // 100 rows carry 1000× the weight of the other 1900: the sample
    // must be overwhelmingly theirs (a light row needs u < ~1e-3)
    assert(s1.count(_ < 100L) >= 45, s"heavy rows: ${s1.count(_ < 100L)}")
  }

  test("leakageSafeSplit: no cluster straddles the boundary; singletons gate on their own id") {
    // docs 1..40; near-dup pairs chain {1,2,3} and {10,11}; the rest
    // are singletons. The structural pin: every cluster maps to ONE
    // split; the member pin: clustered docs carry their min-id label
    // and gate exactly as that label's singleton would.
    val docs = (1L to 40L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val got = Sampling.leakageSafeSplit(docs, "doc_id", pairs,
        testPermille = 300)
      .as[(Long, Long, String)].collect().toSeq
    assert(got.size == 40)
    val byCluster = got.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(byCluster.values.forall(_.size == 1),
      s"a cluster straddles the split: $byCluster")
    assert(got.filter(r => Set(1L, 2L, 3L)(r._1)).map(_._2).toSet == Set(1L))
    assert(got.filter(r => Set(10L, 11L)(r._1)).map(_._2).toSet == Set(10L))
    // members 2, 3 carry cluster 1's verdict, identical to doc 1's own
    val splitOf = got.map(r => r._1 -> r._3).toMap
    assert(splitOf(2L) == splitOf(1L) && splitOf(3L) == splitOf(1L))
    // both splits are populated at 30% over 37 clusters, and the
    // assignment is layout-invariant
    assert(got.map(_._3).toSet == Set("train", "test"))
    val re = Sampling.leakageSafeSplit(docs.repartition(7), "doc_id",
        pairs.repartition(3), testPermille = 300)
      .as[(Long, Long, String)].collect().toSeq
    assert(re.toSet == got.toSet)
  }

  test("splitBounds: last split absorbs the floating-point remainder") {
    val b = Sampling.splitBounds(Seq("a" -> 0.3, "b" -> 0.3, "c" -> 0.4))
    assert(b.map(_._1) == Seq("a", "b", "c"))
    assert(b.last._2 == Sampling.DefaultDenom)
    assert(b.map(_._2) == b.map(_._2).sorted)
  }
}
