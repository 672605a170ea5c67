package graft

import org.apache.spark.sql.functions._

/** Invariant pins for the round-7 quality/analytics additions
  * (ev_cohort_retention, ev_transitions, ev_sliding_window,
  * ev_drift_chi2, dq_expectations, q_mad_outliers, q_copurchase_pairs,
  * doc_ngram_novelty). Exact values are pinned cross-engine by the
  * DuckDB oracles; these assert the structural identities the hash
  * compare can't localize when they break (conservation of counts,
  * offset-zero retention, window double-counting, verdict polarity).
  */
class QualityEventsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.all.find(_.name == name).get.run(spark, dir)
  // shared adaptive loader: ts_s derived whatever ts physically is
  private lazy val events = sources.EventsTime.load(spark, dir)

  test("ev_cohort_retention: offset 0 is the full cohort; cells conserve active days") {
    val out = q("ev_cohort_retention").collect()
    val day0 = out.filter(_.getLong(1) == 0L)
    assert(day0.nonEmpty)
    assert(day0.forall(r => r.getLong(2) == r.getLong(3) && r.getDouble(4) == 1.0))
    assert(out.forall(r => r.getLong(2) <= r.getLong(3)))
    // sum of cells = number of distinct (user, day) pairs
    val activeDays = events
      .select(col("user_id"), expr("ts_s DIV 86400")).distinct().count()
    assert(out.map(_.getLong(2)).sum == activeDays)
  }

  test("ev_transitions: every event except each user's first contributes one transition") {
    val out = q("ev_transitions").collect()
    val total = events.count()
    val users = events.select("user_id").distinct().count()
    assert(out.map(_.getLong(2)).sum == total - users)
  }

  test("ev_sliding_window: each event is counted in exactly two 300s-aligned windows") {
    val out = q("ev_sliding_window").collect()
    assert(out.map(_.getLong(2)).sum == 2 * events.count())
    assert(out.forall(_.getLong(0) % 300 == 0))
  }

  test("ev_drift_chi2: terms nonnegative, bin counts conserve the stream") {
    val out = q("ev_drift_chi2").collect()
    assert(out.forall(_.getDouble(3) >= 0.0))
    assert(out.map(r => r.getLong(1) + r.getLong(2)).sum == events.count())
  }

  test("ev_drift_ks: one row, sides conserve the stream, ks = D/(na*nb) in [0,1]") {
    val out = q("ev_drift_ks").collect()
    assert(out.length == 1)
    val r = out.head
    val (na, nb, diff, ks) =
      (r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(4))
    assert(na + nb == events.filter(col("value").isNotNull).count())
    assert(na > 0 && nb > 0)
    assert(ks >= 0.0 && ks <= 1.0)
    assert(ks == diff.toDouble / (na.toDouble * nb.toDouble))
    // recompute D at the argmax bucket from scratch — over the SAME
    // null-filtered frame the query uses for its midpoint, or a null
    // value at either time extreme would shift the split point
    val bucket = r.getLong(2)
    val nn = events.filter(col("value").isNotNull)
    val mid = nn.agg(expr("(MIN(ts_s) + MAX(ts_s)) DIV 2")).head.getLong(0)
    val cumA = nn.filter(expr(s"floor(value) <= $bucket AND ts_s <= $mid")).count()
    val cumB = nn.filter(expr(s"floor(value) <= $bucket AND ts_s > $mid")).count()
    assert(diff == math.abs(cumA * nb - cumB * na))
  }

  test("ev_attribution: credits conserve 10000 bps per purchase; positions are 1..n") {
    val out = q("ev_attribution").collect()
    assert(out.nonEmpty)
    val byPurchase = out.groupBy(_.getLong(0))
    // exact conservation — the integer-split remainder rule must not
    // leak or double-count a basis point
    assert(byPurchase.values.forall(_.map(_.getLong(3)).sum == 10000L))
    // positions are a contiguous 1..n ranking per purchase
    assert(byPurchase.values.forall { rows =>
      rows.map(_.getLong(2)).sorted.toSeq == (1L to rows.length).toSeq
    })
  }

  test("ev_funnel_steps: three monotone steps; step 1 equals distinct view users") {
    val out = q("ev_funnel_steps").collect().sortBy(_.getLong(0))
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "view"), (2L, "click"), (3L, "purchase")))
    val ns = out.map(_.getLong(2))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2), ns.mkString(","))
    assert(ns(0) == events.filter(col("event_type") === "view")
      .select("user_id").distinct().count())
    assert(ns(2) > 0, "no user completes the funnel — window too tight to test the chain")
  }

  test("dq_expectations: five verdicts, all passing on the clean testdata") {
    val out = q("dq_expectations").collect()
    assert(out.length == 5)
    assert(out.forall(!_.isNullAt(1)))
    assert(out.forall(_.getBoolean(2)), out.mkString("; "))
  }

  test("q_mad_outliers: nonempty and every flagged row beats its group threshold") {
    val out = q("q_mad_outliers").collect()
    assert(out.nonEmpty)
    assert(out.forall(r =>
      math.abs(r.getDouble(2) - r.getDouble(3)) > 2.0 * r.getDouble(4)))
  }

  test("q_copurchase_pairs: ordered pairs with support at least 2, bounded by basket fanout") {
    val out = q("q_copurchase_pairs").collect()
    assert(out.forall(r => r.getLong(0) < r.getLong(1)))
    assert(out.forall(_.getLong(2) >= 2))
  }

  test("ev_props_extract: per-type sums match an independent JSON-path extraction") {
    val out = q("ev_props_extract").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.values.map(_._1).sum == events.count())
    // cross-check from_json against the independent get_json_object path
    val direct = events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(col("k")).as("n"), sum(col("k")).as("s"), max(col("k")).as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out == direct)
  }

  test("ev_growth_accounting: statuses partition actives; churn balances the day ledger") {
    val out = q("ev_growth_accounting").collect().sortBy(_.getLong(0))
    // new + retained + resurrected = active; actives conserve (user, day)
    assert(out.forall(r => r.getLong(1) + r.getLong(2) + r.getLong(3) == r.getLong(4)))
    val activeDays = events
      .select(col("user_id"), expr("ts_s DIV 86400")).distinct().count()
    assert(out.map(_.getLong(4)).sum == activeDays)
    // on consecutive days: churned(d) = active(d-1) - retained(d)
    out.sliding(2).foreach { case Array(prev, cur) =>
      if (cur.getLong(0) == prev.getLong(0) + 1)
        assert(cur.getLong(5) == prev.getLong(4) - cur.getLong(2))
      case _ => ()
    }
    // cume_users ends at the total distinct-user count
    assert(out.last.getLong(6) == events.select("user_id").distinct().count())
  }

  test("ev_user_daily_gapfill: full user-by-day grid, zeros where inactive, counts conserve") {
    val out = q("ev_user_daily_gapfill")
    val users = events.select("user_id").distinct().count()
    val Array(d0, d1) = events
      .select(expr("MIN(ts_s DIV 86400)"),
        expr("MAX(ts_s DIV 86400)")).collect().head
      .toSeq.map(_.asInstanceOf[Long]).toArray
    assert(out.count() == users * (d1 - d0 + 1))
    assert(out.agg(sum(col("n"))).head.getLong(0) == events.count())
    assert(out.filter(col("n") === 0).count() > 0, "no gaps — spine adds nothing")
  }

  test("ev_interarrival_stats: one row per type; gaps nonnegative, count conserves") {
    val out = q("ev_interarrival_stats").collect()
    val perType = events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val perTypeUsers = events.select("user_id", "event_type").distinct()
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val t = r.getString(0)
      assert(r.getLong(1) == perType(t) - perTypeUsers(t)) // gaps = events - streams
      assert(r.getDouble(3) >= 0 && r.getDouble(4) >= 0)
    }
  }

  test("q_outliers_2d: flagged rows all exceed the cut; cut keeps the tail only") {
    val out = SparkEntry.all.find(_.name == "q_outliers_2d").get.run(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getDouble(4) > 5.5))
    val total = spark.read.parquet(s"$dir/lineitem.parquet").count()
    assert(out.length < total / 50, "cut must select a tail, not the body")
  }

  test("emb_label_centroid: one cell per (label, dim); quantized mean tracks the true mean") {
    val out = q("emb_label_centroid").collect()
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val nLabels = emb.select("label").distinct().count()
    assert(out.length == nLabels * 64)
    // quantized mean within 5e-7 of the float mean per component
    val truth = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos").agg(avg(col("v").cast("double")).as("m"))
      .collect().map(r => (r.getInt(0), r.getInt(1).toLong) -> r.getDouble(2)).toMap
    out.foreach { r =>
      val want = truth((r.getInt(0), r.getLong(1)))
      assert(math.abs(r.getDouble(2) - want) < 5e-7)
    }
  }

  test("ev_trending_topk: dense contiguous ranks per window, counts honor the order") {
    val rows = q("ev_trending_topk").collect()
      .groupBy(_.getLong(0)).values
    rows.foreach { w =>
      val sorted = w.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq == (1L to sorted.length))
      assert(sorted.length <= 3)
      // count non-increasing down the ranks
      sorted.sliding(2).foreach {
        case Array(hi, lo) => assert(hi.getLong(2) >= lo.getLong(2))
        case _ => ()
      }
    }
  }

  test("dedup_lsh_bucket_stats: per-band audit bounds the candidate join") {
    val out = q("dedup_lsh_bucket_stats").collect()
    assert(out.length == 16) // default MinHashParams bands
    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    out.foreach { r =>
      assert(r.getLong(1) <= docs)           // buckets <= docs per band
      assert(r.getLong(2) >= 1)              // max bucket nonempty
      // pair cost of one band is at most the all-pairs worst case
      assert(r.getLong(3) <= docs * (docs - 1) / 2)
    }
    // total candidates across bands >= distinct candidate pairs
    val cands = operators.Dedup.lshCandidates(
      operators.Dedup.minhashSignatures(
        spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text"),
      "doc_id").count()
    assert(out.map(_.getLong(3)).sum >= cands)
  }

  test("format roundtrips: jsonl and orc aggregates equal the parquet path") {
    val want = q("io_orc_roundtrip").collect()
      .map(r => r.getString(0) -> r.toSeq.tail).toMap
    val json = q("io_jsonl_roundtrip").collect()
      .map(r => r.getString(0) -> r.toSeq.tail).toMap
    val parquet = events
      .groupBy("event_type").agg(
        count(lit(1)).as("n"), sum(col("event_id")).as("sum_id"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"),
        min(col("ts_s")).as("min_ts"),
        max(col("ts_s")).as("max_ts"))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(want == parquet && json == parquet)
  }

  test("pipeline_training_manifest: filtered, deduped, and fully split") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val out = q("pipeline_training_manifest").collect()
    val ids = out.map(_.getLong(0)).toSet
    assert(out.length == ids.size) // one row per survivor
    // every manifest doc passed the battery (the registered thresholds)
    val kept = operators.TextAnalysis.filterBattery(docs,
        minTokens = 30, maxTokens = 100000, minAvgLen = 3.0,
        maxAvgLen = 10.0, minAlphaRatio = 0.8, minStopwordHits = 2,
        minDistinctRatio = 0.3)
      .filter(col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(kept))
    // no near-dup pair (within the kept set) survives whole
    val pairs = operators.Dedup.minhashNearDuplicates(
        docs.filter(col("doc_id").isin(kept.toSeq: _*)), "doc_id", "text",
        threshold = 0.7)
      .select("a", "b").collect()
    assert(pairs.forall(p => !(ids(p.getLong(0)) && ids(p.getLong(1)))))
    // splits cover the manifest and only use the three names
    assert(out.map(_.getString(2)).toSet.subsetOf(Set("train", "val", "test")))
  }

  test("dedup_cross_source: unordered source pairs; totals match the pair list") {
    val out = q("dedup_cross_source").collect()
    assert(out.forall(r => r.getString(0) <= r.getString(1)))
    val nPairs = operators.Dedup.minhashNearDuplicates(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
      threshold = 0.7).count()
    assert(out.map(_.getLong(2)).sum == nPairs)
  }

  test("ev_rate_spikes: every flag beats its own trailing-window threshold") {
    val out = q("ev_rate_spikes").collect()
    assert(out.forall(_.getDouble(2) > 3.0))
    // recompute one flagged minute's z from scratch
    if (out.nonEmpty) {
      val minutes = events.select(expr("ts_s DIV 60").as("m"))
        .groupBy("m").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
      val flagged = out.head
      val idx = minutes.indexWhere(_._1 == flagged.getLong(0))
      val win = minutes.slice(math.max(0, idx - 60), idx).map(_._2.toDouble)
      val mean = win.sum / win.length
      val z = (flagged.getLong(1) - mean) /
        math.sqrt(win.map(x => x * x).sum / win.length - mean * mean)
      assert(math.abs(z - flagged.getDouble(2)) < 1e-9)
    }
  }

  test("ev_session_paths: paths are type sequences; session totals conserve") {
    val out = q("ev_session_paths").collect()
    assert(out.nonEmpty && out.length <= 20)
    val types = events.select("event_type").distinct().collect()
      .map(_.getString(0)).toSet
    assert(out.forall(_.getString(0).split(">").forall(types.contains)))
    // top-k ordering: n_sessions non-increasing
    out.sliding(2).foreach {
      case Array(hi, lo) => assert(hi.getLong(1) >= lo.getLong(1))
      case _ => ()
    }
  }

  test("ev_daily_uniques_approx: every day within the 2% sketch contract") {
    val out = q("ev_daily_uniques_approx").collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getBoolean(2)), out.filterNot(_.getBoolean(2)).mkString("; "))
    assert(out.map(_.getLong(1)).sum ==
      events.select(col("user_id"), expr("ts_s DIV 86400"))
        .distinct().count())
  }

  test("doc_ngram_novelty: first doc fully novel; novel grams partition the gram space") {
    val out = q("doc_ngram_novelty").collect()
    assert(out.forall(r => r.getLong(2) <= r.getLong(1)))
    val firstDoc = out.minBy(_.getLong(0))
    assert(firstDoc.getLong(2) == firstDoc.getLong(1))
    // every distinct gram is novel for exactly one doc: sums match
    val distinctGrams = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(operators.TextAnalysis.ngramsAll(
        operators.TextAnalysis.tokens(col("text")), 3)).as("g"))
      .distinct().count()
    assert(out.map(_.getLong(2)).sum == distinctGrams)
  }
}
