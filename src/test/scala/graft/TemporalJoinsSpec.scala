package graft

import org.apache.spark.sql.functions._
import graft.operators.TemporalJoins

/** Hand-computable fixtures pinning as-of and bounded-range join
  * semantics (tie handling, no-match nulls, window boundaries). */
class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin: latest right row at-or-before each left row, per key") {
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 150L, "p3"))
      .toDF("k", "ts", "name")
    val right = Seq((1L, 90L, "a"), (1L, 100L, "b"), (1L, 199L, "c"),
      (2L, 151L, "d")).toDF("k", "rts", "tag")
    val out = TemporalJoins.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("tag"))
      .select("name", "asof_tag").as[(String, Option[String])].collect().toMap
    assert(out("p1").contains("b")) // tie at ts=100 matches (>= semantics)
    assert(out("p2").contains("c")) // latest of {90,100,199}
    assert(out("p3").isEmpty)       // right row at 151 is AFTER 150 → null
  }

  test("asofJoin: the matched right row is taken atomically — null payload fields survive") {
    // regression: payload columns used to be carried independently with
    // last(ignoreNulls) each, so the true latest row's NULL field was
    // papered over by an older row's value and different fields could
    // come from different right rows
    val left = Seq((1L, 100L, "p1")).toDF("k", "ts", "name")
    val right = Seq(
      (1L, 50L, Some("old-note"), Some(5L)),
      (1L, 90L, None: Option[String], Some(9L)) // the true latest: note IS null
    ).toDF("k", "rts", "note", "click")
    val out = TemporalJoins.asofJoin(left, right, Seq("k"), "ts", "rts",
      Seq("note", "click"))
      .select("asof_note", "asof_click")
      .as[(Option[String], Option[Long])].head()
    assert(out == (None, Some(9L)), s"expected the ts=90 row atomically, got $out")
  }

  test("asofJoin: left rows with no right rows for the key keep nulls") {
    val left = Seq((9L, 10L, "lonely")).toDF("k", "ts", "name")
    val right = Seq((1L, 5L, "x")).toDF("k", "rts", "tag")
    val out = TemporalJoins.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("tag"))
    assert(out.count() === 1)
    assert(out.filter(col("asof_tag").isNull).count() === 1)
  }

  test("boundedRangeJoin: exact [lo, hi) window, key-scoped, slot edges") {
    val left = Seq((1L, 1000L, "e1"), (1L, 2000L, "e2")).toDF("k", "ts", "name")
    // window [-300, 0) before each left ts
    val right = Seq(
      (1L, 700L),  // = e1.ts - 300 → included (closed lo)
      (1L, 999L),  // just before e1 → included
      (1L, 1000L), // equal → excluded (open hi)
      (1L, 1999L), // before e2 → included
      (2L, 998L)   // wrong key → excluded
    ).toDF("k", "rts")
    val pairs = TemporalJoins.boundedRangeJoin(left, right, Seq("k"),
      "ts", "rts", lo = -300, hi = 0)
    val byName = pairs.groupBy("name").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(byName === Map("e1" -> 2L, "e2" -> 1L))
  }

  test("boundedRangeJoin: windows spanning a slot boundary are not dropped") {
    // slot width = hi-lo = 100; left ts=250 window [150,250) crosses the
    // 100-wide slot boundary at 200 — both slots must be probed
    val left = Seq((1L, 250L, "e")).toDF("k", "ts", "name")
    val right = Seq((1L, 155L), (1L, 249L)).toDF("k", "rts")
    val pairs = TemporalJoins.boundedRangeJoin(left, right, Seq("k"),
      "ts", "rts", lo = -100, hi = 0)
    assert(pairs.count() === 2)
  }

  test("intervalOverlapJoin: exact overlap semantics, slot spans, exactly-once") {
    // slot = 10. Pairs crossing many buckets must appear ONCE; touching
    // endpoints (half-open) must not match; empty intervals join nothing.
    val l = Seq(
      (1L, 5L, 35L, "A"),   // spans buckets 0..3
      (1L, 40L, 41L, "B"),  // [40,41)
      (1L, 50L, 50L, "E"),  // empty
      (2L, 5L, 35L, "K2")   // wrong key for everything on key 1
    ).toDF("k", "ls", "le", "lname")
    val r = Seq(
      (1L, 30L, 60L, "X"),  // overlaps A on [30,35), B on [40,41)
      (1L, 35L, 36L, "Y"),  // touches A's end — NO match (half-open)
      (1L, 0L, 6L, "Z")     // overlaps A on [5,6)
    ).toDF("k", "rs", "re", "rname")
    val got = TemporalJoins.intervalOverlapJoin(l, r, Seq("k"),
        "ls", "le", "rs", "re", slot = 10L)
      .select("lname", "rname").as[(String, String)].collect()
    assert(got.length == got.distinct.length,
      s"a pair emitted twice: ${got.toSeq}")
    assert(got.toSet == Set(("A", "X"), ("B", "X"), ("A", "Z")),
      s"got ${got.toSet}")
    // randomized model check incl. a slot much smaller than intervals
    val rng = new scala.util.Random(2236L)
    for (slot <- Seq(3L, 7L, 100L)) {
      val ls = (0 until 25).map(i => (rng.nextInt(3).toLong,
        rng.nextInt(60).toLong, rng.nextInt(60).toLong, i.toLong))
      val rs = (0 until 25).map(i => (rng.nextInt(3).toLong,
        rng.nextInt(60).toLong, rng.nextInt(60).toLong, i.toLong))
      val gotR = TemporalJoins.intervalOverlapJoin(
          ls.toDF("k", "ls", "le", "lid"), rs.toDF("k", "rs", "re", "rid"),
          Seq("k"), "ls", "le", "rs", "re", slot)
        .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
      val want = (for {
        (lk, a, b, li) <- ls if b > a
        (rk, c, d2, ri) <- rs if d2 > c && rk == lk && a < d2 && c < b
      } yield (li, ri)).sorted
      assert(gotR == want, s"slot=$slot: got $gotR want $want")
    }
  }

  test("intervalOverlapJoin and boundedRangeJoin: exact bucketing beyond 2^53 (epoch-nanos territory)") {
    // regression: bucket/slot once divided via double `/`; above 2^53
    // the numerator rounds, shifting rows one bucket and silently
    // dropping matches. Base ≈ 1.15e18 is epoch-micros/nanos scale.
    val base = (1L << 60) + 1L // odd, not slot-aligned
    val l = Seq((1L, base + 5L, base + 35L, "A")).toDF("k", "ls", "le", "lname")
    val r = Seq(
      (1L, base + 30L, base + 60L, "X"), // overlaps A on [base+30, base+35)
      (1L, base + 35L, base + 36L, "Y")  // touches A's end — no match
    ).toDF("k", "rs", "re", "rname")
    val got = TemporalJoins.intervalOverlapJoin(l, r, Seq("k"),
        "ls", "le", "rs", "re", slot = 10L)
      .select("lname", "rname").as[(String, String)].collect().toSeq
    assert(got == Seq(("A", "X")), s"got $got")
    val bl = Seq((1L, base + 100L, 7L)).toDF("k", "ts", "lid")
    val br = Seq((1L, base + 99L, 70L), (1L, base + 105L, 71L),
      (1L, base + 110L, 72L)).toDF("k", "rts", "rid")
    val gotR = TemporalJoins.boundedRangeJoin(bl, br, Seq("k"),
        "ts", "rts", lo = 0L, hi = 10L, payload = Seq("rid"))
      .select("rid").as[Long].collect().toSet
    assert(gotR == Set(71L), s"got $gotR") // [ts, ts+10): 105 in, 99/110 out
  }

  test("asofJoin query shape matches an independent sort-based model") {
    // randomized cross-check: 3 keys × interleaved timestamps
    val rnd = new scala.util.Random(7)
    // unique right-side timestamps: the operator (like ANSI ASOF JOIN)
    // picks arbitrarily among right rows tied on (key, ts)
    val rts = rnd.shuffle((0 until 1000).toVector).take(80)
    val lrows = Seq.tabulate(60)(i => (rnd.nextInt(3).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val rrows = rts.zipWithIndex.map { case (t, i) => (rnd.nextInt(3).toLong, t.toLong, 1000L + i) }
    val left = lrows.toDF("k", "ts", "lid")
    val right = rrows.toDF("k", "rts", "rid")
    val got = TemporalJoins.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("rid"))
      .select("lid", "asof_rid").as[(Long, Option[Long])].collect().toMap
    lrows.foreach { case (k, ts, lid) =>
      val want = rrows.filter(r => r._1 == k && r._2 <= ts)
        .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
      assert(got(lid) === want, s"lid=$lid k=$k ts=$ts")
    }
  }
}
