package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Semantics pins for the integer PageRank: structural ordering on a
  * hand graph, exact symmetry, totality over endpoints, and the
  * property the integer scheme exists for — partitioning invariance
  * (bit-identical ranks under a different physical layout). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // triangle {1,2,3} with a pendant 4 hanging off 3:
  // degrees 1→2, 2→2, 3→3, 4→1
  private lazy val edges =
    Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("pa", "pb")

  private def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select("id", "rank_micro").as[(Long, Long)].collect().toMap

  test("structural order: hub ranks highest, pendant lowest, twins tie exactly") {
    val r = ranks(Graph.pageRank(edges, "pa", "pb"))
    assert(r.keySet == Set(1L, 2L, 3L, 4L), "every endpoint gets a rank")
    assert(r(1L) == r(2L),
      "1 and 2 are automorphic (both border exactly {the other, 3}) — integer ranks must tie exactly")
    assert(r(3L) > r(1L), "the triangle hub out-ranks its spokes")
    assert(r(1L) > r(4L), "a two-neighbor spoke out-ranks the one-neighbor pendant")
  }

  test("rank mass stays within the damped fixpoint envelope") {
    // with undirected edges there is no dangling loss; truncation only
    // ever discards mass, so total rank lives in
    // (n * 150000, n * 1000000]
    val r = ranks(Graph.pageRank(edges, "pa", "pb"))
    val total = r.values.sum
    assert(total > 4L * 150000L && total <= 4L * 1000000L,
      s"total rank mass $total outside the damped envelope")
  }

  test("partitioning invariance: a different layout yields bit-identical ranks") {
    val base = ranks(Graph.pageRank(edges, "pa", "pb"))
    val shuffled = ranks(Graph.pageRank(
      edges.repartition(7, col("pb")).sortWithinPartitions(desc("pa")),
      "pa", "pb"))
    assert(base == shuffled,
      "integer ranks must not depend on partitioning or row order")
  }

  test("single iteration matches the hand-computed update") {
    // r0 = 1e6 each; contrib(v) = 1e6 div deg(v);
    // r1(u) = 150000 + 85 * (sum of neighbors' contribs) div 100
    val r = ranks(Graph.pageRank(edges, "pa", "pb", iterations = 1))
    val c = Map(1L -> 500000L, 2L -> 500000L, 3L -> 333333L, 4L -> 1000000L)
    def expect(nbrs: Long*) =
      150000L + (85L * nbrs.map(c).sum) / 100L
    assert(r(1L) == expect(2L, 3L))
    assert(r(2L) == expect(1L, 3L))
    assert(r(3L) == expect(1L, 2L, 4L))
    assert(r(4L) == expect(3L))
  }

  test("triangleCounts: hand-computed participation and clustering coefficient") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "degree", "n_tri", "cc_permille")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val got = rows(Graph.triangleCounts(edges, "pa", "pb"))
    // one triangle {1,2,3}; pendant 4 closes nothing.
    // cc = 2000·tri div (d·(d−1)): 1,2 → 1000‰; 3 → 333‰; 4 → 0
    assert(got == Seq(
      (1L, 2L, 1L, 1000L), (2L, 2L, 1L, 1000L),
      (3L, 3L, 1L, 333L), (4L, 1L, 0L, 0L)))
    // orientation/partitioning must not change the exact counts
    val re = rows(Graph.triangleCounts(
      edges.repartition(7, col("pb")).sortWithinPartitions(desc("pa")), "pa", "pb"))
    assert(re == got)
  }

  test("personalizedPageRank: single iteration matches the hand-computed update") {
    // seed {3}: r0 = (0, 0, 1e6, 0); contrib(3) = 1e6 div 3 = 333333;
    // r1(1) = r1(2) = r1(4) = 0 + 85·333333 div 100 = 283333;
    // r1(3) = 150000 + 85·0 div 100 = 150000 (its neighbors hold 0)
    val r = ranks(Graph.personalizedPageRank(edges, "pa", "pb",
      id => id === 3L, iterations = 1))
    assert(r == Map(1L -> 283333L, 2L -> 283333L, 3L -> 150000L, 4L -> 283333L),
      s"hand-computed PPR round mismatch: $r")
  }

  test("personalizedPageRank: seed-proximity order and partitioning invariance") {
    val r = ranks(Graph.personalizedPageRank(edges, "pa", "pb", id => id === 3L))
    assert(r.keySet == Set(1L, 2L, 3L, 4L))
    assert(r(3L) > r(1L) && r(3L) > r(4L), "the seed holds the most mass")
    assert(r(1L) == r(2L), "automorphic spokes tie exactly")
    assert(r(1L) > r(4L),
      "two-path spokes outrank the single-path pendant under seed teleport")
    val re = ranks(Graph.personalizedPageRank(
      edges.repartition(5, col("pa")).sortWithinPartitions(desc("pb")),
      "pa", "pb", id => id === 3L))
    assert(re == r, "integer PPR must be partitioning-invariant")
  }

  test("labelPropagation: one round on a star adopts the min neighbor label") {
    // star 0-1, 0-2, 0-3: after one round the center sees labels
    // {1,2,3} all at count 1 → tie to min = 1; each leaf sees only {0}
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("pa", "pb")
    val got = Graph.labelPropagation(star, "pa", "pb", rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 1L, 1L -> 0L, 2L -> 0L, 3L -> 0L), s"got $got")
  }

  test("labelPropagation: randomized model check and partitioning invariance") {
    val rng = new scala.util.Random(31415L)
    for (trial <- 1 to 3) {
      val n = 20
      val es = (0 until 45).map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      val rounds = 1 + rng.nextInt(3)
      val df = es.toDF("pa", "pb")
      val got = Graph.labelPropagation(df, "pa", "pb", rounds)
        .as[(Long, Long)].collect().toMap
      // driver-side synchronous LPA: most frequent neighbor label,
      // ties to the smallest label
      val adj = (es ++ es.map(_.swap)).distinct.groupBy(_._1)
        .view.mapValues(_.map(_._2)).toMap
      var lbl = adj.keys.map(v => v -> v).toMap
      for (_ <- 1 to rounds) {
        lbl = adj.map { case (v, nbrs) =>
          val counts = nbrs.map(lbl).groupBy(identity).view.mapValues(_.size)
          v -> counts.toSeq.maxBy { case (l, c) => (c, -l) }._1
        }
      }
      assert(got == lbl, s"trial $trial (rounds=$rounds): got $got want $lbl")
      val re = Graph.labelPropagation(
        df.repartition(5, col("pb")).sortWithinPartitions(desc("pa")),
        "pa", "pb", rounds).as[(Long, Long)].collect().toMap
      assert(re == got, "LPA must be partitioning-invariant")
    }
  }

  test("labelPropagation: string vertex ids keep their labels (tie-break never negates the label)") {
    // the (count DESC, label ASC) argmax must work for ANY orderable
    // label type — an arithmetic negation of the label would null out
    // string ids silently
    val star = Seq(("hub", "a"), ("hub", "b"), ("hub", "c")).toDF("pa", "pb")
    val got = Graph.labelPropagation(star, "pa", "pb", rounds = 1)
      .as[(String, String)].collect().toMap
    assert(got == Map("hub" -> "a", "a" -> "hub", "b" -> "hub", "c" -> "hub"),
      s"string-labeled LPA round mismatch: $got")
  }

  test("kCore: hand-computed peel on a path plus a triangle, stability round reported") {
    // path 1-2-3-4-5 peels endpoint-inward over 3 rounds; the triangle
    // {6,7,8} is the 2-core. Rounds: s1 drops {1,5}, s2 drops {2,4},
    // s3 drops {3}, s4 unchanged → rounds_stable = 3
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (6L, 7L), (7L, 8L), (6L, 8L)).toDF("pa", "pb")
    val got = Graph.kCore(g, "pa", "pb", k = 2, rounds = 8)
      .as[(Long, Boolean, Long)].collect().toSet
    val want = (1L to 5L).map(v => (v, false, 3L)).toSet ++
      (6L to 8L).map(v => (v, true, 3L)).toSet
    assert(got == want, s"got $got")
    // a truncated budget reports rounds_stable == rounds (no stable
    // round observed) and the not-yet-peeled middle survives
    val early = Graph.kCore(g, "pa", "pb", k = 2, rounds = 2)
      .as[(Long, Boolean, Long)].collect().toSet
    assert(early.forall(_._3 == 2L), s"truncated peel must self-report: $early")
    assert(early.filter(_._2).map(_._1) == Set(3L, 6L, 7L, 8L), s"got $early")
  }

  test("kCore: randomized model check against driver-side peeling") {
    val rng = new scala.util.Random(2718L)
    for (trial <- 1 to 3) {
      val n = 18
      val es = (0 until 40).map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      val k = 2 + rng.nextInt(2)
      val got = Graph.kCore(es.toDF("pa", "pb"), "pa", "pb", k, rounds = 12)
        .as[(Long, Boolean, Long)].collect()
      // driver model: synchronous peel to fixpoint
      val sym = (es ++ es.map(_.swap)).distinct
      var surv = sym.map(_._1).toSet
      var changed = true
      var roundsUsed = 0
      while (changed) {
        val deg = sym.filter(e => surv(e._1) && surv(e._2))
          .groupBy(_._1).view.mapValues(_.size).toMap
        val next = surv.filter(v => deg.getOrElse(v, 0) >= k)
        changed = next != surv
        if (changed) roundsUsed += 1
        surv = next
      }
      assert(roundsUsed < 12, s"trial $trial: fixture needs more rounds")
      val gotCore = got.filter(_._2).map(_._1).toSet
      assert(gotCore == surv, s"trial $trial (k=$k): got $gotCore want $surv")
      assert(got.forall(_._3 == roundsUsed.toLong),
        s"trial $trial: rounds_stable ${got.head._3} want $roundsUsed")
    }
  }

  test("weightedKCore: strength keeps a heavy tie the degree peel drops") {
    // pendant pair 1-2 with weight 10: degree-1 vertices, so ANY
    // unweighted k=2 core drops them — but their strength is 10.
    // Triangle {6,7,8} at weight 2 each: strength 4/vertex. With
    // minStrength=5 the HEAVY PENDANT survives and the triangle peels
    // (round 1 drops 6,7,8 together; round 2 observes stability).
    val g = Seq((1L, 2L, 10L), (6L, 7L, 2L), (7L, 8L, 2L), (6L, 8L, 2L))
      .toDF("pa", "pb", "w")
    val got = Graph.weightedKCore(g, "pa", "pb", "w", minStrength = 5L,
        rounds = 8).as[(Long, Boolean, Long)].collect().toSet
    val want = Set((1L, true, 1L), (2L, true, 1L),
      (6L, false, 1L), (7L, false, 1L), (8L, false, 1L))
    assert(got == want, s"got $got")
  }

  test("weightedKCore: uniform weights reduce bit-exactly to kCore") {
    val rng = new scala.util.Random(31416L)
    val es = (0 until 40).map(_ => (rng.nextInt(18).toLong, rng.nextInt(18).toLong))
      .filter(e => e._1 != e._2).distinct
    val uni = es.map(e => (e._1, e._2, 3L)).toDF("pa", "pb", "w")
    // strength = 3·degree, so minStrength 3k ≡ degree ≥ k
    val wgt = Graph.weightedKCore(uni, "pa", "pb", "w", minStrength = 6L,
      rounds = 12).as[(Long, Boolean, Long)].collect().toSet
    val unw = Graph.kCore(es.toDF("pa", "pb"), "pa", "pb", k = 2,
      rounds = 12).as[(Long, Boolean, Long)].collect().toSet
    assert(wgt == unw, s"weighted=$wgt unweighted=$unw")
  }

  test("weightedKCore: randomized model check against driver-side strength peel") {
    val rng = new scala.util.Random(27183L)
    for (trial <- 1 to 3) {
      val n = 16
      val es = (0 until 36)
        .map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong, 1L + rng.nextInt(5)))
        .filter(e => e._1 != e._2)
        .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq
      val s = 4L + rng.nextInt(4)
      val got = Graph.weightedKCore(es.toDF("pa", "pb", "w"), "pa", "pb",
        "w", minStrength = s, rounds = 12)
        .as[(Long, Boolean, Long)].collect()
      // driver model: symmetric max-collapsed weights, synchronous
      // strength peel to fixpoint
      val sym = (es ++ es.map(e => (e._2, e._1, e._3)))
        .groupBy(e => (e._1, e._2)).map { case (k, v) => (k._1, k._2, v.map(_._3).max) }
        .toSeq
      var surv = sym.map(_._1).toSet
      var changed = true
      var roundsUsed = 0
      while (changed) {
        val st = sym.filter(e => surv(e._1) && surv(e._2))
          .groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
        val next = surv.filter(v => st.getOrElse(v, 0L) >= s)
        changed = next != surv
        if (changed) roundsUsed += 1
        surv = next
      }
      assert(roundsUsed < 12, s"trial $trial: fixture needs more rounds")
      val gotCore = got.filter(_._2).map(_._1).toSet
      assert(gotCore == surv, s"trial $trial (s=$s): got $gotCore want $surv")
      assert(got.forall(_._3 == roundsUsed.toLong),
        s"trial $trial: rounds_stable ${got.head._3} want $roundsUsed")
    }
  }

  test("weightedShortestPaths: cheap detour beats the expensive direct edge") {
    // seed {1}; direct 1-2 costs 10, but 1-3-4-2 costs 1+1+1 = 3.
    // Rounds: r1 sets 2→10, 3→1; r2 adds 4→2; r3 improves 2→3;
    // r4 observes no change → rounds_stable = 3.
    val g = Seq((1L, 2L, 10L), (1L, 3L, 1L), (3L, 4L, 1L), (4L, 2L, 1L))
      .toDF("pa", "pb", "c")
    val got = Graph.weightedShortestPaths(g, "pa", "pb", "c",
        id => id === 1L, rounds = 8)
      .as[(Long, Long, Long)].collect().toSet
    val want = Set((1L, 0L, 3L), (2L, 3L, 3L), (3L, 1L, 3L), (4L, 2L, 3L))
    assert(got == want, s"got $got")
    // a truncated budget reports rounds_stable == rounds and carries
    // the best ≤2-edge paths (2 still at the direct 10)
    val early = Graph.weightedShortestPaths(g, "pa", "pb", "c",
        id => id === 1L, rounds = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(early == Set((1L, 0L, 2L), (2L, 10L, 2L), (3L, 1L, 2L), (4L, 2L, 2L)),
      s"got $early")
  }

  test("weightedShortestPaths: unreachable component absent; randomized model check") {
    val disc = Seq((1L, 2L, 4L), (8L, 9L, 1L)).toDF("pa", "pb", "c")
    val d = Graph.weightedShortestPaths(disc, "pa", "pb", "c",
        id => id === 1L, rounds = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(d == Set((1L, 0L, 1L), (2L, 4L, 1L)), s"got $d")

    val rng = new scala.util.Random(16180L)
    for (trial <- 1 to 3) {
      val n = 14
      val es = (0 until 30)
        .map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong, 1L + rng.nextInt(9)))
        .filter(e => e._1 != e._2)
        .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq
      val got = Graph.weightedShortestPaths(es.toDF("pa", "pb", "c"),
          "pa", "pb", "c", id => id % 4 === 0, rounds = 16)
        .as[(Long, Long, Long)].collect()
      // driver model: symmetric max-collapsed costs, Bellman-Ford to
      // fixpoint
      val sym = (es ++ es.map(e => (e._2, e._1, e._3)))
        .groupBy(e => (e._1, e._2)).map { case (k, v) => (k._1, k._2, v.map(_._3).max) }
        .toSeq
      var dist = sym.map(_._1).distinct.filter(_ % 4 == 0).map(v => v -> 0L).toMap
      var changed = true
      var roundsUsed = 0
      while (changed) {
        val relaxed = sym.flatMap { case (u, v, c) => dist.get(u).map(du => v -> (du + c)) }
        val next = (dist.toSeq ++ relaxed).groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2).min }
        changed = next != dist
        if (changed) roundsUsed += 1
        dist = next
      }
      assert(roundsUsed < 16, s"trial $trial: fixture needs more rounds")
      val gotMap = got.map(r => r._1 -> r._2).toMap
      assert(gotMap == dist, s"trial $trial: got $gotMap want $dist")
      assert(got.forall(_._3 == roundsUsed.toLong),
        s"trial $trial: rounds_stable ${got.headOption.map(_._3)} want $roundsUsed")
    }
  }

  test("weightedSeedCloseness: sum-of-costs closeness, detour distances enter the aggregate") {
    // seed 4 (the only id ≡ 0 mod 4 present): edges 4-2 cost 10,
    // 4-3 cost 1, 3-2 cost 1 → dist {2: 2 (detour), 3: 1};
    // n_reached = 2, total = 3, closeness = 2e6 div 3 = 666666.
    // Seed 8 is isolated in a 2nd component with one cost-5 edge:
    // dist {9: 5} → closeness = 1e6 div 5 = 200000.
    val g = Seq((4L, 2L, 10L), (4L, 3L, 1L), (3L, 2L, 1L), (8L, 9L, 5L))
      .toDF("pa", "pb", "c")
    val got = Graph.weightedSeedCloseness(g, "pa", "pb", "c",
        id => id % 4 === 0, rounds = 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((4L, 2L, 3L, 666666L), (8L, 1L, 5L, 200000L)),
      s"got $got")
    // hop-uniform costs reduce to seedCloseness exactly
    val uni = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
      .toDF("pa", "pb", "c")
    val w = Graph.weightedSeedCloseness(uni, "pa", "pb", "c",
        id => id === 1L, rounds = 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    val h = Graph.seedCloseness(uni.drop("c"), "pa", "pb",
        id => id === 1L, maxHops = 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(w == h, s"weighted=$w hop=$h")
  }

  test("weightedAssortativity: uniform weights reduce to the degree form; driver model check") {
    val rng = new scala.util.Random(14142L)
    val es = (0 until 30).map(_ => (rng.nextInt(12).toLong, rng.nextInt(12).toLong))
      .filter(e => e._1 != e._2).distinct
    // uniform weights: num and den scale by exactly c^4 → same r
    val uni = es.map(e => (e._1, e._2, 3L)).toDF("pa", "pb", "w")
    val rw = Graph.weightedAssortativity(uni, "pa", "pb", "w")
      .select("assortativity").as[Double].head()
    val rd = Graph.degreeAssortativity(es.toDF("pa", "pb"), "pa", "pb")
      .select("assortativity").as[Double].head()
    assert(rw == rd, s"uniform-weight $rw != degree $rd")
    // non-uniform weights against an exact driver-side model
    val wes = es.map(e => (e._1, e._2, 1L + (e._1 + e._2) % 5))
    // diagnostic sums emit as plain BIGINT (the only decimal128 wire
    // type of the registry proved driver-hash-fragile; the internal
    // accumulator stays DECIMAL(38,0) behind the assert_true guard)
    val got = Graph.weightedAssortativity(wes.toDF("pa", "pb", "w"),
        "pa", "pb", "w")
      .as[(Long, Long, Long, Long, Double)].head()
    val sym = (wes ++ wes.map(e => (e._2, e._1, e._3)))
      .groupBy(e => (e._1, e._2)).map { case (k, v) => (k._1, k._2, v.map(_._3).max) }
      .toSeq
    val st = sym.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val (wt, sx, sxy, sx2) = sym.foldLeft((0L, 0L, 0L, 0L)) {
      case ((a, b, c, d2), (u, v, w)) =>
        (a + w, b + w * st(u), c + w * st(u) * st(v), d2 + w * st(u) * st(u))
    }
    assert((got._1, got._2, got._3, got._4) == ((wt, sx, sxy, sx2)),
      s"sums: got $got want ($wt, $sx, $sxy, $sx2)")
    val den = wt * sx2 - sx * sx
    val want = if (den == 0L) 0.0 else (wt * sxy - sx * sx).toDouble / den.toDouble
    assert(got._5 == want, s"r: got ${got._5} want $want")
  }

  test("bfsHops: hop distances on a path graph, horizon cuts cleanly") {
    // path 1-2-3-4-5, seed {1}: hops 0,1,2,3; 5 is beyond maxHops=3
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("pa", "pb")
    val got = Graph.bfsHops(path, "pa", "pb", id => id === 1L, maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L),
      s"expected the path layering without vertex 5, got $got")
    // a generous horizon early-exits once the frontier drains and
    // returns the identical full reachability
    val wide = Graph.bfsHops(path, "pa", "pb", id => id === 1L, maxHops = 50)
      .as[(Long, Long)].collect().toMap
    assert(wide == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L),
      s"expected full reachability under the wide horizon, got $wide")
  }

  test("bfsHops: minimum hop wins on a diamond, seeds stay at 0") {
    // diamond 1-2, 1-3, 2-4, 3-4 plus a long detour 2-5, 5-4: vertex 4
    // is reachable in 2 (via 2 or 3) and in 3 (via 5) — MUST report 2
    val g = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (2L, 5L), (5L, 4L))
      .toDF("pa", "pb")
    val got = Graph.bfsHops(g, "pa", "pb", id => id === 1L, maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L))
  }

  test("bfsHops: randomized model check against driver-side BFS") {
    val rng = new scala.util.Random(20260814L)
    for (trial <- 1 to 3) {
      val n = 30
      val es = (0 until 60).map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      val maxHops = 1 + rng.nextInt(3)
      val got = Graph.bfsHops(es.toDF("pa", "pb"), "pa", "pb",
        id => id % 7 === 0, maxHops).as[(Long, Long)].collect().toMap
      // reference: plain queue BFS over the adjacency map
      val adj = (es ++ es.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val verts = es.flatMap(e => Seq(e._1, e._2)).distinct
      val want = scala.collection.mutable.Map[Long, Long]()
      var frontier = verts.filter(_ % 7 == 0).toSet
      frontier.foreach(v => want(v) = 0L)
      for (h <- 1 to maxHops) {
        frontier = frontier.flatMap(v => adj.getOrElse(v, Seq.empty))
          .filterNot(want.contains)
        frontier.foreach(v => want(v) = h.toLong)
      }
      assert(got == want.toMap,
        s"trial $trial (maxHops=$maxHops): got $got, want $want")
    }
  }

  test("seedCloseness: hand path fixture — horizon cut, micro units, isolated seed scores 0") {
    // path 0-1-2-3-4 plus isolated edge 100-101; seeds 0 and 100
    // (id % 100 == 0). Seed 0 at maxHops=3 reaches 1,2,3 → n=3,
    // Σh=1+2+3=6, closeness = 1e6·3 div 6 = 500000. Seed 100 reaches
    // 101 → n=1, Σh=1, closeness = 1000000.
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L),
      (100L, 101L)).toDF("a", "b")
    val got = Graph.seedCloseness(edges, "a", "b", id => id % 100 === 0,
      maxHops = 3).orderBy("seed")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 3L, 6L, 500000L), (100L, 1L, 1L, 1000000L)),
      s"got $got")
  }

  test("seedCloseness: randomized model check against per-seed driver BFS") {
    val rng = new scala.util.Random(20260816L)
    for (trial <- 1 to 3) {
      val n = 30
      val es = (0 until 55).map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      val maxHops = 1 + rng.nextInt(3)
      val got = Graph.seedCloseness(es.toDF("pa", "pb"), "pa", "pb",
        id => id % 5 === 0, maxHops)
        .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
      val adj = (es ++ es.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val verts = es.flatMap(e => Seq(e._1, e._2)).distinct
      val want = verts.filter(_ % 5 == 0).sorted.map { s =>
        val hops = scala.collection.mutable.Map(s -> 0L)
        var frontier = Set(s)
        for (h <- 1 to maxHops) {
          frontier = frontier.flatMap(v => adj.getOrElse(v, Seq.empty))
            .filterNot(hops.contains)
          frontier.foreach(v => hops(v) = h.toLong)
        }
        val reached = hops.size - 1L
        val total = hops.values.sum
        (s, reached, total,
          if (total > 0) 1000000L * reached / total else 0L)
      }
      assert(got == want, s"trial $trial (maxHops=$maxHops): got $got, want $want")
    }
  }

  test("linkPredictionRA: hand wedge on a path, hub center excluded by the cap") {
    // path 1-2-3: center 2 (deg 2) implies the absent edge (1,3) with
    // weight 1e9 div 2; hub 100 (deg 4 > cap 3) is excluded as a
    // center, so none of its leaf pairs appear at all
    val edges = Seq((1L, 2L), (2L, 3L), (100L, 4L), (100L, 5L),
      (100L, 6L), (100L, 7L)).toDF("a", "b")
    val got = Graph.linkPredictionRA(edges, "a", "b",
      maxCenterDegree = 3, topK = 10)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 3L, 1L, 500000000L, 0.5)))
  }

  test("linkPredictionRA: existing edges never predicted (anti-join)") {
    // triangle 1-2-3 plus tail 3-4: centers imply (1,4),(2,4) [via 3]
    // and (1,3)/(2,3)/(1,2) — but the latter three EXIST and must not
    // appear
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val got = Graph.linkPredictionRA(edges, "a", "b",
      maxCenterDegree = 10, topK = 10)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // center 3 has degree 3 → each wedge contributes 1e9 div 3
    assert(got == Seq((1L, 4L, 1L, 333333333L, 0.333333333),
      (2L, 4L, 1L, 333333333L, 0.333333333)))
  }

  test("linkPredictionRA: randomized model check against driver-side brute force") {
    val rng = new scala.util.Random(20260815L)
    for (trial <- 1 to 3) {
      val n = 24
      val cap = 2L + rng.nextInt(8)
      val es = (0 until 50).map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      // ask for every candidate so the whole scored set is compared
      val got = Graph.linkPredictionRA(es.toDF("pa", "pb"), "pa", "pb",
        maxCenterDegree = cap, topK = 10000)
        .as[(Long, Long, Long, Long, Double)].collect().toSeq
        .map(r => (r._1, r._2, r._3, r._4))
      val adj = (es ++ es.map(_.swap)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val edgeSet = es.toSet
      val want = (for {
        (w, nbrs) <- adj.toSeq if nbrs.size <= cap
        a <- nbrs; b <- nbrs if a < b
        if !edgeSet.contains((a, b))
      } yield ((a, b), 1000000000L / nbrs.size))
        .groupBy(_._1).toSeq
        .map { case ((a, b), ws) => (a, b, ws.size.toLong, ws.map(_._2).sum) }
        .sortBy { case (a, b, _, ra) => (-ra, a, b) }
      assert(got == want, s"trial $trial (cap=$cap): got $got, want $want")
    }
  }

  test("kTruss: triangles survive, bridges and pendants peel; rounds_stable audits") {
    // two triangles sharing edge (2,3), plus bridge (4,5) and pendant (5,6):
    // k=3 keeps exactly the five triangle edges, one round to stabilize
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("pa", "pb")
    val got = Graph.kTruss(g, "pa", "pb", k = 3, rounds = 4)
      .orderBy("pa", "pb")
      .as[(Long, Long, Boolean, Long)].collect().toSeq
    val in = got.filter(_._3).map(r => (r._1, r._2)).toSet
    assert(in == Set((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(got.size == 7 && got.forall(_._4 == 1L),
      s"peel stabilizes after round 1, got $got")
  }

  test("kTruss: cascading peel — removing weak edges starves the survivors") {
    // fan: center c=9 over path 0-1-2-3-4. Middle spokes start at
    // support 2, but round 1 removes the path edges (support 1), which
    // starves the spokes of ALL their triangles → round 2 empties the
    // graph. A support-once filter would wrongly keep the spokes.
    val fan = Seq((9L, 0L), (9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L),
      (0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("pa", "pb")
    val got = Graph.kTruss(fan, "pa", "pb", k = 4, rounds = 6)
      .as[(Long, Long, Boolean, Long)].collect().toSeq
    assert(got.size == 9 && got.forall(!_._3), s"4-truss of the fan is empty: $got")
    assert(got.forall(_._4 == 2L), s"cascade needs exactly two rounds, got $got")
  }

  test("weightedTriangleCounts: hand fixture — bottleneck weights, uniform reduction") {
    // triangle {1,2,3} with weights 5/2/9 → bottleneck 2 at every
    // corner; the pendant edge (3,4) closes nothing
    val gw = Seq((1L, 2L, 5L), (2L, 3L, 2L), (1L, 3L, 9L), (3L, 4L, 7L))
      .toDF("pa", "pb", "w")
    val r = Graph.weightedTriangleCounts(gw, "pa", "pb", "w")
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(r(1L) == (2L, 1L, 2L) && r(2L) == (2L, 1L, 2L))
    assert(r(3L) == (3L, 1L, 2L) && r(4L) == (1L, 0L, 0L))
    // uniform weight c: n_tri matches the unweighted operator exactly
    // and tri_wmin_sum = c·n_tri — the degree form recovered, pinned
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("pa", "pb")
    val plain = Graph.triangleCounts(g, "pa", "pb")
      .select("id", "degree", "n_tri")
      .as[(Long, Long, Long)].collect().toSet
    val wtd = Graph.weightedTriangleCounts(g.withColumn("w", lit(7L)),
        "pa", "pb", "w")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(wtd.map(t => (t._1, t._2, t._3)) == plain)
    assert(wtd.forall(t => t._4 == 7L * t._3),
      s"uniform weights must give tri_wmin_sum = c·n_tri: $wtd")
  }

  test("weightedKTruss: bottleneck mass peels what the count keeps; uniform reduction to kTruss") {
    // two triangles: {1,2,3} reinforced (min weight 4), {2,3,4} weak
    // (min weight 2). Unweighted 3-truss keeps all six edges; weighted
    // minSupport=4 peels the weak triangle's private edges — and the
    // CASCADE must then re-check (2,3), which retains exactly the
    // reinforced triangle's mass.
    val gw = Seq((1L, 2L, 4L), (1L, 3L, 5L), (2L, 3L, 4L),
      (2L, 4L, 2L), (3L, 4L, 9L)).toDF("pa", "pb", "w")
    val got = Graph.weightedKTruss(gw, "pa", "pb", "w",
        minSupport = 4L, rounds = 4)
      .as[(Long, Long, Boolean, Long)].collect().toSeq
    val in = got.filter(_._3).map(r => (r._1, r._2)).toSet
    assert(in == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got $in")
    val unw = Graph.kTruss(gw.select("pa", "pb"), "pa", "pb",
        k = 3, rounds = 4)
      .as[(Long, Long, Boolean, Long)].collect().toSeq
    assert(unw.filter(_._3).map(r => (r._1, r._2)).toSet == gw.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet,
      "the unweighted 3-truss keeps all five edges — the contrast the weighted peel exists for")
    // uniform weight c with minSupport = c·(k−2) ≡ the unweighted truss
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("pa", "pb")
    val plainT = Graph.kTruss(g, "pa", "pb", k = 3, rounds = 4)
      .as[(Long, Long, Boolean, Long)].collect().toSet
    val wtdT = Graph.weightedKTruss(g.withColumn("w", lit(3L)),
        "pa", "pb", "w", minSupport = 3L, rounds = 4)
      .as[(Long, Long, Boolean, Long)].collect().toSet
    assert(wtdT == plainT,
      s"uniform-weight truss must reduce exactly: $wtdT vs $plainT")
  }

  test("kTruss: randomized model check against driver-side peel-to-fixpoint") {
    val rng = new scala.util.Random(20260815L)
    for (trial <- 1 to 3) {
      val n = 14
      val es = (0 until 40).map(_ => (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      val k = 3 + trial % 2 // k = 3 or 4
      var cur = es.toSet
      var moved = true
      while (moved) {
        // support = common neighbors of the edge's endpoints among survivors
        val supMap = cur.toSeq.map { case e @ (a, b) =>
          val common = (0L until n.toLong).count(w =>
            w != a && w != b &&
              cur.contains((math.min(a, w), math.max(a, w))) &&
              cur.contains((math.min(b, w), math.max(b, w))))
          e -> common
        }.toMap
        val next = cur.filter(e => supMap(e) >= k - 2)
        moved = next.size != cur.size
        cur = next
      }
      val got = Graph.kTruss(es.toDF("pa", "pb"), "pa", "pb", k, rounds = 10)
        .as[(Long, Long, Boolean, Long)].collect().toSeq
      val gotIn = got.filter(_._3).map(r => (r._1, r._2)).toSet
      assert(gotIn == cur, s"trial $trial (k=$k): got $gotIn, want $cur")
      assert(got.map(r => (r._1, r._2)).toSet == es.toSet,
        "every original canonical edge gets a verdict row")
    }
  }

  test("degreeAssortativity: star is exactly −1, regular graph reports 0.0") {
    // K1,3: hub 0 (deg 3) ↔ leaves 1,2,3 (deg 1). Directed edges: 3×(3,1)
    // and 3×(1,3) → M=6, Σx=12, Σxy=18, Σx²=30 → r = (108−144)/(180−144) = −1
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("pa", "pb")
    val s = Graph.degreeAssortativity(star, "pa", "pb")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(s == ((6L, 12L, 18L, 30L, -1.0)))
    // C4 cycle: every degree 2 — correlation undefined (denominator 0),
    // reported as 0.0 by the drift-family convention, never NaN
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("pa", "pb")
    val c = Graph.degreeAssortativity(cycle, "pa", "pb")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(c._1 == 8L && c._5 == 0.0 && !c._5.isNaN)
  }

  test("degreeAssortativity: two disjoint hub stars beat one — sign flips on hub-hub bridge") {
    // two K1,3 stars joined hub-to-hub: the bridge edge is (deg 4, deg 4),
    // pulling r up from the pure-star −1 (still negative: leaves dominate)
    val bridged = Seq((0L, 1L), (0L, 2L), (0L, 3L),
      (10L, 11L), (10L, 12L), (10L, 13L), (0L, 10L)).toDF("pa", "pb")
    val b = Graph.degreeAssortativity(bridged, "pa", "pb")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(b._5 > -1.0 && b._5 < 0.0,
      s"bridged double star should sit in (−1, 0), got ${b._5}")
    // partitioning invariance: exact longs + one division
    val b7 = Graph.degreeAssortativity(bridged.repartition(7), "pa", "pb")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(java.lang.Double.doubleToLongBits(b._5) ==
      java.lang.Double.doubleToLongBits(b7._5))
  }

  private def anfRows(df: org.apache.spark.sql.DataFrame)
      : Seq[(Long, Long, Boolean, Boolean)] =
    df.as[(Long, Long, Boolean, Boolean)].collect().toSeq.sortBy(_._1)

  test("anf: hand path — exact pair curve, all sources, 90% crossing") {
    // P5: 1-2-3-4-5. N(0)=5, N(1)=13, N(2)=19, N(3)=23, N(4)=25.
    // 10·N(h) ≥ 9·25=225 first at h=3 (230).
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("pa", "pb")
    val r = anfRows(Graph.anf(path, "pa", "pb", _ % 1 === 0, maxHops = 4))
    assert(r.map(x => (x._1, x._2)) ==
      Seq((0L, 5L), (1L, 13L), (2L, 19L), (3L, 23L), (4L, 25L)))
    assert(r.forall(_._3), "HLL is exact at these cardinalities — every bound verdict true")
    assert(r.map(x => (x._1, x._4)) ==
      Seq((0L, false), (1L, false), (2L, false), (3L, true), (4L, true)))
  }

  test("anf production (audit = false): full grid, flat after saturation, crossing matches the exact curve") {
    // P5 again: exact curve 5,13,19,23,25 exhausting at hop 4. The
    // production path runs the full requested grid with NO exact BFS
    // anywhere in the plan — saturated rounds go flat — and at these
    // cardinalities the HLL coupon path is exact, so the sketch curve
    // and its 90% crossing coincide with the audit mode's integers.
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("pa", "pb")
    val r = Graph.anf(path, "pa", "pb", _ % 1 === 0, maxHops = 6,
        audit = false)
      .as[(Long, Double, Boolean)].collect().toSeq.sortBy(_._1)
    assert(r.map(x => (x._1, x._2.round)) ==
      Seq((0L, 5L), (1L, 13L), (2L, 19L), (3L, 23L), (4L, 25L),
        (5L, 25L), (6L, 25L)), s"sketch curve off: $r")
    assert(r.map(x => (x._1, x._3)) ==
      Seq((0L, false), (1L, false), (2L, false), (3L, true), (4L, true),
        (5L, true), (6L, true)))
  }

  test("anf: sampled sources — only their balls counted, propagation through unsampled vertices") {
    // sources {2, 4} on P5; balls grow THROUGH odd vertices:
    // h=0: 2; h=1: |{1,2,3}|+|{3,4,5}| = 6; h=2: 4+4 = 8; h=3: 5+5 = 10
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("pa", "pb")
    val r = anfRows(Graph.anf(path, "pa", "pb", _ % 2 === 0, maxHops = 6))
    assert(r.map(x => (x._1, x._2)) ==
      Seq((0L, 2L), (1L, 6L), (2L, 8L), (3L, 10L)),
      "BFS exhausts at hop 4 — no rows past the last reachable hop")
    assert(r.forall(_._3))
  }

  test("anf: randomized model check against driver-side BFS") {
    val rnd = new scala.util.Random(20)
    val es = (1 to 40).map(_ => (rnd.nextInt(14).toLong, rnd.nextInt(14).toLong))
      .filter(e => e._1 != e._2).distinct
    val df = es.toDF("pa", "pb")
    val adj = es.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .map { case (k, v) => (k, v.map(_._2).toSet) }.withDefaultValue(Set.empty[Long])
    val verts = es.flatMap(e => Seq(e._1, e._2)).distinct
    val maxH = 3
    // driver BFS per source, cumulative pair counts per hop
    val counts = (0 to maxH).map { h =>
      verts.filter(_ % 2 == 0).map { s =>
        var ball = Set(s)
        (1 to h).foreach(_ => ball = ball ++ ball.flatMap(adj))
        ball.size.toLong
      }.sum
    }
    // a stalled curve means the frontier emptied: the operator stops
    // emitting rows there (BFS is monotone — a stall never restarts)
    val stall = (1 to maxH).find(h => counts(h) == counts(h - 1))
    val model = (0 to maxH).map(h => (h.toLong, counts(h)))
      .take(stall.getOrElse(maxH + 1))
    val r = anfRows(Graph.anf(df, "pa", "pb", _ % 2 === 0, maxHops = maxH))
    assert(r.map(x => (x._1, x._2)) == model,
      s"exact curve ${r.map(x => (x._1, x._2))} != model $model")
    assert(r.forall(_._3), "bound verdicts all true on a 14-vertex graph")
  }

  test("anf registered-query stability: sf0.01 exact curve clears the 90% boundary beyond the sketch tolerance") {
    // The driver's graph_anf oracle pins at_eff_90 — a function of the
    // HLL estimates — against the exact BFS crossing. That pin is only
    // honest if NO legitimate sketch deviation can flip the decision:
    // here the registered constants (mod 4, cap 2048, maxHops 7) are
    // replayed in audit mode on the driver's own sf0.01 graph and every
    // hop's cumulative ratio is asserted clear of 0.9 even under the
    // worst-case two-sided 4·RSE ratio distortion. If the fixture or
    // constants change and some hop lands inside the tolerance band,
    // this test fails BEFORE the driver's row goes spuriously red.
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val bli = li.select(col("l_orderkey").as("k"), col("l_partkey").as("p"))
      .distinct()
    val prs = bli.alias("a")
      .join(bli.alias("b"), col("a.k") === col("b.k") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
      .agg(count(lit(1)).as("w")).filter(col("w") >= 2).select("pa", "pb")
    val r = Graph.anf(prs, "pa", "pb", id => id % 4 === 0 && id < 2048,
        maxHops = 7, audit = true)
      .select("hops", "exact_pairs", "within_bound")
      .as[(Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(r.map(_._1) == (0L to 7L), s"hop grid incomplete: ${r.map(_._1)}")
    assert(r.forall(_._3), "sketch estimate outside the 4·RSE honesty bound")
    val total = r.map(_._2).max.toDouble
    val tol = 4.0 * 1.04 / math.sqrt((1L << 13).toDouble)
    val blowup = (1.0 + tol) / (1.0 - tol)
    r.dropRight(1).foreach { case (h, c, _) =>
      assert(c / total * blowup < 0.9,
        s"hop $h: ratio ${c / total} inflatable past 0.9 — decision not sketch-stable")
    }
    // the top hop's ratio is structurally 1 (cumulative max IS the
    // total — the same sketch sum on both sides of the comparison)
    assert(r.last._2.toDouble == total)
  }

  test("weightedPageRank: uniform weights reduce bit-exactly to the unweighted walk") {
    // (c·r) div (c·d) = r div d for every integer r, d, c > 0 — so a
    // constant weight column must reproduce pageRank EXACTLY, not
    // approximately; any divergence is an arithmetic-scheme bug
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)).toDF("pa", "pb")
    val gw = g.withColumn("w", lit(7L))
    val plain = Graph.pageRank(g, "pa", "pb", iterations = 5)
      .as[(Long, Long)].collect().toMap
    val weighted = Graph.weightedPageRank(gw, "pa", "pb", "w", iterations = 5)
      .as[(Long, Long)].collect().toMap
    assert(weighted == plain)
  }

  test("weightedPageRank: hand star — mass follows the heavy edge; partitioning-invariant") {
    // star 0–1 (w 3), 0–2 (w 1), one iteration:
    //   r1 = 150000 + 85·((1e6·3) div 4) div 100 = 787500
    //   r2 = 150000 + 85·((1e6·1) div 4) div 100 = 362500
    //   r0 = 150000 + 85·(1e6 + 1e6) div 100   = 1850000 (leaves send all)
    val star = Seq((0L, 1L, 3L), (0L, 2L, 1L)).toDF("pa", "pb", "w")
    val r = Graph.weightedPageRank(star, "pa", "pb", "w", iterations = 1)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(0L -> 1850000L, 1L -> 787500L, 2L -> 362500L), s"got $r")
    val r7 = Graph.weightedPageRank(star.repartition(7), "pa", "pb", "w",
      iterations = 1).as[(Long, Long)].collect().toMap
    assert(r7 == r, "exact longs must be partitioning-invariant")
  }

  test("weightedLabelPropagation: a heavy bridge outvotes two light triangle ties") {
    // two triangles {1,2,3} and {4,5,6} with bridge 3–4. Unweighted,
    // round 1: v3 sees labels {1,2,4} count 1 each → tie to min = 1;
    // v4 sees {3,5,6} → 3. Bridge weight 10 breaks v3's three-way tie
    // toward the bridge label (4, score 10 vs 1) — the one vertex
    // whose verdict the weights flip — while v4's argmax lands on 3
    // either way (its heavy edge agrees with its unweighted min).
    val tri = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 1L),
      (4L, 5L, 1L), (5L, 6L, 1L), (4L, 6L, 1L), (3L, 4L, 10L))
      .toDF("pa", "pb", "w")
    val unw = Graph.labelPropagation(tri, "pa", "pb", rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(unw(3L) == 1L && unw(4L) == 3L, s"unweighted round 1: $unw")
    val w = Graph.weightedLabelPropagation(tri, "pa", "pb", "w", rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(w(3L) == 4L && w(4L) == 3L, s"weighted round 1: $w")
    // uniform weights reduce to the unweighted argmax exactly
    val uni = Graph.weightedLabelPropagation(
      tri.withColumn("w", lit(5L)), "pa", "pb", "w", rounds = 3)
      .as[(Long, Long)].collect().toMap
    val unw3 = Graph.labelPropagation(tri, "pa", "pb", rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(uni == unw3)
  }

  test("weightedPersonalizedPageRank: uniform weights reduce bit-exactly " +
      "to PPR; a heavy edge redirects seed mass") {
    val w1 = Seq((1L, 2L, 7L), (2L, 3L, 7L), (1L, 3L, 7L), (3L, 4L, 7L))
      .toDF("pa", "pb", "w")
    val seeds: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      id => id % 2 === 0
    val uni = Graph.weightedPersonalizedPageRank(w1, "pa", "pb", "w",
      seeds, iterations = 5).as[(Long, Long)].collect().toMap
    val unw = Graph.personalizedPageRank(edges, "pa", "pb",
      seeds, iterations = 5).as[(Long, Long)].collect().toMap
    // (r·c) div (c·Σdeg) = r div Σdeg: same floor of the same rational
    assert(uni == unw)
    // seed {1} with a 9:1 weight split: the heavy neighbor takes 9×
    // the mass the light one gets, where uniform weights tie them
    val star = Seq((1L, 2L, 1L), (1L, 3L, 9L)).toDF("pa", "pb", "w")
    val r = Graph.weightedPersonalizedPageRank(star, "pa", "pb", "w",
      id => id === 1L, iterations = 1).as[(Long, Long)].collect().toMap
    assert(r(3L) == 9L * r(2L), s"heavy neighbor mass: $r")
  }

  test("bipartiteHits: round-1 authority is right-side degree; round-2 " +
      "unrolls exactly; duplicate relation rows collapse") {
    // c1—{p10, p20}, c2—{p20}; the duplicate (2, 20) row must not
    // double-weight the walk
    val rel = Seq((1L, 10L), (1L, 20L), (2L, 20L), (2L, 20L)).toDF("c", "p")
    def scores(rounds: Int): Map[(String, Long), Long] =
      Graph.bipartiteHits(rel, "c", "p", rounds)
        .as[(String, Long, Long)].collect()
        .map { case (s, n, v) => (s, n) -> v }.toMap
    // h0 ≡ 1: a1(p) = deg(p); h1(c) = Σ a1 over c's parts
    val r1 = scores(1)
    assert(r1 == Map(
      ("authority", 10L) -> 1L, ("authority", 20L) -> 2L,
      ("hub", 1L) -> 3L, ("hub", 2L) -> 2L), s"round 1: $r1")
    // a2(10) = h1(c1) = 3; a2(20) = h1(c1) + h1(c2) = 5;
    // h2(c1) = a2(10) + a2(20) = 8; h2(c2) = a2(20) = 5
    val r2 = scores(2)
    assert(r2 == Map(
      ("authority", 10L) -> 3L, ("authority", 20L) -> 5L,
      ("hub", 1L) -> 8L, ("hub", 2L) -> 5L), s"round 2: $r2")
  }

  test("sampledBetweenness: path-graph interior mass by hand; diamond " +
      "counts both shortest paths") {
    // path 1—2—3—4—5, every vertex a seed: pair (s,t) contributes 1
    // to each strict interior vertex → B(2)=3 (pairs 1-3,1-4,1-5),
    // B(3)=4 (1-4,1-5,2-4,2-5), B(4)=3 (1-5,2-5,3-5)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("pa", "pb")
    val gotP = Graph.sampledBetweenness(path, "pa", "pb",
        _ => lit(true), maxHops = 4)
      .as[(Long, Long)].collect().toMap
    assert(gotP == Map(2L -> 3L, 3L -> 4L, 4L -> 3L), s"path: $gotP")
    // diamond 1—2—4, 1—3—4: pair (1,4) has σ = 2 via two interiors
    // (each carries 1·1); pair (2,3) passes through 1 AND 4
    val diamond = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("pa", "pb")
    val gotD = Graph.sampledBetweenness(diamond, "pa", "pb",
        _ => lit(true), maxHops = 4)
      .as[(Long, Long)].collect().toMap
    assert(gotD == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L), s"diamond: $gotD")
  }

  test("bipartiteHits matches a driver-side reference on a randomized relation") {
    val rnd = new scala.util.Random(11)
    val rel = Seq.fill(300)((rnd.nextInt(20).toLong + 1, rnd.nextInt(30).toLong + 100))
    val relDf = rel.toDF("c", "p")
    val got = Graph.bipartiteHits(relDf, "c", "p", rounds = 2)
      .as[(String, Long, Long)].collect()
      .map { case (s, n, v) => (s, n) -> v }.toMap
    // reference: the same four half-steps over a Set-based edge list
    val edges = rel.toSet
    val lefts = edges.map(_._1)
    var h = lefts.map(_ -> BigInt(1)).toMap
    var a = Map.empty[Long, BigInt]
    for (_ <- 1 to 2) {
      a = edges.groupBy(_._2).map { case (p, es) =>
        p -> es.toSeq.map(e => h(e._1)).sum }
      h = edges.groupBy(_._1).map { case (c, es) =>
        c -> es.toSeq.map(e => a(e._2)).sum }
    }
    val want = a.map { case (p, v) => ("authority", p) -> v.toLong } ++
      h.map { case (c, v) => ("hub", c) -> v.toLong }
    assert(got == want, s"got $got\nwant $want")
  }

  test("bipartiteHits is partition-layout invariant (exact integers)") {
    val rel = Seq((1L, 10L), (1L, 20L), (2L, 20L), (3L, 30L), (3L, 20L),
      (2L, 30L)).toDF("c", "p")
    def run(df: org.apache.spark.sql.DataFrame) =
      Graph.bipartiteHits(df, "c", "p", rounds = 2)
        .as[(String, Long, Long)].collect().toSet
    assert(run(rel) == run(rel.repartition(7)))
  }

  test("harmonicCentrality: star-vs-leaf contrast closeness cannot make, " +
      "horizon cut, per-term flooring, isolated seed scores 0") {
    // star 1—{2,3,4,5} plus an isolated pair 10—11
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (10L, 11L))
      .toDF("pa", "pb")
    val got = Graph.harmonicCentrality(star, "pa", "pb",
        _ => lit(true), maxHops = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // center: 4 neighbors at d=1 → 4·10⁶; each leaf: center at 1 +
    // 3 leaves at 2 → 10⁶ + 3·500000; pair members: 10⁶ each. THE
    // CONTRAST: closeness scores center and pair-member identically
    // (n/Σd = 10⁶ both); harmonic separates 4·10⁶ vs 10⁶.
    assert(got == Map(
      1L -> (4L, 4000000L),
      2L -> (4L, 2500000L), 3L -> (4L, 2500000L),
      4L -> (4L, 2500000L), 5L -> (4L, 2500000L),
      10L -> (1L, 1000000L), 11L -> (1L, 1000000L)), s"got: $got")
    val cl = Graph.seedCloseness(star, "pa", "pb", _ => lit(true), 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(cl(1L) == cl(10L), "closeness ties center and pair-member " +
      s"(the blindness harmonic fixes): ${cl(1L)} vs ${cl(10L)}")
    // horizon cut: path 1—2—3—4 at maxHops=2 from seed 1 — d=3 is
    // beyond the horizon and contributes NOTHING (exact, not
    // truncated); per-term flooring: 10⁶ div 3 = 333333 at hops 3
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("pa", "pb")
    val h2 = Graph.harmonicCentrality(path, "pa", "pb",
        id => id === 1L, maxHops = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(h2 == Seq((1L, 2L, 1500000L)), s"horizon: $h2")
    val h3 = Graph.harmonicCentrality(path, "pa", "pb",
        id => id === 1L, maxHops = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(h3 == Seq((1L, 3L, 1833333L)), s"flooring: $h3")
  }

  test("weightedHarmonicCentrality: unit costs reduce to the hop form; " +
      "heavy ties raise the score hops cannot express") {
    val es = Seq((1L, 2L), (2L, 3L), (1L, 4L), (10L, 11L))
    val unit = es.map(e => (e._1, e._2, 1L)).toDF("pa", "pb", "c")
    val w = Graph.weightedHarmonicCentrality(unit, "pa", "pb", "c",
        _ => lit(true), rounds = 8)
      .as[(Long, Long, Long)].collect().map { case (s, n, h) => s -> (n, h) }.toMap
    val hop = Graph.harmonicCentrality(es.toDF("pa", "pb"), "pa", "pb",
        _ => lit(true), maxHops = 8)
      .as[(Long, Long, Long)].collect().map { case (s, n, h) => s -> (n, h) }.toMap
    assert(w == hop, s"unit-cost weighted $w != hop $hop")
    // heavy tie = cheap edge: seed 1 with costs {1-2: 1, 1-4: 5}
    // scores 10^6 + 10^6/5 + 1/(1+... ) — vs uniform cost 5 where
    // every term shrinks; the ordering must reflect tie strength
    val mixed = Seq((1L, 2L, 1L), (1L, 4L, 5L)).toDF("pa", "pb", "c")
    val got = Graph.weightedHarmonicCentrality(mixed, "pa", "pb", "c",
        id => id === 1L, rounds = 8)
      .as[(Long, Long, Long)].collect().toSeq
    // d(1,2)=1, d(1,4)=5 → 10^6 + 200000
    assert(got == Seq((1L, 2L, 1200000L)), s"got: $got")
  }

  test("eigenvectorCentrality: round 1 is the degree, round 2 counts " +
      "length-2 walks; clique member outranks equal-degree star center") {
    // path 1—2—3: degrees 1,2,1; round 2: x(1)=x(2)... walks of
    // length 2 ending at v: x2(v) = Σ_{u~v} deg(u)
    val path = Seq((1L, 2L), (2L, 3L)).toDF("pa", "pb")
    val r1 = Graph.eigenvectorCentrality(path, "pa", "pb", rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 1L, 2L -> 2L, 3L -> 1L), s"round 1: $r1")
    val r2 = Graph.eigenvectorCentrality(path, "pa", "pb", rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(r2 == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"round 2: $r2")
    // triangle 1-2-3 (clique, deg 2 each) vs star 10—{11,12} center
    // (deg 2): equal degree, but the clique member's neighbors are
    // better-connected — round 2 separates 4 vs 2
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (10L, 12L)).toDF("pa", "pb")
    val r = Graph.eigenvectorCentrality(g, "pa", "pb", rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(r(1L) == 4L && r(10L) == 2L,
      s"clique 4 vs star-center 2 expected: $r")
    // randomized model check vs a driver-side adjacency walk count
    val rnd = new scala.util.Random(23)
    val es = (0 until 60).map(_ => (rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
      .filter(e => e._1 != e._2).distinct
    val sym = (es ++ es.map(e => (e._2, e._1))).distinct
    var x = sym.map(_._1).distinct.map(_ -> BigInt(1)).toMap
    for (_ <- 1 to 3)
      x = sym.groupBy(_._1).map { case (v, nbrs) =>
        v -> nbrs.map(e => x(e._2)).sum }
    val gotR = Graph.eigenvectorCentrality(es.toDF("pa", "pb"), "pa", "pb",
        rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(gotR == x.map { case (k, v) => k -> v.toLong },
      s"model check: $gotR vs $x")
  }

  test("sampledBetweenness honesty eval: the seed panel's top-k fidelity " +
      "against denser panels is MEASURED, not assumed (sf0.01)") {
    // The ann_recall_eval / graph_anf discipline applied to the
    // newest approximation: graph_betweenness registers the mod-50
    // (∧ id < 2048) seed panel as its cost knob, and this pin
    // quantifies what that panel buys on the live sf0.01 co-purchase
    // graph by ranking the SAME exact-integer pair-path mass under
    // 5×- and 10×-denser panels (mod-10: 188 seed ids; mod-5: 376).
    // MEASURED (2026-08-16 testdata; exact integers, deterministic
    // (mass DESC, id ASC) tie-break — re-pin on regeneration):
    //   nonzero-mass support: mod-50 → 23 vertices, mod-10 → 396,
    //     mod-5 → 823 (of 1880) — the unnormalized mass only exists
    //     over panel pairs, so the SUPPORT ITSELF is panel-relative;
    //   top-20 overlap: mod-50 vs mod-10 = 6/20, mod-50 vs mod-5 =
    //     2/20, mod-10 vs mod-5 = 7/20;
    //   top-50 overlap: 10/50, 6/50, and 19/50 respectively.
    // The honest conclusion, stated rather than hidden: at this
    // graph's sparsity a 39-seed panel ranks hub mass RELATIVE TO
    // ITS OWN PANEL only — denser panels agree with each other
    // (19/50) about 3× more than the sparse panel agrees with either
    // (6/50), so a caller comparing betweenness ACROSS corpora must
    // fix the panel, and a caller needing absolute hub identity
    // should budget a denser panel (the 2048 cap, not the mod, is
    // the 100 TB guard — mod-5 at sf0.01 is 1.7 s).
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
    val edges = li.toDF("k", "pa").join(li.toDF("k", "pb"), Seq("k"))
      .filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 2).select("pa", "pb").cache()
    def mass(mod: Int) = Graph.sampledBetweenness(edges, "pa", "pb",
      id => id % mod === 0 && id < 2048, maxHops = 3).cache()
    def topIds(df: org.apache.spark.sql.DataFrame, k: Int): Set[Long] =
      df.orderBy(col("pair_paths").desc, col("id").asc).limit(k)
        .select("id").as[Long].collect().toSet
    val (m50, m10, m5) = (mass(50), mass(10), mass(5))
    val support = Seq(m50.count(), m10.count(), m5.count())
    assert(support == Seq(23L, 396L, 823L),
      s"nonzero-mass support moved (re-pin the measured block): $support")
    val overlaps = for {
      k <- Seq(20, 50)
      (a, b) <- Seq((m50, m10), (m50, m5), (m10, m5))
    } yield (topIds(a, k) & topIds(b, k)).size
    assert(overlaps == Seq(6, 2, 7, 10, 6, 19),
      s"panel-fidelity overlaps moved (re-pin the measured block): $overlaps")
    // the convergence direction itself, robust to regeneration: the
    // two denser panels must agree with each other at least as well
    // as the sparse panel agrees with the densest
    assert(overlaps(5) >= overlaps(3),
      s"denser panels diverged more than the sparse one: $overlaps")
    Seq(m50, m10, m5, edges).foreach(_.unpersist())
  }

  test("eigenvectorCentrality honesty eval: the rounds knob's top-k " +
      "stability is MEASURED on the sf0.01 co-purchase graph, and the " +
      "walk-count growth vs the BIGINT guard headroom is stated") {
    // the betweenness-panel discipline applied to the registry's
    // newest approximation-shaped choice (r18 verdict #5): the
    // registered default is rounds = 2, justified until now by
    // narrative ("already separates neighborhoods"). Measure it.
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
    val edges = li.toDF("k", "pa").join(li.toDF("k", "pb"), Seq("k"))
      .filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 2).select("pa", "pb").cache()
    def ev(r: Int) = Graph.eigenvectorCentrality(edges, "pa", "pb",
      rounds = r).cache()
    def topIds(df: org.apache.spark.sql.DataFrame, k: Int): Set[Long] =
      df.orderBy(col("score").desc, col("id").asc).limit(k)
        .select("id").as[Long].collect().toSet
    val (e2, e3, e4) = (ev(2), ev(3), ev(4))
    val overlaps = for {
      k <- Seq(20, 50)
      (a, b) <- Seq((e2, e3), (e2, e4), (e3, e4))
    } yield (topIds(a, k) & topIds(b, k)).size
    // MEASURED (this box, sf0.01): top-20 — 2v3 = 18/20, 2v4 = 19/20,
    // 3v4 = 18/20; top-50 — 42/50, 45/50, 44/50. The default-2
    // ranking agrees with deeper iterations (~90% at top-20) about as
    // well as they agree with EACH OTHER — iteration depth past 2 is
    // reshuffling the same hub set's tail, not finding new hubs. That
    // is the measured license for the cheap default, and the contrast
    // with betweenness (whose sparse panel agreed 6/50 with denser
    // ones) is the point of running the same discipline here.
    // The assertion is a directional FLOOR (≥75% overlap at both
    // depths), not the exact vector (VERDICT r19 #6): the measurement
    // above is deterministic on the committed testdata, but a testdata
    // regeneration should not red the suite on a cosmetic re-pin —
    // what the pin protects is "rounds=2 stays in strong agreement
    // with deeper iterations", and a drop below 75% would be a real
    // stability break worth investigating, not noise.
    val floors = Seq(15, 15, 15, 38, 38, 38)
    assert(overlaps.lazyZip(floors).forall(_ >= _),
      s"rounds-stability overlap fell below the 75% floor " +
        s"(measured r19: 18,19,18,42,45,44): $overlaps vs floors $floors")
    // the direction, robust to regeneration: rounds=2 must agree with
    // deeper iterations at top-20 roughly as well as 3 agrees with 4
    assert(overlaps.take(2).min >= overlaps(2) - 2,
      s"rounds=2 no longer matches deeper iterations at top-20: $overlaps")
    // walk-count growth vs the BIGINT emit guard: score mass
    // multiplies by ~spectral-radius per round — measure the factor
    // and state the headroom before the assert_true boundary fires
    val maxes = Seq(e2, e3, e4).map(
      _.agg(max(col("score"))).as[Long].collect().head)
    val growth = maxes(2).toDouble / maxes(1)
    val headroomRounds =
      math.log(Long.MaxValue.toDouble / maxes(2)) / math.log(growth)
    // MEASURED: max walk counts 74 / 446 / 2376 at rounds 2/3/4 —
    // growth ≈ ×5.3 per round (the graph's spectral radius), leaving
    // ~21 more rounds before the DECIMAL→BIGINT emit guard fires.
    // The guard is a distant backstop at THIS density, not a
    // constraint the default ever brushes; a far denser graph (or a
    // caller pushing rounds ≫ 4) hits the loud assert_true, never a
    // silent wrap.
    // directional, regeneration-tolerant form of the old exact pin
    // (measured r19: 74 / 446 / 2376): the walk counts must grow
    // strictly per round — the spectral-radius multiplication the
    // headroom formula below rests on — without the exact values
    assert(maxes(0) > 0L && maxes(1) > maxes(0) && maxes(2) > maxes(1),
      s"walk-count maxima no longer grow per round " +
        s"(measured r19: 74, 446, 2376): $maxes")
    assert(headroomRounds > 5.0,
      f"BIGINT guard headroom collapsed: growth ×$growth%.1f/round, " +
        f"$headroomRounds%.1f rounds left after rounds=4")
    Seq(e2, e3, e4, edges).foreach(_.unpersist())
  }
}
