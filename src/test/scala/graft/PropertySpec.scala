package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.TemporalJoins

/** ScalaCheck properties (SURVEY.md §5.3): random integer tables →
  * Spark results must equal a naive in-memory model. Uses scalacheck's
  * own runner (the scalatest adapter isn't available offline).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, p: Prop, cases: Int = 12): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(cases)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)),
      p)
    assert(res.passed, s"$name: $res")
  }

  private val rowsGen: Gen[List[(Long, Long)]] =
    Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(-5L, 5L), Gen.chooseNum(-100L, 100L))))

  test("filter with every comparison operator matches the model") {
    check("filter", Prop.forAll(rowsGen, Gen.chooseNum(-5L, 5L),
      Gen.oneOf("=", "!=", "<", ">", "<=", ">=")) { (rows, v, op) =>
      val df = rows.toDF("k", "x")
      val (cond, f): (org.apache.spark.sql.Column, Long => Boolean) = op match {
        case "="  => (col("k") === v, _ == v)
        case "!=" => (col("k") =!= v, _ != v)
        case "<"  => (col("k") < v,   _ < v)
        case ">"  => (col("k") > v,   _ > v)
        case "<=" => (col("k") <= v,  _ <= v)
        case ">=" => (col("k") >= v,  _ >= v)
      }
      val got = df.filter(cond).as[(Long, Long)].collect().sorted.toList
      got == rows.filter(r => f(r._1)).sorted
    })
  }

  test("inner equi-join multiset matches the nested-loop model") {
    check("join", Prop.forAll(rowsGen, rowsGen) { (l, r) =>
      val got = l.toDF("k", "x").join(r.toDF("k", "y"), "k")
        .as[(Long, Long, Long)].collect().sorted.toList
      val want = (for ((k1, x) <- l; (k2, y) <- r if k1 == k2)
        yield (k1, x, y)).sorted
      got == want
    })
  }

  test("groupBy sum/count/min/max matches the model") {
    check("agg", Prop.forAll(rowsGen) { rows =>
      val got = rows.toDF("k", "x").groupBy("k")
        .agg(sum("x").as("s"), count(lit(1)).as("n"), min("x").as("mn"), max("x").as("mx"))
        .as[(Long, Long, Long, Long, Long)].collect().sorted.toList
      val want = rows.groupBy(_._1).map { case (k, g) =>
        val xs = g.map(_._2)
        (k, xs.sum, xs.size.toLong, xs.min, xs.max)
      }.toList.sorted
      got == want
    })
  }

  test("boundedRangeJoin equals the quadratic model") {
    check("rangeJoin", Prop.forAll(rowsGen, rowsGen,
      Gen.chooseNum(-50L, 0L), Gen.chooseNum(1L, 60L)) { (l, r, lo, span) =>
      val hi = lo + span
      val pairs = TemporalJoins.boundedRangeJoin(
        l.toDF("k", "ts"), r.toDF("k", "rts"), Seq("k"), "ts", "rts", lo, hi)
        .select("k", "ts", "__rts").as[(Long, Long, Long)].collect().sorted.toList
      val want = (for ((k1, ts) <- l; (k2, rts) <- r
        if k1 == k2 && rts >= ts + lo && rts < ts + hi)
        yield (k1, ts, rts)).sorted
      pairs == want
    }, cases = 8)
  }

  test("packSequences invariants: offsets in range, packs dense, cum-consistent") {
    import graft.operators.Mixing
    val docsGen = Gen.chooseNum(1, 30).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1L, 600L)))
    check("pack", Prop.forAll(docsGen, Gen.chooseNum(64L, 512L)) { (toks, seqLen) =>
      val rows = toks.zipWithIndex.map { case (t, i) => (i.toLong, "g", t) }
      val got = Mixing.packSequences(rows.toDF("doc_id", "grp", "n_tokens"),
        Seq("grp"), "n_tokens", "doc_id", seqLen)
        .select("doc_id", "pack_id", "pack_offset")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toList
      // model: running token offset in doc order
      val cums = rows.map(_._3).scanLeft(0L)(_ + _)
      got.zip(cums).forall { case ((_, pid, off), cum) =>
        pid == cum / seqLen && off == cum % seqLen && off >= 0 && off < seqLen
      }
    }, cases = 10)
  }

  test("tokenBudgetPerGroup: monotone in budget, always ⊆ input, per-group prefix") {
    import graft.operators.Mixing
    val docsGen = Gen.chooseNum(1, 25).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(1L, 300L), Gen.chooseNum(0, 3))))
    check("budget", Prop.forAll(docsGen, Gen.chooseNum(50L, 500L)) { (docs, b) =>
      val rows = docs.zipWithIndex.map { case ((t, g), i) =>
        (i.toLong, s"g$g", t, (i % 7).toDouble) }
      val df = rows.toDF("doc_id", "grp", "n_tokens", "score")
      def ids(budget: Long): Set[Long] =
        Mixing.tokenBudgetPerGroup(df, Seq("grp"), "n_tokens", "score",
          "doc_id", budget).select("doc_id").as[Long].collect().toSet
      val small = ids(b); val big = ids(b * 2)
      // model: per group, walk score DESC / id ASC, keep while taken < b
      val want = rows.groupBy(_._2).flatMap { case (_, rs) =>
        val ordered = rs.sortBy(r => (-r._4, r._1))
        val cums = ordered.map(_._3).scanLeft(0L)(_ + _)
        ordered.zip(cums).collect { case (r, taken) if taken < b => r._1 }
      }.toSet
      small == want && small.subsetOf(big)
    }, cases = 10)
  }

  test("scrubPii is idempotent (replacement tokens never re-match)") {
    import graft.operators.TextAnalysis
    val textGen = Gen.listOf(Gen.oneOf(
      "hello", "a@b.co", "12345", "https://x.io/p", "x", "9@9.9x", "...",
      "bob@site.example.net", "123", "+1-202-555-0144")).map(_.mkString(" "))
    check("scrub", Prop.forAll(textGen) { t =>
      val df = Seq(Tuple1(t)).toDF("text")
      val once = df.select(TextAnalysis.scrubPii(col("text"))).as[String].head()
      val twice = Seq(Tuple1(once)).toDF("text")
        .select(TextAnalysis.scrubPii(col("text"))).as[String].head()
      once == twice
    }, cases = 15)
  }

  test("connectedComponents equals the union-find model on random graphs") {
    val graphGen = for {
      n <- Gen.chooseNum(1, 30)
      m <- Gen.chooseNum(0, 40)
      edges <- Gen.listOfN(m,
        Gen.zip(Gen.chooseNum(0L, n - 1L), Gen.chooseNum(0L, n - 1L)))
    } yield (n.toLong, edges.filter(e => e._1 != e._2))
    check("cc", Prop.forAll(graphGen) { case (n, edges) =>
      // model: plain union-find with min-id representatives
      val parent = scala.collection.mutable.Map((0L until n).map(v => v -> v): _*)
      def find(v: Long): Long = {
        var r = v; while (parent(r) != r) r = parent(r); r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val want = (0L until n).map(v => v -> find(v)).toMap
      val vertices = (0L until n).toDF("id")
      val pairs =
        if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("a", "b")
        else edges.toDF("a", "b")
      val got = graft.operators.Dedup.connectedComponents(vertices, "id", pairs)
        .as[(Long, Long, Boolean)].collect()
      got.forall { case (v, c, keep) => want(v) == c && keep == (v == c) } &&
        got.length == n
    }, cases = 10)
  }

  test("triangleCounts equals the brute-force triple model on random graphs") {
    val graphGen = for {
      n <- Gen.chooseNum(2, 20)
      m <- Gen.chooseNum(0, 35)
      edges <- Gen.listOfN(m,
        Gen.zip(Gen.chooseNum(0L, n - 1L), Gen.chooseNum(0L, n - 1L)))
    } yield edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    check("triangles", Prop.forAll(graphGen) { edges =>
      edges.isEmpty || {
        // model: brute-force — every vertex triple with all three edges
        val es = edges.toSet
        val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        def has(a: Long, b: Long) = es((math.min(a, b), math.max(a, b)))
        val triples = for {
          i <- vs.indices; j <- (i + 1) until vs.length
          k <- (j + 1) until vs.length
          if has(vs(i), vs(j)) && has(vs(i), vs(k)) && has(vs(j), vs(k))
        } yield (vs(i), vs(j), vs(k))
        val wantTri = vs.map(v =>
          v -> triples.count(t => t._1 == v || t._2 == v || t._3 == v).toLong).toMap
        val deg = vs.map(v =>
          v -> edges.count(e => e._1 == v || e._2 == v).toLong).toMap
        val got = graft.operators.Graph
          .triangleCounts(edges.toDF("pa", "pb"), "pa", "pb")
          .as[(Long, Long, Long, Long)].collect()
        got.length == vs.length && got.forall { case (id, d, t, cc) =>
          d == deg(id) && t == wantTri(id) &&
            cc == (if (d >= 2) 2000L * t / (d * (d - 1)) else 0L)
        }
      }
    }, cases = 10)
  }

  test("densityPrune equals the brute-force degree model (uncapped buckets)") {
    // deterministic fake embeddings: angle clusters on the unit circle
    // padded to 4 dims — vectors in the same cluster have cosine 1
    val clusterGen = Gen.chooseNum(3, 12).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 2)))
    check("density", Prop.forAll(clusterGen, Gen.chooseNum(0L, 3L)) { (cls, cap) =>
      val vecs = cls.zipWithIndex.map { case (c, i) =>
        val ang = c * (math.Pi / 2) // orthogonal clusters: cos 1 in, 0 across
        (i.toLong, Seq(math.cos(ang).toFloat, math.sin(ang).toFloat, 0f, 0f))
      }
      // model: degree = same-cluster size − 1 (cosine 1 within, 0 across)
      val sizes = cls.groupBy(identity).view.mapValues(_.size).toMap
      val got = graft.operators.Similarity
        .densityPrune(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
          threshold = 0.9, maxDegree = cap, bands = 2, planesPerBand = 2, dim = 4)
        .as[(Long, Long, Boolean)].collect()
      got.length == vecs.length && got.forall { case (id, deg, keep) =>
        val want = sizes(cls(id.toInt)) - 1L
        deg == want && keep == (deg <= cap)
      }
    }, cases = 10)
  }

  test("hash samples nest and are stratum-consistent for random rates") {
    val rateGen = Gen.chooseNum(0, 1000000).map(_ / 1000000.0)
    check("sampling", Prop.forAll(rateGen, rateGen) { (r1, r2) =>
      val (lo, hi) = (math.min(r1, r2), math.max(r1, r2))
      val ids = (0L until 300L).toDF("id")
      val small = graft.operators.Sampling.hashSample(ids, "id", lo)
        .as[Long].collect().toSet
      val big = graft.operators.Sampling.hashSample(ids, "id", hi)
        .as[Long].collect().toSet
      small.subsetOf(big)
    }, cases = 8)
  }

  test("growthAccounting equals the per-day set model on random activity") {
    val actGen: Gen[List[(Long, Long)]] =
      Gen.chooseNum(0, 60).flatMap(n =>
        Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 7L), Gen.chooseNum(0L, 14L))))
    check("growth", Prop.forAll(actGen) { act =>
      val dist = act.distinct
      if (dist.isEmpty) true
      else {
        val got = graft.operators.Analytics.growthAccounting(
            act.toDF("user_id", "day"))
          .select("day", "n_new", "n_retained", "n_resurrected", "n_active", "cume_users")
          .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toList
        val byUser = dist.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
        val days = dist.map(_._2).distinct.sorted
        var cume = 0L
        val want = days.map { d =>
          val active = dist.filter(_._2 == d).map(_._1)
          val nNew = active.count(u => byUser(u).head == d)
          val nRet = active.count(u => byUser(u).contains(d - 1) && byUser(u).head != d)
          val nRes = active.size - nNew - nRet
          cume += nNew
          (d, nNew.toLong, nRet.toLong, nRes.toLong, active.size.toLong, cume)
        }
        got == want
      }
    }, cases = 10)
  }

  test("uniqueOverlapDays equals the per-day set model; tiny-set sketches stay in bound") {
    val actGen: Gen[List[(Long, Long)]] =
      Gen.chooseNum(0, 60).flatMap(n =>
        Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(0L, 40L))))
    check("overlap", Prop.forAll(actGen) { act =>
      val dist = act.distinct
      val days = dist.map(_._1).distinct.sorted
      val pairs = days.filter(d => days.contains(d + 1))
      if (pairs.isEmpty) true
      else {
        val got = graft.operators.Analytics.uniqueOverlapDays(
            act.map { case (d, u) => (d * 86400L, u) }.toDF("ts_s", "uid"),
            col("ts_s"), col("uid"))
          .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toList
        val byDay = dist.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val want = pairs.map { d =>
          val a = byDay(d); val b = byDay(d + 1)
          (d, (a & b).size.toLong, (a | b).size.toLong, true)
        }
        // within_bound must hold too: DataSketches HLL is exact at
        // these cardinalities (coupon-list mode), and absTol = 10
        // dominates regardless
        got == want
      }
    }, cases = 10)
  }

  test("asofJoin equals the scan model (unique right timestamps)") {
    val rightGen = Gen.chooseNum(0, 30).flatMap(n =>
      Gen.pick(n, 0 until 200).map(_.toList))
    check("asof", Prop.forAll(rowsGen, rightGen, Gen.chooseNum(-3L, 3L)) {
      (l, rts, rk) =>
      val left = l.zipWithIndex.map { case ((k, ts), i) => (k, ts, i.toLong) }
      val right = rts.zipWithIndex.map { case (t, i) => (rk, t.toLong, 1000L + i) }
      val got = TemporalJoins.asofJoin(
        left.toDF("k", "ts", "lid"), right.toDF("k", "rts", "rid"),
        Seq("k"), "ts", "rts", Seq("rid"))
        .select("lid", "asof_rid").as[(Long, Option[Long])].collect().toMap
      left.forall { case (k, ts, lid) =>
        val want = right.filter(r => r._1 == k && r._2 <= ts)
          .sortBy(_._2).lastOption.map(_._3)
        got(lid) == want
      }
    }, cases = 8)
  }
}
