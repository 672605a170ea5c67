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
