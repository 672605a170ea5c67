package graft

import org.apache.spark.sql.functions._
import graft.functions.MisraGriesAggregate

/** Misra–Gries heavy-hitters aggregate: the mergeable-summaries
  * contract (no overcount, bounded undercount, every true-heavy key
  * tracked) must hold under forced multi-partition merges, and the
  * whole summary must stay within k entries. */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  // skewed stream: key i appears count(i) times
  private def skewed(counts: Map[String, Int], partitions: Int) = {
    val rows = counts.toSeq.flatMap { case (k, n) => Seq.fill(n)(k) }
    // deterministic shuffle so heavy keys interleave across partitions
    val mixed = rows.zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 1000003 }
      .map(_._1)
    mixed.toDF("k").repartition(partitions)
  }

  private def summary(counts: Map[String, Int], k: Int, partitions: Int) =
    skewed(counts, partitions)
      .agg(MisraGriesAggregate.heavyHitters($"k", k).as("hh"))
      .select(explode($"hh").as("c"))
      .select($"c.key", $"c.est").as[(String, Long)].collect().toMap

  test("contract: heavy keys present, no overcount, undercount <= N/(k+1)") {
    val counts = Map("a" -> 5000, "b" -> 3000, "c" -> 900, "d" -> 60,
      "e" -> 25, "f" -> 10, "g" -> 5)
    val n = counts.values.sum
    val k = 4
    for (parts <- Seq(1, 7, 32)) {
      val got = summary(counts, k, parts)
      assert(got.size <= k, s"summary exceeded k entries: $got")
      // every key with true > N/(k+1) must be tracked, within bounds
      counts.filter { case (_, c) => c.toLong * (k + 1) > n }.foreach {
        case (key, c) =>
          val est = got.getOrElse(key,
            fail(s"heavy key $key missing at $parts partitions: $got"))
          assert(est <= c, s"overcount for $key: est $est > true $c")
          assert((c - est) * (k + 1) <= n,
            s"undercount beyond N/(k+1) for $key: est $est, true $c")
      }
      // no overcount for ANY tracked key, heavy or not
      got.foreach { case (key, est) =>
        assert(est <= counts(key), s"overcount for $key: $est > ${counts(key)}")
      }
    }
  }

  test("fewer distinct keys than k degenerates to exact counts") {
    val counts = Map("x" -> 123, "y" -> 45, "z" -> 6)
    val got = summary(counts, k = 8, partitions = 5)
    assert(got == counts.map { case (kk, v) => kk -> v.toLong })
  }

  test("non-string key child fails at analysis, not with a runtime CCE") {
    // the heavyHitters builder casts to string; constructing the
    // aggregate directly with a LongType child must be an ANALYSIS
    // error (ExpectsInputTypes), not an executor-side ClassCastException
    import org.apache.spark.sql.GraftBridge
    val df = Seq(1L, 2L, 2L).toDF("v")
    val rawAgg = GraftBridge.column(
      MisraGriesAggregate(GraftBridge.expression($"v"), 2)
        .toAggregateExpression())
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(rawAgg.as("hh")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"),
      s"expected a data-type analysis error, got: ${e.getMessage}")
  }

  test("graft_heavy_hitters is SQL-callable after registration, same summary") {
    GraftExtensions.register(spark)
    val counts = Map("a" -> 50, "b" -> 30, "c" -> 3)
    skewed(counts, 3).createOrReplaceTempView("__mg")
    val viaSql = spark.sql(
      "SELECT explode(graft_heavy_hitters(k, 2)) AS c FROM __mg")
      .select($"c.key", $"c.est").as[(String, Long)].collect().toMap
    // exact fixture: 3 keys, k=2 — both true-heavy keys tracked
    assert(viaSql.keySet == Set("a", "b"))
  }
}
