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
}
