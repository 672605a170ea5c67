package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality for corpus quality weighting.
  *
  * Web-scale training corpora weight documents by the centrality of
  * their source in a link/co-occurrence graph (the CommonCrawl
  * harvest ranks hosts this way before a page of text is ever read).
  * The operator here is fixed-iteration PageRank over an undirected
  * edge list, in EXACT integer arithmetic so that any partitioning —
  * local[32] today, a 1000-executor shuffle tomorrow — produces
  * bit-identical ranks, and so a single-threaded SQL engine can
  * re-derive them for the correctness gate.
  *
  * Integer scheme (all BIGINT, no doubles anywhere):
  *  - ranks carry six decimal places as micro-units: r₀ = 1,000,000;
  *  - a node's contribution is `r div deg` (truncating division —
  *    both engines truncate non-negative integer division);
  *  - damping 0.85 as `150000 + (85 * Σ contribs) div 100`.
  * Truncation loses < 1 micro-unit per term, identically in both
  * engines; sums of longs are order-independent, so the result is
  * partitioning-invariant — the property the DECIMAL(18,2) policy
  * (Queries.scala scaladoc) guarantees for the relational aggregates.
  *
  * Scale shape: each iteration is one equi-join of the edge list with
  * the current rank frame plus one map-side-partial sum — O(E) per
  * iteration, k iterations, zero driver-side state. The edge list
  * (with source degrees pre-attached) is the one multi-consumer frame
  * and is persisted for the loop's lifetime; per-round results are
  * localCheckpoint'ed, because ten self-referential joins otherwise
  * double the lineage each round (the [[Dedup.connectedComponents]]
  * lesson). Undirected edges mean every vertex has outdegree ≥ 1 —
  * no dangling-mass correction term is needed.
  *
  * Reference: the engine at /root/reference/sqlengine.py has no graph
  * surface (extension per the brief's quality-weighting family).
  */
object Graph {

  /** Fixed-`iterations` integer PageRank over the undirected graph
    * `pairs(aCol, bCol)`. Returns one row per vertex:
    * `(id, rank_micro)` with ranks in micro-units (1e6 = 1.0). */
  def pageRank(pairs: DataFrame, aCol: String, bCol: String,
      iterations: Int = 10): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    // both directions in one pass over `pairs` (one execution of the
    // upstream pair pipeline), then attach each source's outdegree so
    // the loop below joins ONE standing frame per round
    val edges = pairs
      .select(explode(array(
        struct(col(aCol).as("__u"), col(bCol).as("__v")),
        struct(col(bCol).as("__u"), col(aCol).as("__v")))).as("__e"))
      .select(col("__e.__u").as("__u"), col("__e.__v").as("__v"))
      .distinct()
    val deg = edges.groupBy("__u").agg(count(lit(1)).as("__deg"))
    val edgesDeg = edges.join(deg, "__u")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var ranks = deg.select(col("__u").as("id"),
        lit(1000000L).as("rank_micro"))
      for (_ <- 1 to iterations) {
        ranks = edgesDeg
          .join(ranks, edgesDeg("__u") === ranks("id"))
          .select(col("__v"),
            expr("rank_micro div __deg").as("__contrib"))
          .groupBy(col("__v"))
          .agg(sum(col("__contrib")).as("__s"))
          .select(col("__v").as("id"),
            (lit(150000L) + expr("(85 * __s) div 100")).as("rank_micro"))
          .localCheckpoint(true)
      }
      ranks
    } finally edgesDeg.unpersist()
  }
}
