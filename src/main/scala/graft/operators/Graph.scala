package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** The symmetric (both-directions, deduped) edge list of an
    * undirected pair frame — both directions generated in ONE pass
    * over `pairs` (a union of two selects would execute the possibly
    * expensive upstream pair pipeline twice when the frame first
    * materializes). Shared by every graph operator here and by
    * [[Dedup.connectedComponents]]'s edge step; any future edge-level
    * policy (null ids, self-loops) lives in exactly one place. */
  private[graft] def symmetricEdges(pairs: DataFrame, aCol: String,
      bCol: String): DataFrame =
    pairs
      .select(explode(array(
        struct(col(aCol).as("__u"), col(bCol).as("__v")),
        struct(col(bCol).as("__u"), col(aCol).as("__v")))).as("__e"))
      .select(col("__e.__u").as("__u"), col("__e.__v").as("__v"))
      .distinct()

  /** Fixed-`iterations` integer PageRank over the undirected graph
    * `pairs(aCol, bCol)`. Returns one row per vertex:
    * `(id, rank_micro)` with ranks in micro-units (1e6 = 1.0).
    * Exactly [[personalizedPageRank]] with every vertex in the seed
    * set (the teleport term degenerates to the global constant), so
    * the iteration loop lives there once. */
  def pageRank(pairs: DataFrame, aCol: String, bCol: String,
      iterations: Int = 10): DataFrame =
    personalizedPageRank(pairs, aCol, bCol, _ => lit(true), iterations)

  /** Exact per-vertex triangle counts and local clustering coefficient
    * over the undirected graph `pairs(aCol, bCol)`. Returns one row per
    * vertex: `(id, degree, n_tri, cc_permille)` with the coefficient in
    * exact per-mille integers — `(2000·t) div (d·(d−1))`, 0 when
    * degree < 2 — so any engine re-derives the same longs.
    *
    * Scale shape (node-iterator with degree orientation, the standard
    * distributed-triangle trick — Suri & Vassilvitskii, WWW'11): each
    * undirected edge is oriented from its lower-(degree, id) endpoint
    * to the higher, so every vertex's oriented out-degree is O(√E)
    * regardless of raw degree. Wedges are generated only between
    * out-neighbors (join on the shared source), giving Σ outdeg² ≤
    * O(E^{3/2}) candidate wedges instead of Σ deg² — the difference
    * between a bounded shuffle and a quadratic blow-up on a power-law
    * co-purchase graph. The closing-edge check is a join back on
    * the oriented edge list; each triangle is produced exactly once
    * (its vertices appear in orientation-rank order). Everything is
    * joins + one explode — no driver state, no iteration. Self-loops
    * are excluded (they close no triangle and do not count into
    * degree — uniform across the whole cohesion family via
    * [[canonicalWeighted]], whose unit-weight mode makes this
    * operator, [[weightedTriangleCounts]], [[kTruss]] and
    * [[weightedKTruss]] four views over ONE enumerator + ONE peel).
    *
    * Reference: /root/reference/sqlengine.py has no graph surface
    * (extension per the brief's quality-weighting family). */
  def triangleCounts(pairs: DataFrame, aCol: String, bCol: String,
      persist: Boolean = true): DataFrame = {
    val p = (df: DataFrame) => Caching.maybePersist(df, persist)
    val (deg, oriented) =
      orientEdges(canonicalWeighted(pairs, aCol, bCol, None), p, p)
    val perVertex = enumTriangles(oriented)
      .select(explode(array(col("s"), col("x"), col("y"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
    deg.select(col("__u").as("id"), col("__d").as("degree"))
      .join(perVertex, Seq("id"), "left")
      .na.fill(0L, Seq("n_tri"))
      .select(col("id"), col("degree"), col("n_tri"),
        when(col("degree") >= 2,
          expr("(2000 * n_tri) div (degree * (degree - 1))"))
          .otherwise(lit(0L)).as("cc_permille"))
  }

  /** Canonical weighted edge frame shared by the cohesion (triangle)
    * family: self-loops dropped (a loop closes no triangle; counting
    * it into degree made the weighted/unweighted operators disagree
    * by 1 on loop graphs), endpoints ordered a < b, parallel rows
    * collapsed keeping MAX weight. `wCol = None` assigns unit
    * weights, under which every weighted statistic below reduces
    * exactly to its count form — the reduction the uniform-weight
    * GraphSpec pins verify. */
  private def canonicalWeighted(pairs: DataFrame, aCol: String,
      bCol: String, wCol: Option[String]): DataFrame =
    pairs.filter(col(aCol) =!= col(bCol))
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"),
        wCol.map(c => col(c).cast("long")).getOrElse(lit(1L)).as("w"))
      .groupBy("a", "b").agg(max(col("w")).as("w"))

  /** Degree orientation of a canonical edge frame: every undirected
    * edge directed from its lower-(degree, id) endpoint to the
    * higher, so oriented out-degree is O(√E) regardless of raw degree
    * (Suri & Vassilvitskii, WWW'11) — the bound that keeps wedge
    * candidates at O(E^{3/2}) on power-law graphs. Persistence is
    * caller-owned via the two hooks (the eager loops persist per
    * round and free; the one-shot counts persist under the Caching
    * contract). Returns (deg(__u, __d), oriented(s, t, dt, wt)). */
  private def orientEdges(canon: DataFrame,
      persistDeg: DataFrame => DataFrame,
      persistOriented: DataFrame => DataFrame): (DataFrame, DataFrame) = {
    val ed = canon.select(explode(array(
        struct(col("a").as("__u"), col("b").as("__v"), col("w")),
        struct(col("b").as("__u"), col("a").as("__v"), col("w")))).as("__e"))
      .select(col("__e.__u").as("__u"), col("__e.__v").as("__v"),
        col("__e.w").as("__w"))
    val deg = persistDeg(ed.groupBy("__u").agg(count(lit(1)).as("__d")))
    val oriented = persistOriented(
      ed.join(deg.select(col("__u"), col("__d").as("__du")), "__u")
        .join(deg.select(col("__u").as("__v"), col("__d").as("__dv")), "__v")
        .filter(col("__du") < col("__dv") ||
          (col("__du") === col("__dv") && col("__u") < col("__v")))
        .select(col("__u").as("s"), col("__v").as("t"),
          col("__dv").as("dt"), col("__w").as("wt")))
    (deg, oriented)
  }

  /** Every triangle exactly once (vertices in orientation-rank order)
    * with its BOTTLENECK weight `__mw` = min of the three edge
    * weights: wedge (s→x, s→y) with rank(x) < rank(y) closes iff the
    * edge x→y exists in the oriented frame, fetched by an inner join
    * whose multiplicity is 1 (one oriented row per undirected edge).
    * Unit weights make `__mw` ≡ 1, so Σ __mw ≡ triangle COUNT — the
    * identity that lets one enumerator serve the whole family. */
  private def enumTriangles(oriented: DataFrame): DataFrame = {
    val w1 = oriented.select(col("s"), col("t").as("x"),
      col("dt").as("dx"), col("wt").as("wx"))
    val w2 = oriented.select(col("s"), col("t").as("y"),
      col("dt").as("dy"), col("wt").as("wy"))
    w1.join(w2, Seq("s"))
      .filter(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
      .join(oriented.select(col("s").as("x"), col("t").as("y"),
        col("wt").as("wxy")), Seq("x", "y"))
      .select(col("s"), col("x"), col("y"),
        least(col("wx"), col("wy"), col("wxy")).as("__mw"))
  }

  /** Weighted per-vertex triangle participation: [[triangleCounts]]
    * with each triangle contributing its BOTTLENECK WEIGHT — the MIN
    * of its three edge weights, the standard weighted-support notion
    * (a triangle is only as reinforced as its weakest tie). Answers
    * what the unweighted count cannot: a vertex in 50 incidental
    * single-co-order triangles reads as cohesive by count but carries
    * almost no triangle mass, while a vertex in 5 heavily-reinforced
    * triangles is the one an evidence-weighted curator keeps. Output
    * one row per vertex: `(id, degree, n_tri, tri_wmin_sum)` — all
    * exact longs (Σ min-weights ≤ n_tri·max_w; co-order multiplicities
    * keep the per-vertex sum far below 2⁶³ at any plausible scale —
    * widen to decimal past ~10¹⁸ like the assortativity family).
    * Uniform weight c makes tri_wmin_sum = c·n_tri exactly
    * (GraphSpec reduction pin).
    *
    * Scale shape: identical to [[triangleCounts]] — degree-oriented
    * wedge enumeration, O(E^{3/2}) candidates — with the closing-edge
    * semi-join upgraded to an inner join to FETCH the closing weight
    * (multiplicity unchanged: the oriented frame holds exactly one
    * row per undirected edge). */
  def weightedTriangleCounts(pairs: DataFrame, aCol: String, bCol: String,
      wCol: String, persist: Boolean = true): DataFrame = {
    val p = (df: DataFrame) => Caching.maybePersist(df, persist)
    val (deg, oriented) =
      orientEdges(canonicalWeighted(pairs, aCol, bCol, Some(wCol)), p, p)
    val perVertex = enumTriangles(oriented)
      .select(explode(array(col("s"), col("x"), col("y"))).as("id"),
        col("__mw"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"),
        sum(col("__mw")).as("tri_wmin_sum"))
    deg.select(col("__u").as("id"), col("__d").as("degree"))
      .join(perVertex, Seq("id"), "left")
      .na.fill(0L, Seq("n_tri", "tri_wmin_sum"))
  }

  /** Personalized PageRank: the teleport term returns ONLY to the
    * `seedFilter` vertex set, so ranks measure proximity-weighted
    * reachability FROM the seeds — the SOFT blast radius
    * ([[bfsHops]] is the hard horizon: that query says "within 3
    * hops", this one says "how strongly coupled", decaying 0.85 per
    * hop, summing over all paths). Same exact integer micro-unit
    * scheme as [[pageRank]] (bit-identical under any partitioning,
    * re-derivable by a single-threaded engine): seeds start at
    * 1,000,000 and receive the 150,000 teleport base each round;
    * non-seeds start (and teleport) at 0 and hold only flowed-in
    * mass. Same O(E)-per-iteration shape, persisted edge frame,
    * per-round localCheckpoint with block freeing. */
  def personalizedPageRank(pairs: DataFrame, aCol: String, bCol: String,
      seedFilter: Column => Column, iterations: Int = 10): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    // r20 (guide §5 caching): `edges` is consumed by BOTH `deg` and
    // `edgesDeg`, and `deg` by both `edgesDeg` and the rank init — with
    // only edgesDeg persisted, the (possibly expensive) upstream pair
    // pipeline re-ran up to three times before the loop even started
    // (measured: the co-purchase self-join executed twice, ~1.5 s of
    // the benched graph_pagerank). Both are released as soon as round
    // 1 has materialized edgesDeg's cache — only edgesDeg stays pinned
    // for the loop's lifetime, so peak storage is unchanged at scale.
    val edges = symmetricEdges(pairs, aCol, bCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = edges.groupBy("__u").agg(count(lit(1)).as("__deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edgesDeg = edges.join(deg, "__u")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var ranks = deg.select(col("__u").as("id"),
        when(seedFilter(col("__u")), lit(1000000L)).otherwise(lit(0L))
          .as("rank_micro"))
      for (i <- 1 to iterations) {
        val prev = ranks
        ranks = edgesDeg
          .join(ranks, edgesDeg("__u") === ranks("id"))
          .select(col("__v"),
            expr("rank_micro div __deg").as("__contrib"))
          .groupBy(col("__v"))
          .agg(sum(col("__contrib")).as("__s"))
          .select(col("__v").as("id"),
            (when(seedFilter(col("__v")), lit(150000L)).otherwise(lit(0L)) +
              expr("(85 * __s) div 100")).as("rank_micro"))
          .localCheckpoint(true)
        Caching.freeLocalCheckpoint(prev)
        if (i == 1) { edges.unpersist(); deg.unpersist() }
      }
      ranks
    } finally { edgesDeg.unpersist(); deg.unpersist(); edges.unpersist() }
  }

  /** Synchronous label propagation (Raghavan et al. 2007), `rounds`
    * fixed iterations: every vertex starts labeled with its own id
    * and each round adopts the MOST FREQUENT label among its
    * neighbors, ties to the smallest label — community detection by
    * local density, vs [[graft.operators.Dedup.connectedComponents]]
    * which only sees reachability (one bridge edge merges two CC
    * components; LPA keeps densely-knit sides apart). Fixed rounds +
    * integer labels + a total (count DESC, label ASC) argmax make the
    * result deterministic and partitioning-invariant — free-running
    * LPA is famously order-sensitive; this is the synchronous
    * derandomization, re-derivable round-by-round by any engine.
    *
    * Scale shape: each round is one edge⋈labels join and TWO
    * aggregations — (vertex, label) counts, then a per-vertex argmax
    * via ONE `min(struct(−count, label))` (no window: the argmax
    * rides hash aggregation with map-side partials, so the shuffle
    * carries candidate labels, not neighbor lists; negating the
    * always-long count keeps the label free to be any orderable
    * type). Per-round localCheckpoint with previous-round freeing,
    * the [[personalizedPageRank]] lineage discipline. Output:
    * `(id, label)`. */
  def labelPropagation(pairs: DataFrame, aCol: String, bCol: String,
      rounds: Int = 3): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val edges = symmetricEdges(pairs, aCol, bCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var labels = edges.select(col("__u").as("id")).distinct()
        .withColumn("__lbl", col("id"))
        .localCheckpoint(true)
      var prev = labels
      for (_ <- 1 to rounds) {
        // (count DESC, label ASC) argmax as ONE min(struct): negate the
        // COUNT — always a long — never the label, which may be any
        // orderable type (a negated string id would null-collapse)
        val next = edges
          .join(labels, edges("__v") === labels("id"))
          .groupBy(col("__u"), col("__lbl"))
          .agg(count(lit(1)).as("__c"))
          .groupBy(col("__u"))
          .agg(min(struct((-col("__c")).as("__nc"), col("__lbl").as("__l")))
            .as("__m"))
          .select(col("__u").as("id"), col("__m.__l").as("__lbl"))
          .localCheckpoint(true)
        Caching.freeLocalCheckpoint(prev)
        prev = next
        labels = next
      }
      labels.select(col("id"), col("__lbl").as("label"))
    } finally edges.unpersist()
  }

  /** The symmetric WEIGHTED edge list: [[symmetricEdges]] carrying an
    * integer weight column — multiplicity the unweighted operators'
    * `distinct()` throws away (a co-purchase pair ordered 40 times is
    * 20× the edge a twice-ordered pair is). Both directions in one
    * pass; duplicate (u, v) rows collapse keeping the max weight (an
    * undirected pair frame carries one weight per pair, so max is the
    * identity on well-formed input and a deterministic tie rule on
    * sloppy input). Weights cast to LONG — the exact-integer-division
    * contract of the micro-unit arithmetic. */
  private[graft] def symmetricWeightedEdges(pairs: DataFrame, aCol: String,
      bCol: String, wCol: String): DataFrame =
    pairs
      .select(explode(array(
        struct(col(aCol).as("__u"), col(bCol).as("__v"),
          col(wCol).cast("long").as("__w")),
        struct(col(bCol).as("__u"), col(aCol).as("__v"),
          col(wCol).cast("long").as("__w")))).as("__e"))
      .select(col("__e.__u").as("__u"), col("__e.__v").as("__v"),
        col("__e.__w").as("__w"))
      .groupBy("__u", "__v").agg(max(col("__w")).as("__w"))

  /** Weighted fixed-iteration PageRank: [[pageRank]] with each
    * neighbor receiving mass ∝ its EDGE WEIGHT — contribution
    * `(r · w) div Σw` over the vertex's total strength instead of
    * `r div deg` — so a heavily co-purchased pair pulls rank where
    * the unweighted walk treats a one-off basket coincidence
    * identically. Same exact integer micro-unit scheme (truncating
    * division per edge, identical in both engines; sums of longs
    * order-free ⇒ bit-identical under any partitioning; overflow
    * headroom: r·w ≤ total mass × max weight, ~2^63 only past
    * ~10¹³·max_w), same damping constants, same O(E)-per-iteration
    * shape with the strength-annotated edge frame persisted and
    * per-round localCheckpoint + block freeing.
    *
    * Reference: /root/reference/sqlengine.py has no graph surface
    * (extension per the brief's quality-weighting family). */
  def weightedPageRank(pairs: DataFrame, aCol: String, bCol: String,
      wCol: String, iterations: Int = 10): DataFrame =
    weightedPersonalizedPageRank(pairs, aCol, bCol, wCol, _ => lit(true),
      iterations)

  /** Weighted PERSONALIZED PageRank: [[weightedPageRank]]'s
    * strength-proportional walk with the teleport term gated on
    * `seedFilter` — rank starts at 1e6 on seeds / 0 elsewhere and each
    * iteration re-injects the 0.15 teleport mass on seeds only, so the
    * scores measure weighted proximity TO THE SEED SET (the
    * recommendation / crawl-frontier form), exactly as
    * [[personalizedPageRank]] does for the unweighted walk. The global
    * form is this with every vertex a seed (the teleport degenerates
    * to the constant), so the iteration loop lives here once —
    * mirroring the pageRank/personalizedPageRank split. Uniform
    * weights reduce bit-exactly to [[personalizedPageRank]]:
    * (r·c) div (c·Σdeg) = r div Σdeg for any positive c (floor of the
    * same rational — pinned in GraphSpec, not assumed). */
  def weightedPersonalizedPageRank(pairs: DataFrame, aCol: String,
      bCol: String, wCol: String, seedFilter: Column => Column,
      iterations: Int = 10): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    // r20: same multi-consumer persist hygiene as [[personalizedPageRank]]
    // — edges feeds strength AND edgesStr, strength feeds edgesStr AND
    // the rank init; both released once round 1 materializes the cache
    val edges = symmetricWeightedEdges(pairs, aCol, bCol, wCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val strength = edges.groupBy("__u").agg(sum(col("__w")).as("__s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edgesStr = edges.join(strength, "__u")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var ranks = strength.select(col("__u").as("id"),
        when(seedFilter(col("__u")), lit(1000000L)).otherwise(lit(0L))
          .as("rank_micro"))
      for (i <- 1 to iterations) {
        val prev = ranks
        ranks = edgesStr
          .join(ranks, edgesStr("__u") === ranks("id"))
          .select(col("__v"),
            expr("(rank_micro * __w) div __s").as("__contrib"))
          .groupBy(col("__v"))
          .agg(sum(col("__contrib")).as("__sum"))
          .select(col("__v").as("id"),
            (when(seedFilter(col("__v")), lit(150000L)).otherwise(lit(0L)) +
              expr("(85 * __sum) div 100")).as("rank_micro"))
          .localCheckpoint(true)
        Caching.freeLocalCheckpoint(prev)
        if (i == 1) { edges.unpersist(); strength.unpersist() }
      }
      ranks
    } finally { edgesStr.unpersist(); strength.unpersist(); edges.unpersist() }
  }

  /** Weighted synchronous label propagation: [[labelPropagation]]
    * scoring each candidate label by the SUM OF EDGE WEIGHTS carrying
    * it instead of the neighbor count — ties broken to the smallest
    * label by the same total (score DESC, label ASC) argmax, so the
    * result stays deterministic and partitioning-invariant, and a
    * single heavy co-purchase tie beats many incidental ones. Same
    * fixed-rounds derandomization, one edge⋈labels join + two
    * aggregations per round (the argmax rides hash aggregation via
    * `min(struct(−Σw, label))` — negate the always-long score, never
    * the label), per-round localCheckpoint with previous-round
    * freeing. Output: `(id, label)`. */
  def weightedLabelPropagation(pairs: DataFrame, aCol: String,
      bCol: String, wCol: String, rounds: Int = 3): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val edges = symmetricWeightedEdges(pairs, aCol, bCol, wCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var labels = edges.select(col("__u").as("id")).distinct()
        .withColumn("__lbl", col("id"))
        .localCheckpoint(true)
      var prev = labels
      for (_ <- 1 to rounds) {
        val next = edges
          .join(labels, edges("__v") === labels("id"))
          .groupBy(col("__u"), col("__lbl"))
          .agg(sum(col("__w")).as("__c"))
          .groupBy(col("__u"))
          .agg(min(struct((-col("__c")).as("__nc"), col("__lbl").as("__l")))
            .as("__m"))
          .select(col("__u").as("id"), col("__m.__l").as("__lbl"))
          .localCheckpoint(true)
        Caching.freeLocalCheckpoint(prev)
        prev = next
        labels = next
      }
      labels.select(col("id"), col("__lbl").as("label"))
    } finally edges.unpersist()
  }

  /** Fixed-round k-core peel: `rounds` synchronous rounds of "drop
    * every vertex whose degree AMONG SURVIVORS is < k", the classic
    * density filter of graph curation (a co-occurrence or link graph's
    * k-core is its mutually-supported body; the periphery peeled away
    * is the long tail one bad join away from noise). Returns every
    * vertex of the graph with `(id, in_core)` — survivors of round
    * `rounds` — plus `rounds_stable`, the FIRST round after which the
    * survivor set was OBSERVED unchanged (0 when nothing was ever
    * peeled), so a caller can see whether the fixed budget reached
    * the fixpoint. `rounds_stable == rounds` means the probe never
    * observed a stable round within the budget — the peel was either
    * still moving OR stabilized exactly at the last round (telling
    * them apart needs the never-run round rounds+1); raise `rounds`
    * to disambiguate, and an unchanged core confirms the latter.
    *
    * Fixed rounds, not peel-to-fixpoint, for the same reason LPA is
    * synchronous: the result is a pure function of (graph, k, rounds)
    * that a single-threaded SQL engine re-derives by unrolling — and
    * on real graphs the peel stabilizes in a handful of rounds (the
    * spec pins fixpoint-reached on the registered corpus). Each round
    * is one self-join degree count over the surviving edge set +
    * one filter — O(E) per round, localCheckpoint'ed with
    * previous-round freeing.
    *
    * Reference: /root/reference/sqlengine.py has no graph surface
    * (extension per the brief's quality-weighting family). */
  def kCore(pairs: DataFrame, aCol: String, bCol: String, k: Int,
      rounds: Int = 8): DataFrame = {
    require(k >= 1 && rounds >= 1,
      s"kCore: need k >= 1 and rounds >= 1, got k=$k rounds=$rounds")
    val edges = symmetricEdges(pairs, aCol, bCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val verts = edges.select(col("__u").as("id")).distinct()
        .localCheckpoint(true)
      var survivors = verts
      var prevFree: DataFrame = null
      var stableAt = rounds
      var stopped = false
      var r = 1
      while (r <= rounds && !stopped) {
        val deg = edges
          .join(survivors.select(col("id").as("__u")), Seq("__u"))
          .join(survivors.select(col("id").as("__v")), Seq("__v"))
          .groupBy("__u").agg(count(lit(1)).as("__d"))
        val next = deg.filter(col("__d") >= k)
          .select(col("__u").as("id"))
          .localCheckpoint(true)
        // fixpoint probe on materialized frames: same size ⇒ same set
        // (the survivor set only ever shrinks)
        if (next.count() == survivors.count()) {
          stableAt = r - 1
          stopped = true
        }
        // never free `verts` — the final outer join still reads it
        if ((prevFree ne null) && (prevFree ne verts))
          Caching.freeLocalCheckpoint(prevFree)
        prevFree = survivors
        survivors = next
        r += 1
      }
      if ((prevFree ne null) && (prevFree ne verts))
        Caching.freeLocalCheckpoint(prevFree)
      verts
        .join(survivors.withColumn("__in", lit(true)), Seq("id"), "left")
        .select(col("id"), coalesce(col("__in"), lit(false)).as("in_core"),
          lit(stableAt.toLong).as("rounds_stable"))
    } finally edges.unpersist()
  }

  /** Weighted k-core (the s-core of Eidsaa & Almaas): [[kCore]] with
    * the peel criterion on STRENGTH — the sum of edge weights to
    * SURVIVING neighbors — instead of degree, so a vertex held in by
    * one heavy tie stays where the unweighted peel (which sees a
    * single edge) would drop it, and a vertex propped up by many
    * one-off coincidences falls out. The natural core filter when
    * multiplicity means support (co-purchase counts, co-occurrence
    * frequencies): the unweighted 2-core keeps anything with two
    * incidental edges; the s-core demands accumulated evidence.
    *
    * Same fixed-round synchronous peel as [[kCore]] (pure function of
    * (graph, minStrength, rounds) ⇒ the oracle unrolls identically),
    * same `rounds_stable` self-audit with the same size-equality
    * fixpoint probe (the survivor set only shrinks, and strengths are
    * recomputed from the surviving edge set each round, so equal
    * survivor COUNTS between consecutive rounds imply the identical
    * set and hence a true fixpoint). Each round is one edge/survivor
    * semi-join pair + a weighted sum — O(E) per round, exact LONG
    * arithmetic (order-free sums ⇒ bit-identical under any
    * partitioning), localCheckpoint'ed with previous-round freeing.
    *
    * Reference: /root/reference/sqlengine.py has no graph surface
    * (extension per the brief's quality-weighting family). */
  def weightedKCore(pairs: DataFrame, aCol: String, bCol: String,
      wCol: String, minStrength: Long, rounds: Int = 8): DataFrame = {
    require(minStrength >= 1 && rounds >= 1,
      s"weightedKCore: need minStrength >= 1 and rounds >= 1, " +
        s"got minStrength=$minStrength rounds=$rounds")
    val edges = symmetricWeightedEdges(pairs, aCol, bCol, wCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val verts = edges.select(col("__u").as("id")).distinct()
        .localCheckpoint(true)
      var survivors = verts
      var prevFree: DataFrame = null
      var stableAt = rounds
      var stopped = false
      var r = 1
      while (r <= rounds && !stopped) {
        val st = edges
          .join(survivors.select(col("id").as("__u")), Seq("__u"))
          .join(survivors.select(col("id").as("__v")), Seq("__v"))
          .groupBy("__u").agg(sum(col("__w")).as("__s"))
        val next = st.filter(col("__s") >= minStrength)
          .select(col("__u").as("id"))
          .localCheckpoint(true)
        if (next.count() == survivors.count()) {
          stableAt = r - 1
          stopped = true
        }
        if ((prevFree ne null) && (prevFree ne verts))
          Caching.freeLocalCheckpoint(prevFree)
        prevFree = survivors
        survivors = next
        r += 1
      }
      if ((prevFree ne null) && (prevFree ne verts))
        Caching.freeLocalCheckpoint(prevFree)
      verts
        .join(survivors.withColumn("__in", lit(true)), Seq("id"), "left")
        .select(col("id"), coalesce(col("__in"), lit(false)).as("in_core"),
          lit(stableAt.toLong).as("rounds_stable"))
    } finally edges.unpersist()
  }

  /** Multi-source weighted shortest paths: synchronous min-plus
    * relaxation (Bellman–Ford in `rounds` fixed rounds) over the
    * undirected graph with an integer COST per edge — after round t,
    * `dist(v)` is the exact minimum cost over paths of ≤ t edges from
    * any seed, so a cheap 3-hop detour beats an expensive direct edge
    * the way [[bfsHops]] (which counts edges) cannot express.
    * Unreached vertices are absent, seeds at 0. Costs are caller
    * semantics: pass multiplicative-affinity edges through an
    * inverting map (e.g. `K div w`) so strong ties read as SHORT.
    *
    * Fixed rounds for oracle unrollability, with the family's
    * self-audit: `rounds_stable` is the first round observed to
    * change nothing. The fixpoint probe is a (count, sum) signature
    * of the materialized distance frame — a valid equality PROOF,
    * not a heuristic: per-id distances are non-increasing and ids
    * are never removed, so an equal count forces the same id set
    * and an equal sum then forces every value equal. Two scalar
    * aggregates per round, cheaper than a join probe.
    *
    * Scale shape: one edge equi-join + a min-combine shuffle per
    * round — O(E) per round like [[pageRank]], localCheckpoint'ed
    * with previous-round freeing; distance state is 16 B/vertex.
    * The duplicate-pair collapse inherits [[symmetricWeightedEdges]]'s
    * max rule — well-formed input carries one cost per pair, where it
    * is the identity.
    *
    * Reference: /root/reference/sqlengine.py has no graph surface
    * (extension per the brief's quality-weighting family). */
  def weightedShortestPaths(pairs: DataFrame, aCol: String, bCol: String,
      costCol: String, seedFilter: Column => Column,
      rounds: Int = 12): DataFrame = {
    require(rounds >= 1, s"weightedShortestPaths: rounds >= 1, got $rounds")
    val edges = symmetricWeightedEdges(pairs, aCol, bCol, costCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var dist = edges.select(col("__u").as("id")).distinct()
        .filter(seedFilter(col("id")))
        .select(col("id"), lit(0L).as("__d"))
        .localCheckpoint(true)
      def sig(df: DataFrame): (Long, Long) = {
        val r = df.agg(count(lit(1)), coalesce(sum(col("__d")), lit(0L))).head()
        (r.getLong(0), r.getLong(1))
      }
      var cur = sig(dist)
      var stableAt = rounds
      var stopped = false
      var r = 1
      while (r <= rounds && !stopped) {
        val relaxed = edges.join(dist, edges("__u") === dist("id"))
          .select(col("__v").as("id"), (col("__d") + col("__w")).as("__d"))
        val next = dist.unionAll(relaxed)
          .groupBy("id").agg(min(col("__d")).as("__d"))
          .localCheckpoint(true)
        val nsig = sig(next)
        if (nsig == cur) {
          stableAt = r - 1
          stopped = true
        }
        Caching.freeLocalCheckpoint(dist)
        dist = next
        cur = nsig
        r += 1
      }
      dist.select(col("id"), col("__d").as("dist"),
        lit(stableAt.toLong).as("rounds_stable"))
    } finally edges.unpersist()
  }

  /** Multi-source BFS hop distance over the undirected graph
    * `pairs(aCol, bCol)`: every vertex reachable within `maxHops` of a
    * seed gets `(id, hops)` with hops = its MINIMUM hop count (seeds
    * themselves at 0). Seeds are the graph vertices satisfying
    * `seedFilter` — a predicate, not a frame, so seed selection reuses
    * the persisted edge list instead of re-running the upstream pair
    * pipeline. Unreached vertices are absent (the k-hop NEIGHBORHOOD,
    * not an eccentricity table).
    *
    * This is the blast-radius primitive of corpus curation: "every
    * document within 3 links of a known-bad seed set" (contamination
    * spread), or "the 2-hop context of a quality-labeled core" —
    * queries a recursive CTE answers on one node and frontier
    * expansion answers on a cluster.
    *
    * Scale shape: level-synchronous frontier expansion — round h is
    * ONE equi-join of the edge list with the (new-vertices-only)
    * frontier plus one distinct and one anti-join against the settled
    * set; integer hops only, so results are bit-stable under any
    * partitioning. Each round's frames are localCheckpoint'ed and the
    * previous round's blocks freed (the [[pageRank]] lineage lesson);
    * total work is O(E·maxHops) worst case, and each vertex enters the
    * frontier at most once — the reason the settled set is anti-joined
    * BEFORE a vertex re-expands, not deduped after.
    *
    * Reference: /root/reference/sqlengine.py has no graph surface
    * (extension per the brief's quality-weighting family). */
  def bfsHops(pairs: DataFrame, aCol: String, bCol: String,
      seedFilter: Column => Column, maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val edges = symmetricEdges(pairs, aCol, bCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // every vertex appears as a __u of the symmetric edge list
      var dist = edges.select(col("__u").as("id")).distinct()
        .filter(seedFilter(col("id")))
        .select(col("id"), lit(0L).as("hops"))
        .localCheckpoint(true)
      var frontier = dist.select("id")
      var lastRound: Seq[DataFrame] = Seq(dist)
      var h = 1
      var exhausted = false
      while (h <= maxHops && !exhausted) {
        val next = edges.join(frontier, edges("__u") === frontier("id"))
          .select(col("__v").as("id")).distinct()
          .join(dist, Seq("id"), "left_anti")
          .select(col("id"), lit(h.toLong).as("hops"))
          .localCheckpoint(true)
        val settled = dist.union(next).localCheckpoint(true)
        // this round's frames are materialized; last round's blocks
        // (except the final `settled`, returned lazily) are dead
        lastRound.foreach(Caching.freeLocalCheckpoint)
        lastRound = Seq(next, settled)
        dist = settled
        frontier = next.select("id")
        // an empty frontier can never repopulate — skip the dead
        // rounds a generous maxHops would otherwise still pay (each
        // an O(E) join plus two checkpoint jobs); isEmpty is a cheap
        // scan of the just-materialized checkpoint
        exhausted = next.isEmpty
        h += 1
      }
      Caching.freeLocalCheckpoint(lastRound.head) // final frontier
      dist
    } finally edges.unpersist()
  }

  /** Per-seed closeness centrality within a hop horizon: for every
    * seed s, run the [[bfsHops]] expansion INDIVIDUALLY (the settled
    * set is keyed by (seed, vertex), so one job carries all seeds'
    * frontiers at once — no per-seed driver loop) and report
    * `(seed, n_reached, total_hops, closeness_micro)` with
    * closeness = (n_reached) / Σ dist in exact `10⁶·n div Σ` micro
    * units — the "how central is this document/part in its
    * neighborhood" score, horizon-bounded the way a 100 TB graph
    * forces it to be (full-graph closeness is an all-pairs problem;
    * the h-bounded form is the standard practical surrogate).
    * `n_reached` excludes the seed itself; a seed with no reachable
    * neighbor scores 0.
    *
    * Scale shape: identical rounds to [[bfsHops]] — one edge
    * equi-join per hop against the (seed, vertex)-keyed frontier,
    * distinct, anti-join vs settled, localCheckpoint with
    * previous-round block freeing. The frontier is at most
    * |seeds| × V rows; with a bounded seed set (the intended use)
    * that is a constant factor on the BFS, not a new asymptotic. */
  /** The (source, vertex)-keyed level-synchronous BFS all multi-seed
    * operators fold over ([[seedCloseness]], [[anf]]'s exact audit):
    * one edge equi-join per hop against the keyed frontier, distinct,
    * anti-join vs settled, localCheckpoint with previous-round block
    * freeing, early exit on an exhausted frontier. Returns the settled
    * `(s, id, hops)` frame — hops is the MINIMUM distance by BFS
    * construction. `edges` must be the [[symmetricEdges]] frame,
    * already persisted by the caller (who also unpersists it). */
  private def multiSourceBfs(edges: DataFrame,
      sourceFilter: Column => Column, maxHops: Int): DataFrame = {
    var dist = edges.select(col("__u").as("id")).distinct()
      .filter(sourceFilter(col("id")))
      .select(col("id").as("s"), col("id"), lit(0L).as("hops"))
      .localCheckpoint(true)
    var frontier = dist.select("s", "id")
    var lastRound: Seq[DataFrame] = Seq(dist)
    var h = 1
    var exhausted = false
    while (h <= maxHops && !exhausted) {
      val next = edges.join(frontier, edges("__u") === frontier("id"))
        .select(col("s"), col("__v").as("id")).distinct()
        .join(dist, Seq("s", "id"), "left_anti")
        .select(col("s"), col("id"), lit(h.toLong).as("hops"))
        .localCheckpoint(true)
      val settled = dist.union(next).localCheckpoint(true)
      lastRound.foreach(Caching.freeLocalCheckpoint)
      lastRound = Seq(next, settled)
      dist = settled
      frontier = next.select("s", "id")
      exhausted = next.isEmpty
      h += 1
    }
    Caching.freeLocalCheckpoint(lastRound.head)
    dist
  }

  def seedCloseness(pairs: DataFrame, aCol: String, bCol: String,
      seedFilter: Column => Column, maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val edges = symmetricEdges(pairs, aCol, bCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      multiSourceBfs(edges, seedFilter, maxHops)
        .groupBy(col("s").as("seed"))
        .agg((count(lit(1)) - 1L).as("n_reached"),
          sum(col("hops")).as("total_hops"))
        .select(col("seed"), col("n_reached"), col("total_hops"),
          when(col("total_hops") > 0,
            expr("(1000000 * n_reached) div total_hops"))
            .otherwise(lit(0L)).as("closeness_micro"))
    } finally edges.unpersist()
  }

  /** Per-seed HARMONIC centrality, horizon-bounded: Σ over reached
    * vertices of 1/d(s,v) — the closeness variant that is ROBUST to
    * disconnection (Boldi–Vigna, "Axioms for Centrality", Internet
    * Math. 2014, public paper: harmonic is the member of the
    * closeness family satisfying all their axioms). The distinction
    * [[seedCloseness]] structurally cannot make: closeness divides
    * n by Σd, so a seed reaching ONE vertex at distance 1 scores the
    * maximal 10⁶ — identical to a hub reaching its whole component
    * at distance 1 — while harmonic SUMS reciprocals, so every extra
    * reachable vertex adds mass and the isolated-pair seed scores
    * 10⁶ total vs the hub's (n·10⁶). Under a horizon every closeness
    * is implicitly "within h"; harmonic's unreachable-means-zero-term
    * convention makes that exact rather than a truncation artifact.
    *
    * Exactness: each term is the exact integer `10⁶ div d` and the
    * sum stays a long (≤ V·10⁶ ≪ 2⁶³) — rational micro-units, the
    * closeness/PPR family convention, so DuckDB re-derives the score
    * bit-for-bit. Per-term flooring (Σ⌊10⁶/d⌋, not ⌊10⁶·Σ1/d⌋) is
    * part of the contract and mirrored in the oracle.
    *
    * Scale shape: exactly [[seedCloseness]] — the shared
    * [[multiSourceBfs]] rounds plus one per-seed aggregate; the
    * bounded seed panel is the cost knob, O(|panel|·E·h) total.
    *
    * Returns one row per seed: (seed, n_reached, harmonic_micro);
    * n_reached excludes the seed, a seed reaching nothing scores 0. */
  def harmonicCentrality(pairs: DataFrame, aCol: String, bCol: String,
      seedFilter: Column => Column, maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val edges = symmetricEdges(pairs, aCol, bCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      multiSourceBfs(edges, seedFilter, maxHops)
        .groupBy(col("s").as("seed"))
        .agg((count(lit(1)) - 1L).as("n_reached"),
          coalesce(sum(when(col("hops") > 0L,
            expr("1000000 div hops"))), lit(0L)).as("harmonic_micro"))
    } finally edges.unpersist()
  }

  /** Weighted per-seed closeness: [[seedCloseness]] with SUM-OF-COSTS
    * distances instead of hop counts — per seed,
    * `closeness = 10⁶ · n_reached div Σ dist` over the min-plus
    * distances of [[weightedShortestPaths]], so a seed tied to its
    * neighborhood by heavy (short, under an inverting cost map) edges
    * scores higher than one the hop metric cannot distinguish from
    * it. The relaxation state is keyed (seed, vertex) — one job
    * carries every seed's frontier at once, the multiSourceBfs
    * contract — and the fixpoint probe is the same (count, sum)
    * signature PROOF as [[weightedShortestPaths]] (per-key distances
    * non-increasing, keys never leave). `n_reached` excludes the
    * seed; a seed reaching nothing scores 0.
    *
    * Scale shape: O(E·|seeds-reachable|) per round upper-bounded by
    * seeds × V state rows — with a bounded seed set (the intended
    * use, as in seedCloseness) a constant factor on the relaxation,
    * not a new asymptotic. Distances bounded within `rounds` edges,
    * the horizon a 100 TB graph forces anyway. */
  def weightedSeedCloseness(pairs: DataFrame, aCol: String, bCol: String,
      costCol: String, seedFilter: Column => Column,
      rounds: Int = 12): DataFrame =
    minPlusFold(pairs, aCol, bCol, costCol, seedFilter, rounds,
      "weightedSeedCloseness") { dist =>
      dist.groupBy(col("s").as("seed"))
        .agg((count(lit(1)) - 1L).as("n_reached"),
          sum(col("__d")).as("total_dist"))
        .select(col("seed"), col("n_reached"), col("total_dist"),
          when(col("total_dist") > 0,
            expr("(1000000 * n_reached) div total_dist"))
            .otherwise(lit(0L)).as("closeness_micro"))
    }

  /** Weighted harmonic centrality: [[harmonicCentrality]]'s
    * reciprocal-sum fold over the MIN-PLUS distances of
    * [[weightedSeedCloseness]]'s relaxation — Σ of exact
    * `10⁶ div dist` terms (per-term flooring, the contract both the
    * hop form and the oracle share), so a seed knit to its
    * neighborhood by heavy (cheap, under an inverting cost map) ties
    * scores higher than hops can express, while staying robust to
    * disconnection the way the n/Σd closeness ratio is not. Same
    * (seed, vertex)-keyed relaxation, same (count, sum) fixpoint
    * proof, one job for all seeds.
    *
    * Returns one row per seed: (seed, n_reached, harmonic_micro). */
  def weightedHarmonicCentrality(pairs: DataFrame, aCol: String,
      bCol: String, costCol: String, seedFilter: Column => Column,
      rounds: Int = 12): DataFrame =
    minPlusFold(pairs, aCol, bCol, costCol, seedFilter, rounds,
      "weightedHarmonicCentrality") { dist =>
      dist.groupBy(col("s").as("seed"))
        .agg((count(lit(1)) - 1L).as("n_reached"),
          coalesce(sum(when(col("__d") > 0L,
            expr("1000000 div __d"))), lit(0L)).as("harmonic_micro"))
    }

  /** The bounded min-plus relaxation shared by the weighted
    * centrality folds: (seed, vertex)-keyed distances, one edge join
    * + (s, id)-min per round, (count, Σd) signature fixpoint
    * early-stop (distances non-increasing, keys never leave — the
    * [[weightedShortestPaths]] proof), per-round localCheckpoint +
    * freeing. `fold` reduces the settled (s, id, __d) frame. */
  private def minPlusFold(pairs: DataFrame, aCol: String, bCol: String,
      costCol: String, seedFilter: Column => Column, rounds: Int,
      tag: String)(fold: DataFrame => DataFrame): DataFrame = {
    require(rounds >= 1, s"$tag: rounds >= 1, got $rounds")
    val edges = symmetricWeightedEdges(pairs, aCol, bCol, costCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var dist = edges.select(col("__u").as("id")).distinct()
        .filter(seedFilter(col("id")))
        .select(col("id").as("s"), col("id"), lit(0L).as("__d"))
        .localCheckpoint(true)
      def sig(df: DataFrame): (Long, Long) = {
        val r = df.agg(count(lit(1)), coalesce(sum(col("__d")), lit(0L))).head()
        (r.getLong(0), r.getLong(1))
      }
      var cur = sig(dist)
      var stopped = false
      var r = 1
      while (r <= rounds && !stopped) {
        val relaxed = edges.join(dist, edges("__u") === dist("id"))
          .select(col("s"), col("__v").as("id"),
            (col("__d") + col("__w")).as("__d"))
        val next = dist.unionAll(relaxed)
          .groupBy("s", "id").agg(min(col("__d")).as("__d"))
          .localCheckpoint(true)
        val nsig = sig(next)
        if (nsig == cur) stopped = true
        Caching.freeLocalCheckpoint(dist)
        dist = next
        cur = nsig
        r += 1
      }
      fold(dist)
    } finally edges.unpersist()
  }

  /** Resource-allocation link prediction (Zhou, Lü & Zhang, Eur. Phys.
    * J. B 2009): for every NON-adjacent pair (a, b), score
    * RA(a,b) = Σ_{w ∈ Γ(a) ∩ Γ(b)} 1/deg(w) — each shared neighbor
    * votes for the missing edge with weight inverse to its degree (a
    * hub that neighbors everything says nothing; an exclusive mutual
    * contact says a lot). The classic Adamic–Adar index is the same
    * sum with 1/log deg(w); RA's rational weight is chosen here
    * because it needs NO transcendental function — `10⁹ div deg(w)`
    * nano-units are exact integers any engine reproduces bit-for-bit
    * (log doubles differ by ulps across libm implementations), and
    * the two indices rank near-identically in the published
    * evaluations. Returns the `topK` highest-scoring absent edges:
    * `(a, b, common, ra_nano, ra_score)` with a < b, ties broken by
    * (a, b), score = nano / 1e9 in ONE final double division.
    *
    * Scale shape: wedges are generated per CENTER (the shared
    * neighbor) by self-joining its adjacency rows, so the candidate
    * count is Σ_w deg(w)² — quadratic in hub degree. The
    * `maxCenterDegree` cap makes that bound linear: centers above the
    * cap are excluded BEFORE the self-join, so candidates ≤
    * cap · Σ deg = 2·cap·E. That exclusion is part of the algorithm's
    * definition here, not an approximation knob left implicit: a
    * super-hub center contributes ≤ 10⁹/cap per pair — the pairs it
    * votes for are exactly the ones RA is designed to discount — and
    * the oracle applies the identical cap. Aggregation runs BEFORE
    * the absent-edge anti-join (pairs, not wedges, hit the join), and
    * the final top-k is a bounded TakeOrdered, never a full sort. */
  def linkPredictionRA(pairs: DataFrame, aCol: String, bCol: String,
      maxCenterDegree: Long = 64L, topK: Int = 20): DataFrame = {
    require(maxCenterDegree >= 2,
      s"maxCenterDegree must be >= 2 (a degree-1 center forms no wedge), " +
        s"got $maxCenterDegree")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val ed = symmetricEdges(pairs, aCol, bCol)
    val deg = ed.groupBy("__u").agg(count(lit(1)).as("__d"))
    // adjacency rows of capped centers, each carrying the center's
    // exact nano-weight (truncating div — both engines agree)
    val centers = ed.join(deg.filter(col("__d") <= maxCenterDegree), "__u")
      .select(col("__u").as("w"), col("__v").as("n"),
        expr("1000000000 div __d").as("wt"))
    val wedges = centers.select(col("w"), col("n").as("a"), col("wt"))
      .join(centers.select(col("w"), col("n").as("b")), Seq("w"))
      .filter(col("a") < col("b"))
    val scored = wedges.groupBy("a", "b").agg(
      count(lit(1)).as("common"), sum(col("wt")).as("ra_nano"))
    val existing = ed.filter(col("__u") < col("__v"))
      .select(col("__u").as("a"), col("__v").as("b"))
    scored.join(existing, Seq("a", "b"), "left_anti")
      .select(col("a"), col("b"), col("common"), col("ra_nano"),
        (col("ra_nano").cast("double") / lit(1.0e9)).as("ra_score"))
      .orderBy(col("ra_nano").desc, col("a").asc, col("b").asc)
      .limit(topK)
  }

  /** Fixed-round k-truss peel: the maximal subgraph in which every
    * EDGE closes at least k−2 triangles with other surviving edges —
    * the edge-level sibling of [[kCore]]'s vertex peel, and a much
    * stronger cohesion filter (a k-core can be a sparse tangle of
    * bridges; a k-truss is made of overlapping triangles). Corpus
    * curation reads it as "keep only the relationships that are
    * themselves corroborated": a co-purchase edge inside the 3-truss
    * is witnessed by a third product, a bridge edge is not.
    *
    * Each round re-derives per-edge support over the CURRENT survivor
    * set with the [[triangleCounts]] machinery — degree orientation
    * bounds the wedge join at O(E^{3/2}) candidates per round (the
    * Schank–Suri bound), and each triangle is enumerated exactly once,
    * contributing support to its three canonical edges. The loop body
    * re-derives the orientation rather than sharing triangleCounts'
    * one-shot frames because the persist lifecycle differs: here every
    * round's oriented frame is persisted for its three plan reads and
    * freed at round end, with survivor sets localCheckpoint'ed and the
    * previous round's blocks dropped (the [[kCore]] lineage contract).
    *
    * Fixed `rounds`, not peel-to-fixpoint, for oracle unrollability;
    * `rounds_stable` self-audits where the peel stabilized (the edge
    * set only shrinks, so the first count equality IS the fixpoint),
    * with the same caveat as kCore: a result with rounds_stable ==
    * rounds may still be moving — raise `rounds` to disambiguate.
    *
    * Returns one row per ORIGINAL canonical edge:
    * `(aCol, bCol, in_truss, rounds_stable)`.
    *
    * Reference: /root/reference/sqlengine.py has no graph surface
    * (extension per the brief's quality-weighting family). */
  def kTruss(pairs: DataFrame, aCol: String, bCol: String, k: Int,
      rounds: Int = 4): DataFrame = {
    require(k >= 3 && rounds >= 1,
      s"kTruss: need k >= 3 (k−2 triangles per edge) and rounds >= 1, " +
        s"got k=$k rounds=$rounds")
    // unit weights make Σ bottleneck weights ≡ triangle COUNT, so the
    // count truss IS the weighted peel at minSupport = k−2 — one peel
    // implementation serves both (the reduction GraphSpec pins)
    trussPeel(canonicalWeighted(pairs, aCol, bCol, None), aCol, bCol,
      minSupport = (k - 2).toLong, rounds = rounds)
  }

  /** The shared truss peel: fixed synchronous rounds over a canonical
    * weighted edge frame, each round re-enumerating triangles among
    * the CURRENT survivors ([[orientEdges]] + [[enumTriangles]]) and
    * keeping edges whose summed bottleneck support reaches
    * `minSupport`. Size-equality fixpoint early-exit (the survivor
    * set only shrinks, so an unchanged count is a set-equality
    * proof); per-round localCheckpoint with previous-round freeing. */
  private def trussPeel(orig0: DataFrame, aCol: String, bCol: String,
      minSupport: Long, rounds: Int): DataFrame = {
    val orig = orig0.localCheckpoint(true)
    var edges = orig
    var prevFree: DataFrame = null
    var stableAt = rounds
    var stopped = false
    var r = 1
    while (r <= rounds && !stopped) {
      val (_, oriented) = orientEdges(edges, identity,
        _.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      // each triangle supports its three canonical edges with its
      // bottleneck weight (≡ 1 under unit weights)
      val sup = enumTriangles(oriented).select(col("__mw"), explode(array(
          struct(least(col("s"), col("x")).as("a"),
            greatest(col("s"), col("x")).as("b")),
          struct(least(col("s"), col("y")).as("a"),
            greatest(col("s"), col("y")).as("b")),
          struct(least(col("x"), col("y")).as("a"),
            greatest(col("x"), col("y")).as("b")))).as("__e"))
        .select(col("__e.a").as("a"), col("__e.b").as("b"), col("__mw"))
        .groupBy("a", "b").agg(sum(col("__mw")).as("__sup"))
      val next = edges.join(sup.filter(col("__sup") >= minSupport)
          .select("a", "b"), Seq("a", "b"), "left_semi")
        .localCheckpoint(true)
      oriented.unpersist()
      if (next.count() == edges.count()) {
        stableAt = r - 1
        stopped = true
      }
      // never free `orig` — the final outer join still reads it
      if ((prevFree ne null) && (prevFree ne orig))
        Caching.freeLocalCheckpoint(prevFree)
      prevFree = edges
      edges = next
      r += 1
    }
    if ((prevFree ne null) && (prevFree ne orig))
      Caching.freeLocalCheckpoint(prevFree)
    orig
      .join(edges.select("a", "b").withColumn("__in", lit(true)),
        Seq("a", "b"), "left")
      .select(col("a").as(aCol), col("b").as(bCol),
        coalesce(col("__in"), lit(false)).as("in_truss"),
        lit(stableAt.toLong).as("rounds_stable"))
  }

  /** Weighted k-truss: the [[kTruss]] edge peel with WEIGHTED support
    * — an edge survives a round iff the sum of its supporting
    * triangles' bottleneck weights (min of the 3 edge weights, the
    * [[weightedTriangleCounts]] notion) reaches `minSupport`. The
    * unweighted truss demands k−2 triangles regardless of evidence;
    * this one demands accumulated triangle MASS, so two incidental
    * single-co-order triangles no longer outrank one heavily-
    * reinforced triangle. Uniform weight c makes weighted support =
    * c·(triangle count), so `minSupport = c·(k−2)` reproduces
    * [[kTruss]]'s in_truss flags EXACTLY (GraphSpec reduction pin).
    *
    * Same fixed synchronous rounds + `rounds_stable` self-audit, same
    * per-round O(E^{3/2}) degree-oriented enumeration (closing edge
    * fetched by inner join for its weight — multiplicity 1), same
    * localCheckpoint + block-freeing loop hygiene. Output one row per
    * input edge: `(aCol, bCol, in_truss, rounds_stable)`. */
  def weightedKTruss(pairs: DataFrame, aCol: String, bCol: String,
      wCol: String, minSupport: Long, rounds: Int = 4): DataFrame = {
    require(minSupport >= 1 && rounds >= 1,
      s"weightedKTruss: need minSupport >= 1 and rounds >= 1, " +
        s"got minSupport=$minSupport rounds=$rounds")
    trussPeel(canonicalWeighted(pairs, aCol, bCol, Some(wCol)), aCol, bCol,
      minSupport = minSupport, rounds = rounds)
  }

  /** Degree assortativity (Newman, PRL 2002): the Pearson correlation
    * of endpoint degrees over the edges — POSITIVE when high-degree
    * vertices link to each other (a social-graph signature), NEGATIVE
    * when hubs link to leaves (a star/infrastructure signature). The
    * one-number structural summary that tells a corpus curator whether
    * a link graph's hubs form a core (crawl it first) or a broadcast
    * fringe (downweight it).
    *
    * Over the SYMMETRIC directed edge list both endpoint marginals are
    * identical, so Pearson's sqrt-product denominator collapses to one
    * variance term and the whole statistic is RATIONAL in the degree
    * sums — no sqrt, no transcendental:
    *   r = (M·Σxy − (Σx)²) / (M·Σx² − (Σx)²)
    * with x, y the endpoint degrees of each of the M directed edges.
    * All four sums are exact longs (caveat: Σxy ≤ M·maxdeg² — beyond
    * ~1e18 widen to decimals), r is ONE final double division, and a
    * degree-regular graph (denominator 0: correlation undefined)
    * reports 0.0 by the drift-family convention rather than NaN.
    *
    * Scale shape: two broadcast-ish joins of the edge list with the
    * degree table + one global aggregate — O(E), one shuffle on vertex
    * id, no iteration, no driver state.
    *
    * Returns one row: (m_edges, s_x, s_xy, s_x2, assortativity). */
  def degreeAssortativity(pairs: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val ed = symmetricEdges(pairs, aCol, bCol)
    val deg = ed.groupBy("__u").agg(count(lit(1)).as("__d"))
    val j = ed
      .join(deg.select(col("__u"), col("__d").as("dx")), "__u")
      .join(deg.select(col("__u").as("__v"), col("__d").as("dy")), "__v")
    val num = col("m_edges") * col("s_xy") - col("s_x") * col("s_x")
    val den = col("m_edges") * col("s_x2") - col("s_x") * col("s_x")
    j.agg(count(lit(1)).as("m_edges"),
        coalesce(sum(col("dx")), lit(0L)).as("s_x"),
        coalesce(sum(col("dx") * col("dy")), lit(0L)).as("s_xy"),
        coalesce(sum(col("dx") * col("dx")), lit(0L)).as("s_x2"))
      .select(col("m_edges"), col("s_x"), col("s_xy"), col("s_x2"),
        when(den === 0L, lit(0.0))
          .otherwise(num.cast("double") / den.cast("double"))
          .as("assortativity"))
  }

  /** Weighted (strength) assortativity: [[degreeAssortativity]] with
    * endpoint STRENGTHS (Σ incident weights) as the correlated
    * quantity and each directed edge contributing with weight w —
    * the Leung–Chau weighted form. Answers the curator question the
    * degree form cannot: do heavily-tied vertices tie heavily to
    * EACH OTHER (a reinforced core worth crawling first), or do
    * heavy hubs spray weight at light leaves? Same rational-in-sums
    * collapse (the symmetric edge list makes both marginals
    * identical):
    *   r = (W·Σw·x·y − (Σw·x)²) / (W·Σw·x² − (Σw·x)²)
    * with x, y the endpoint strengths and W = Σw over the M directed
    * edges. Σw·x·y is bounded by W·maxstrength² — the 10× co-purchase
    * graph already wraps a long SUM (the w1Drift gap-factor lesson,
    * measured: ANSI overflow at 335× the edges) — so w widens to
    * DECIMAL(38,0) BEFORE any multiply and the three product sums
    * ACCUMULATE as exact DECIMAL(38,0); no long product exists
    * anywhere in the chain. The diagnostic sums EMIT as BIGINT
    * behind a loud `assert_true` boundary guard (the exact w1Drift
    * pattern, which hashes green): decimal128 output was the one
    * column type no other query surfaced and the driver's DECIMAL
    * canonicalization is client-library-dependent, so the internal
    * accumulator stays wide while the wire type is the plain long
    * every other row uses. A corpus whose sums genuinely exceed
    * 2⁶³−1 fails fast with the measured value instead of wrapping.
    * ONE final double division of the exact decimal num/den;
    * degenerate denominator reports 0.0 (the drift-family
    * convention). Uniform weights c scale num and den by exactly c⁴
    * in integer arithmetic, so the statistic reduces to the degree
    * form (pinned, not assumed).
    *
    * Scale shape: identical to the degree form — two joins of the
    * edge list with the strength table + one global aggregate, O(E),
    * one shuffle on vertex id, no iteration, no driver state.
    *
    * Returns one row: (w_total, s_x, s_xy, s_x2, assortativity). */
  def weightedAssortativity(pairs: DataFrame, aCol: String,
      bCol: String, wCol: String): DataFrame = {
    val ed = symmetricWeightedEdges(pairs, aCol, bCol, wCol)
    val st = ed.groupBy("__u").agg(sum(col("__w")).as("__s"))
    val j = ed
      .join(st.select(col("__u"), col("__s").as("sx")), "__u")
      .join(st.select(col("__u").as("__v"), col("__s").as("sy")), "__v")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val zero = lit(0).cast(dec)
    val num = col("w_total").cast(dec) * col("s_xy") - col("s_x") * col("s_x")
    val den = col("w_total").cast(dec) * col("s_x2") - col("s_x") * col("s_x")
    // __w widens to decimal BEFORE any multiply: a long w·x wraps
    // silently in non-ANSI mode once strengths grow (the w1Drift
    // lesson — 10× corpus is 335× edge mass), and the decimal sums
    // downstream can't repair a wrapped term.
    val wDec = col("__w").cast(dec)
    j.agg(coalesce(sum(col("__w")), lit(0L)).as("w_total"),
        coalesce(sum(wDec * col("sx").cast(dec)), zero).as("s_x"),
        coalesce(sum(wDec * col("sx").cast(dec) * col("sy").cast(dec)),
          zero).as("s_xy"),
        coalesce(sum(wDec * col("sx").cast(dec) * col("sx").cast(dec)),
          zero).as("s_x2"))
      .filter(assert_true(
        col("s_xy") <= lit(Long.MaxValue).cast(dec) &&
          col("s_x2") <= lit(Long.MaxValue).cast(dec) &&
          col("s_x") <= lit(Long.MaxValue).cast(dec),
        concat(lit("weightedAssortativity: diagnostic sum exceeds "
            + "BIGINT (s_x="), col("s_x"), lit(", s_xy="), col("s_xy"),
          lit(", s_x2="), col("s_x2"),
          lit(") — widen the output to decimal"))).isNull)
      .select(col("w_total"),
        col("s_x").cast("long").as("s_x"),
        col("s_xy").cast("long").as("s_xy"),
        col("s_x2").cast("long").as("s_x2"),
        when(den === zero, lit(0.0))
          .otherwise(num.cast("double") / den.cast("double"))
          .as("assortativity"))
  }

  /** Bipartite HITS — hubs and authorities (Kleinberg, "Authoritative
    * Sources in a Hyperlinked Environment", JACM '99, public paper)
    * over a two-sided relation frame `edges(leftCol, rightCol)`, e.g.
    * customers × the parts they ordered. The mutual-reinforcement
    * recurrence from h₀ ≡ 1:
    *   aₜ(v) = Σ_{(u,v)∈E} hₜ₋₁(u)   (an authority is valued by the
    *                                   hubs that reach it)
    *   hₜ(u) = Σ_{(u,v)∈E} aₜ(v)     (a hub by the authorities it
    *                                   reaches)
    * On a BIPARTITE relation the two sides never mix, so hub and
    * authority answer two different ranking questions (which buyers
    * have the widest reach into well-bought parts; which parts are
    * bought by the widest-reaching buyers) — on a symmetric graph the
    * distinction collapses into plain eigenvector centrality, which is
    * why this operator takes the two-sided frame, not the co-purchase
    * edge list.
    *
    * Determinism/exactness: `rounds` fixed power-iteration rounds with
    * NO per-round normalization — a positive global scale cannot
    * reorder scores, and skipping it keeps every score an exact
    * integer so the result hashes bit-identically cross-engine. Sums
    * accumulate as DECIMAL(38,0) (score mass multiplies by ~avg-degree
    * each half-round; long products are the w1Drift overflow lesson);
    * the emitted `score` casts to long, exact while the final mass
    * stays under 2⁶³ — at the default 2 rounds that is ≥ petabyte-SF
    * headroom on this schema (score ≤ maxdeg⁴·|V|, measured ~10⁷ at
    * sf0.01), and a caller raising `rounds` on a denser relation
    * should emit the decimal directly instead. Round 1's authority is
    * exactly the right-side degree (h₀ ≡ 1) — the uniform-start
    * anchor GraphSpec pins.
    *
    * Scale shape: each half-round is ONE equi-join of the edge list
    * against the ≤|V|-row score frame plus ONE partial-agg groupBy —
    * O(E·rounds) total, no windows, no driver state, no per-round
    * actions; with `rounds` small and fixed the whole chain stays one
    * lazy plan (no checkpointing needed — contrast the open-ended
    * fixpoint loops, which checkpoint per round). Duplicate (left,
    * right) rows collapse first so the relation's row multiplicity
    * does not silently weight the walk.
    *
    * Returns one row per node: (side ∈ 'authority' | 'hub', node_id,
    * score) — authorities are right-side nodes, hubs left-side.
    *
    * Reference: /root/reference/sqlengine.py has no graph surface
    * (extension per the brief's quality-weighting family). */
  def bipartiteHits(edges: DataFrame, leftCol: String, rightCol: String,
      rounds: Int = 2): DataFrame = {
    require(rounds >= 1, "bipartiteHits needs at least one round")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val ed = edges.select(col(leftCol).as("__l"), col(rightCol).as("__r"))
      .distinct()
    def authOf(h: DataFrame): DataFrame =
      ed.join(h, "__l").groupBy("__r").agg(sum(col("__h")).cast(dec).as("__a"))
    def hubOf(a: DataFrame): DataFrame =
      ed.join(a, "__r").groupBy("__l").agg(sum(col("__a")).cast(dec).as("__h"))
    val h0 = ed.select("__l").distinct()
      .select(col("__l"), lit(1).cast(dec).as("__h"))
    var auth = authOf(h0)
    var hub = hubOf(auth)
    for (_ <- 2 to rounds) {
      auth = authOf(hub)
      hub = hubOf(auth)
    }
    auth.select(lit("authority").as("side"), col("__r").as("node_id"),
        col("__a").cast(org.apache.spark.sql.types.LongType).as("score"))
      .unionByName(hub.select(lit("hub").as("side"),
        col("__l").as("node_id"),
        col("__h").cast(org.apache.spark.sql.types.LongType).as("score")))
  }

  /** Eigenvector centrality on the SYMMETRIC graph — fixed-round
    * unnormalized power iteration from x₀ ≡ 1 (Bonacich 1972, public;
    * the [[bipartiteHits]] discipline applied to a one-sided graph,
    * where hub ≡ authority and the recurrence collapses to
    * xₜ(v) = Σ_{(u,v)∈E} xₜ₋₁(u)). The ranking PageRank's teleport
    * deliberately dampens: xₜ(v) counts the WALKS of length t ending
    * at v exactly, so a vertex inside a dense clique outranks an
    * equal-degree vertex whose neighbors are leaves — "important
    * because my neighbors are important", undamped. Round 1 is the
    * degree (the uniform-start anchor the spec pins); the default 2
    * rounds is MEASURED, not asserted — GraphSpec's honesty eval on
    * the sf0.01 co-purchase graph pins rounds=2 agreeing with
    * rounds=3/4 at 18-19/20 of the top-20 (≈ as well as 3 agrees
    * with 4), with walk counts growing ×~5.3/round and ~21 rounds of
    * headroom before the BIGINT emit guard.
    *
    * Determinism/exactness: NO per-round normalization (a positive
    * global scale cannot reorder scores), so every score is an exact
    * integer — walk counts — accumulated in DECIMAL(38,0) (score mass
    * multiplies by ~avg-degree per round; long products are the
    * w1Drift overflow lesson) and emitted as BIGINT behind a loud
    * `assert_true` boundary guard (the [[weightedAssortativity]]
    * emit-narrow pattern: decimal128 output is the one wire type the
    * driver's hash canonicalization disagreed on).
    *
    * Scale shape: each round is ONE equi-join of the edge list
    * against the ≤V-row score frame + ONE partial-agg groupBy —
    * O(E·rounds), no windows, no driver state; `rounds` small and
    * fixed keeps the whole chain one lazy plan (the bipartiteHits
    * contract).
    *
    * Returns one row per vertex: (id, score). */
  def eigenvectorCentrality(pairs: DataFrame, aCol: String,
      bCol: String, rounds: Int = 2): DataFrame = {
    require(rounds >= 1, "eigenvectorCentrality needs at least one round")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val ed = symmetricEdges(pairs, aCol, bCol)
    var x = ed.select(col("__u")).distinct()
      .select(col("__u"), lit(1).cast(dec).as("__x"))
    for (_ <- 1 to rounds)
      x = ed.join(x, "__u")
        .groupBy(col("__v").as("__u"))
        .agg(sum(col("__x")).cast(dec).as("__x"))
    x.filter(assert_true(
        col("__x") <= lit(Long.MaxValue).cast(dec),
        concat(lit("eigenvectorCentrality: walk count "), col("__x"),
          lit(" exceeds BIGINT — lower `rounds` or emit the decimal")))
        .isNull)
      .select(col("__u").as("id"),
        col("__x").cast(org.apache.spark.sql.types.LongType).as("score"))
  }

  /** Bounded-horizon sampled BETWEENNESS mass — exact integer
    * pair-dependency counting over a deterministic seed panel
    * (Brandes' source-sampling idea, JMS 2001 §4 / the
    * bounded-distance variant of Brandes–Pich '07, public papers),
    * formulated to stay RATIONAL-FREE: the classic accumulation
    * δ(v) = Σ σ(s,v)/σ(s,w)(1+δ) divides path counts — no
    * cross-engine bit contract — so this reports the UNNORMALIZED
    * pair-path mass instead:
    *   B(v) = Σ_{s<t ∈ panel, v ∉ {s,t}}
    *          [d(s,v) + d(t,v) = d(s,t)] · σ(s,v)·σ(t,v)
    * — the number of (pair, shortest-path) incidences through v,
    * horizon-capped at `maxHops`. Every quantity is an exact integer
    * (σ counts shortest paths; a length-d(s,v) walk cannot revisit a
    * vertex, so walks at minimal length ARE the simple shortest
    * paths), which is what lets the DuckDB oracle re-derive the mass
    * bit-for-bit where normalized betweenness never could.
    *
    * Scale shape: the σ-BFS is the [[bfsHops]] loop with ONE extra
    * aggregate — each round one edge equi-join against the (seed,
    * vertex)-keyed frontier, a partial-agg σ-sum per new vertex, an
    * anti-join vs settled, localCheckpoint + freeing; total O(|panel|
    * ·E·h) like [[seedCloseness]]. The pair assembly self-joins the
    * settled frame on the MIDDLE vertex — Σ_v reach(v)² rows, the
    * price of pair-level betweenness, bounded by |panel|²·V and
    * independent of E; the panel (a fixed deterministic sample, the
    * ANF/closeness discipline) is the knob that holds it flat as the
    * graph grows. σ sums stay in longs (σ ≤ maxdeg^h — document the
    * horizon before raising it); the pair products and the final mass
    * accumulate in DECIMAL(38,0) and emit as long.
    *
    * Panel honesty (GraphSpec's measured eval at sf0.01): the mass
    * exists only over panel pairs, so support and ranking are
    * PANEL-RELATIVE — the registered mod-50 panel's top-20 overlaps
    * a 5×-denser panel's by 6/20 while denser panels agree with each
    * other ~3× better (19/50). Compare betweenness across corpora
    * only under one fixed panel; densify the mod (the absolute cap,
    * not the mod, is the scale guard) when absolute hub identity
    * matters.
    *
    * Returns one row per interior vertex with nonzero mass:
    * (id, pair_paths). */
  def sampledBetweenness(pairs: DataFrame, aCol: String, bCol: String,
      seedFilter: Column => Column, maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val edges = symmetricEdges(pairs, aCol, bCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var settled = edges.select(col("__u").as("id")).distinct()
        .filter(seedFilter(col("id")))
        .select(col("id").as("s"), col("id").as("v"),
          lit(0L).as("d"), lit(1L).as("sigma"))
        .localCheckpoint(true)
      var frontier = settled
      var lastRound: Seq[DataFrame] = Seq(settled)
      var h = 1
      var exhausted = false
      while (h <= maxHops && !exhausted) {
        // σ of a layer-h vertex = Σ σ over its layer-(h−1) neighbors
        val grown = edges.join(frontier, edges("__u") === frontier("v"))
          .groupBy(col("s"), col("__v"))
          .agg(sum(col("sigma")).as("sigma"))
          .select(col("s"), col("__v").as("v"),
            lit(h.toLong).as("d"), col("sigma"))
          .join(settled.select("s", "v"), Seq("s", "v"), "left_anti")
          .localCheckpoint(true)
        val allNow = settled.unionByName(grown).localCheckpoint(true)
        lastRound.foreach(Caching.freeLocalCheckpoint)
        lastRound = Seq(grown, allNow)
        settled = allNow
        frontier = grown
        exhausted = grown.isEmpty
        h += 1
      }
      Caching.freeLocalCheckpoint(lastRound.head)
      // pair distances: reached vertices that are themselves seeds
      val st = settled
        .join(settled.filter(col("d") === 0L).select(col("v")).distinct(),
          Seq("v"), "left_semi")
        .select(col("s"), col("v").as("t"), col("d").as("dst"))
        .filter(col("s") < col("t"))
      val x = settled.select(col("s"), col("v"),
        col("d").as("d1"), col("sigma").cast(dec).as("sg1"))
      val y = settled.select(col("s").as("t"), col("v"),
        col("d").as("d2"), col("sigma").cast(dec).as("sg2"))
      x.join(y, Seq("v"))
        .filter(col("s") < col("t"))
        .join(st, Seq("s", "t"))
        .filter(col("d1") + col("d2") === col("dst") &&
          col("v") =!= col("s") && col("v") =!= col("t"))
        .groupBy(col("v"))
        .agg(sum(col("sg1") * col("sg2")).cast(dec).as("__mass"))
        .select(col("v").as("id"),
          col("__mass").cast(org.apache.spark.sql.types.LongType)
            .as("pair_paths"))
    } finally edges.unpersist()
  }

  /** Approximate neighborhood function (ANF) with an exact audit —
    * the HyperBall algorithm (Boldi–Rosa–Vigna, WWW 2011; ANF:
    * Palmer–Gibbons–Faloutsos, KDD 2002): N(h) = how many
    * (source, vertex) pairs lie within distance h, the curve whose
    * 90% crossing is the graph's EFFECTIVE DIAMETER — the
    * "how far apart is everything" statistic that full all-pairs BFS
    * cannot answer at 100 TB. Each vertex carries one HLL sketch of
    * its distance-≤h ball; one round unions every vertex's sketch
    * into its neighbors' (register-max merges — order-free, the
    * ev_window_uniques contract), so after h rounds sketch(u)
    * estimates |ball(u, h)| and Σ estimates over the sampled source
    * set estimates N(h). Sketch state is KB per vertex; a round is
    * ONE edge join + ONE vertex-keyed union-agg — O(E·h) total work,
    * no frontier blow-up, which is exactly why HyperBall (not BFS)
    * is the published algorithm for web-scale distance profiles.
    *
    * Two modes, split so production never pays for the audit:
    *
    *  - `audit = false` — the PRODUCTION path: the sketch loop alone,
    *    run to `maxHops` (rows for the full hop grid — a saturated
    *    ball just stops growing, so the curve goes flat). Output
    *    `(hops, approx_pairs, at_eff_90)`; nothing quadratic-ish in
    *    ball mass runs, total work is O(E·h).
    *  - `audit = true` — the honesty apparatus: `exact_pairs` is
    *    computed by a REAL (source, vertex)-keyed BFS (the
    *    [[seedCloseness]] frontier machinery) and `within_bound` pins
    *    the sketch total against it — |approx − exact| ≤
    *    max(4·RSE·exact, 32 abs) with RSE = 1.04/√2^lgK, the HLL
    *    standard error at the chosen register budget (≈ 4.6% at the
    *    default lgK=13; a fixed tolerance would silently become ~2σ
    *    and trip on legitimate sketch deviation). The BFS twin is
    *    quadratic-ish in the ball mass and priced accordingly — it
    *    lives in the spec suite, not in the registered query. Output
    *    `(hops, exact_pairs, within_bound, at_eff_90)`, rows up to
    *    the BFS-observed horizon (capping the sketch loop too).
    *
    * Sources are a deterministic sample (`sourceFilter`) so the
    * audit's settled frame — and the DuckDB oracle's recursion — stay
    * tractable; sketch propagation necessarily runs over ALL vertices
    * regardless (a sampled source's ball grows through unsampled
    * neighbors). `at_eff_90` marks hops whose cumulative pair count
    * reaches 90% of the horizon total (10·N(h) ≥ 9·N(maxHops); exact
    * integers in audit mode, the sketch curve in production) — the
    * first true row IS the effective diameter estimate.
    *
    * Scale shape: per round, the sketch frame shuffles once on
    * vertex id (2^lgK/2 ≈ 4 KB per vertex at the default lgK=13 —
    * the knob that trades register budget against shuffle bytes);
    * per-round totals are 1-row aggregates checkpointed eagerly so
    * previous rounds' blocks free immediately. The audit BFS reuses
    * the bounded (source, vertex) frontier loop with per-round
    * localCheckpoint + block freeing. */
  def anf(pairs: DataFrame, aCol: String, bCol: String,
      sourceFilter: Column => Column, maxHops: Int,
      lgK: Int = 13, audit: Boolean = true): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val edges = symmetricEdges(pairs, aCol, bCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // the one count also materializes the persisted edge list; it
      // sizes the union-round shuffle so each task's sketch-merge
      // buffer stays ~128 MB however dense the graph (an HLL_8 sketch
      // is 2^lgK bytes; the contribution frame is one sketch per
      // DIRECTED edge — the round's real mass, which the default
      // 32-partition grid overflows on a dense graph)
      val eCnt = edges.count()
      // partition count derived from the round's REAL mass (one sketch
      // per directed edge at 2^lgK bytes, targeting ~128 MB per task) —
      // adaptive in both directions (r21, VERDICT r20 #6): the former
      // fixed floor of 32 over-partitioned small graphs into 32
      // near-empty tasks per round (sf0.1 scaling ratio 0.93 — pure
      // scheduling overhead), while the 2048 cap stays as the
      // scale-safety bound; a cluster-sized graph still derives
      // thousands of partitions from its own byte mass
      val unionParts = math.min(2048L,
        math.max(1L, eCnt * (1L << lgK) / (128L << 20))).toInt
      // ---- exact audit FIRST (the shared multiSourceBfs loop): its
      // observed horizon caps the sketch loop — rounds past the last
      // reachable hop would pay the function's most expensive joins
      // only to be dropped by the final hop-grid join. Production
      // (audit = false) has no BFS to learn the horizon from and runs
      // the full grid — a saturated round is one more O(E) join whose
      // merge is a no-op, not a correctness risk ----
      val dist: Option[DataFrame] =
        if (audit) Some(multiSourceBfs(edges, sourceFilter, maxHops))
        else None
      val horizon = dist match {
        case None => maxHops
        case Some(d) =>
          val horizonRow = d.agg(max(col("hops"))).head
          // an empty panel (no sourceFilter vertex) has no horizon
          if (horizonRow.isNullAt(0)) 0 else horizonRow.getLong(0).toInt
      }
      // ---- sketch path (HyperBall — the 100 TB path) ----
      val spark = pairs.sparkSession
      // (the groupBy subsumes the former distinct() — inserting the
      // same id twice leaves HLL registers, and so the serialized
      // sketch, unchanged; one aggregation instead of two)
      var sk = edges.select(col("__u").as("id"))
        .groupBy("id").agg(expr(s"hll_sketch_agg(id, $lgK)").as("__bs"))
        .localCheckpoint(true)
      // per-round panel totals are 1-row aggregates — collected to the
      // driver (bounded by construction) and re-emitted as literal
      // rows, instead of the former per-round 1-row localCheckpoint
      // (one fewer job per round, and the final union plans over
      // ≤ maxHops+1 literal rows)
      def totalOf(skDf: DataFrame): java.lang.Long = {
        val r = skDf.filter(sourceFilter(col("id")))
          .agg(sum(expr("hll_sketch_estimate(__bs)"))).head
        if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
      }
      def totalRow(h: Int, v: java.lang.Long): DataFrame =
        // one explicit partition: a bare range(1) fabricates
        // defaultParallelism partitions PER LITERAL ROW, and the final
        // hop-grid union then ran 32 × (maxHops+1) near-empty tasks
        // (measured: a 256-task job materializing 8 rows)
        spark.range(0, 1, 1, 1).select(lit(h.toLong).as("hops"),
          (if (v == null) lit(null).cast("long") else lit(v.longValue))
            .as("approx_pairs"))
      val totals = scala.collection.mutable.ArrayBuffer(
        0 -> totalOf(sk))
      var h = 1
      var stable = false
      while (h <= horizon && !stable) {
        // r20 round fusion (guide §1.4/§2.3): the union tags the self
        // row, so ONE aggregation yields both the merged sketch AND
        // the pre-round sketch (__prev — exactly one __self row exists
        // per vertex), and ONE 1-row scan of the checkpointed result
        // reads this round's panel total AND the exact fixpoint probe.
        // The former shape paid a separate roundTotal job plus an
        // O(V)-sketch-bytes probe self-join (two more shuffles of ~4 KB
        // HLL rows per vertex) every round.
        val merged = sk
          .select(col("id"), col("__bs"), lit(true).as("__self"))
          .unionByName(edges.join(sk, edges("__v") === sk("id"))
            .select(edges("__u").as("id"), col("__bs"),
              lit(false).as("__self")))
          // clustered by id BEFORE the agg: the aggregate then runs
          // in place on unionParts partitions (HashPartitioning(id)
          // satisfies its clustering), so no task ever buffers more
          // than its own id slice of sketches
          .repartition(unionParts, col("id"))
          .groupBy("id").agg(expr("hll_union_agg(__bs)").as("__bs"),
            max(when(col("__self"), col("__bs"))).as("__prev"))
          // the probe needs only WHETHER the sketch changed, so the
          // pre-round sketch collapses to one boolean before the
          // checkpoint (r21, ADVICE r20): the stored round is one
          // sketch + one flag per vertex instead of two full sketches
          // — same exact serialized-bytes comparison, evaluated here
          .select(col("id"), col("__bs"),
            (col("__bs") =!= col("__prev")).as("__chg"))
          .localCheckpoint(true)
        // EXACT fixpoint probe, now a column of the same 1-row scan
        // (production mode only — the audit mode's BFS horizon already
        // caps the loop): the register-max union is monotone and
        // idempotent, so ONE no-op round means every later round is a
        // no-op too — remaining grid rows are this round's total
        // verbatim, and the saturated graph stops paying O(E) sketch
        // joins. A changed serialization with unchanged registers
        // cannot occur (the encoding is a function of the state); a
        // spurious difference merely skips the stop — never wrong,
        // only slower.
        val statsRow = merged.agg(
          sum(when(sourceFilter(col("id")),
            expr("hll_sketch_estimate(__bs)"))).as("__t"),
          count(when(col("__chg"), lit(1))).as("__chg"))
          .head
        val total: java.lang.Long =
          if (statsRow.isNullAt(0)) null
          else java.lang.Long.valueOf(statsRow.getLong(0))
        val changed = if (dist.nonEmpty) 1L else statsRow.getLong(1)
        Caching.freeLocalCheckpoint(sk)
        sk = merged
        totals += (h -> total)
        if (changed == 0L) {
          stable = true
          for (hh <- h + 1 to horizon) totals += (hh -> total)
        }
        h += 1
      }
      Caching.freeLocalCheckpoint(sk)
      val approx = totals.map { case (hh, v) => totalRow(hh, v) }
        .reduce(_.union(_))
      // hop-grid frames from here on: ≤ maxHops+1 rows by construction,
      // so the unpartitioned windows are bounded
      val wCum = Window.orderBy("hops")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      dist match {
        case None =>
          approx
            .withColumn("__tot", max(col("approx_pairs")).over(wAll))
            .select(col("hops"), col("approx_pairs"),
              (col("approx_pairs") * 10 >= col("__tot") * 9).as("at_eff_90"))
            .orderBy("hops")
        case Some(d) =>
          // 4σ of the HLL relative standard error at this register
          // budget (1.04/√2^lgK — Flajolet et al. 2007), floored at
          // 32 abs for the tiny-count regime where RSE % vanishes
          val tol = 4.0 * 1.04 / math.sqrt((1L << lgK).toDouble)
          d.groupBy("hops").agg(count(lit(1)).as("__c"))
            .select(col("hops"), sum(col("__c")).over(wCum).as("exact_pairs"))
            .withColumn("__tot", max(col("exact_pairs")).over(wAll))
            .join(approx, Seq("hops"))
            .select(col("hops"), col("exact_pairs"),
              (abs(col("approx_pairs") - col("exact_pairs")) <=
                greatest(lit(32.0), lit(tol) * col("exact_pairs")))
                .as("within_bound"),
              (col("exact_pairs") * 10 >= col("__tot") * 9).as("at_eff_90"))
            .orderBy("hops")
      }
    } finally edges.unpersist()
  }
}
