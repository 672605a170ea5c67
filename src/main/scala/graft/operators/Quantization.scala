package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps.{asDouble, cosine}

/** Scalar quantization (SQ8, the Faiss `IndexScalarQuantizer` scheme)
  * for embedding columns: each dimension is linearly mapped to an 8-bit
  * code between its corpus-wide min and max. The standing ANN index
  * then stores `dim` BYTES per vector instead of `4·dim` float bytes —
  * at 100 TB of raw embeddings the code table is ~25 TB, and because
  * search decodes candidates on the fly the float vectors never need
  * to be resident at all. Search quality: reconstruction error per
  * dimension is bounded by half a quantization step ((max−min)/512),
  * so top-k against decoded vectors tracks exact top-k closely on any
  * corpus whose per-dimension ranges aren't dominated by outliers
  * (see `graft.Recall` for the measured number on the test corpus).
  *
  * Everything is deterministic, closed-form arithmetic — min/max stats,
  * an affine map, `floor` — so unlike the k-means-backed IVF this
  * entire operator (fit + encode + decode + search) re-derives exactly
  * in the DuckDB oracle: the `ann_sq_topk` hash match covers the whole
  * quantization pipeline, not just the final ranking.
  *
  * Scale shape: the fit is ONE map-side-partial aggregation over the
  * corpus (2·dim scalar aggregates, no shuffle beyond the final
  * single-row reduce); encode/decode are map-only codegen'd expressions
  * (`zip_with` over literal min/scale arrays — 2·dim doubles, shipped
  * once per task, never per row); search reuses the broadcast-probes +
  * map-side-partial-top-k shape of [[Similarity.bruteForceTopKAgg]].
  * Compose with IVF cells for sublinear candidate generation — SQ
  * compresses the payload, IVF prunes the candidates; the two knobs
  * are independent.
  *
  * The reference engine has no vector type (integers only,
  * /root/reference/sqlengine.py); LLM-pipeline extension surface. */
object Quantization {

  /** Per-dimension (min, max) over the corpus — one pass, map-side
    * partials, a single 2·dim-column row to the driver.
    *
    * Plan-width note: this builds 2·dim aggregate expressions (128 at
    * the testdata's dim=64 — fine). At dims in the THOUSANDS the plan
    * itself becomes the cost (codegen size, analyzer time); switch to a
    * single array-valued aggregate there — `zip_with`-based
    * element-wise min/max folded via `reduce` over the vector column,
    * one expression regardless of dim — before raising `dim`. */
  def fitMinMax(corpus: DataFrame, vecCol: String, dim: Int): (Array[Double], Array[Double]) = {
    val v = asDouble(col(vecCol))
    val aggs = (1 to dim).flatMap(j => Seq(
      min(element_at(v, j)).as(s"mn$j"), max(element_at(v, j)).as(s"mx$j")))
    val row = corpus.agg(aggs.head, aggs.tail: _*).collect()(0)
    (Array.tabulate(dim)(j => row.getDouble(2 * j)),
     Array.tabulate(dim)(j => row.getDouble(2 * j + 1)))
  }

  /** SQ8 encode: `floor((x − min) / (max − min) · 255)` clamped into
    * [0, 255]; a constant dimension codes to 0. Map-only, codegen'd. */
  def sqEncode(vec: Column, mins: Array[Double], maxs: Array[Double]): Column = {
    val mn = array(mins.map(lit): _*)
    val mx = array(maxs.map(lit): _*)
    zip_with(vec, sequence(lit(1), lit(mins.length)), (x, j) => {
      val lo = element_at(mn, j)
      val hi = element_at(mx, j)
      when(hi === lo, lit(0)).otherwise(
        least(lit(255.0), greatest(lit(0.0),
          floor((x - lo) / (hi - lo) * lit(255.0)))).cast("int"))
    })
  }

  /** Decode to the cell midpoint: `min + (code + 0.5) · step`. A
    * constant dimension decodes back to exactly `min` (step 0). */
  def sqDecode(codes: Column, mins: Array[Double], maxs: Array[Double]): Column = {
    val mn = array(mins.map(lit): _*)
    val mx = array(maxs.map(lit): _*)
    zip_with(codes, sequence(lit(1), lit(mins.length)), (c, j) => {
      val lo = element_at(mn, j)
      val hi = element_at(mx, j)
      lo + (c.cast("double") + lit(0.5)) * ((hi - lo) / lit(255.0))
    })
  }

  /** Top-k cosine search against the QUANTIZED corpus: fit, encode,
    * decode-on-the-fly, exact cosine of decoded candidate vs raw probe,
    * map-side-partial top-k. Output (probe_id, neighbor_id, qcos, rank)
    * — `qcos` is the quantized-space cosine, which is what a standing
    * SQ index can compute without the raw vectors. */
  def sqTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int = 64): DataFrame = {
    import graft.functions.TopKAggregate.topK
    val (mins, maxs) = fitMinMax(corpus, vecCol, dim)
    // the codes frame IS the standing index (dim bytes/vector); decode
    // happens per candidate row, map-side, from the literal min/step
    val c = corpus.select(col(idCol).as("neighbor_id"),
      sqEncode(asDouble(col(vecCol)), mins, maxs).as("codes"))
      .select(col("neighbor_id"), sqDecode(col("codes"), mins, maxs).as("cv"))
    val p = probes.select(col(idCol).as("probe_id"), asDouble(col(vecCol)).as("pv"))
    c.crossJoin(broadcast(p))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("qcos", cosine(col("pv"), col("cv")))
      .groupBy(col("probe_id"))
      .agg(topK(col("qcos"), col("neighbor_id"), col("neighbor_id"), k).as("top"))
      .select(col("probe_id"), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("probe_id"), col("entry.payload").as("neighbor_id"),
        col("entry.score").as("qcos"), (col("pos") + 1).as("rank"))
  }

  // =====================================================================
  // Product quantization (PQ) with asymmetric-distance search
  // =====================================================================

  /** Per-subspace k-means codebooks (Jégou, Douze & Schmid, "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011 — the Faiss
    * `IndexPQ` scheme): the vector is split into `m` equal slices and
    * each slice is quantized independently against its own `nlist`-entry
    * codebook, fitted with the SAME deterministic Lloyd trainer the IVF
    * index uses ([[Similarity.fitCentroids]]) on the same hash-ordered
    * bounded driver sample. Returns `books(s)(cell)(j)`. */
  def fitPqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, nlist: Int,
      trainSample: Int = 4096): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim=$dim must split into m=$m equal subspaces")
    val sub = dim / m
    val train = corpus.select(asDouble(col(vecCol)), col(idCol))
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(trainSample)
      .collect().map(_.getSeq[Double](0).toArray)
    Array.tabulate(m)(s =>
      Similarity.fitCentroids(train.map(_.slice(s * sub, (s + 1) * sub)), nlist))
  }

  /** Top-k cosine search against the PQ-compressed corpus via
    * asymmetric distance computation (ADC): the corpus is stored as `m`
    * SMALL-INT codes per vector (log2(nlist) bits each — at nlist=256,
    * m bytes/vector, a 256× compression of a 64-dim float corpus);
    * each candidate's dot product against the probe is reconstructed as
    * the sum of per-subspace probe-slice·centroid dots, and its norm
    * from the codebook entries' norms — the probe side stays exact
    * (that is the "asymmetric" in ADC, the paper's higher-accuracy
    * variant). Output (probe_id, neighbor_id, qcos, rank) — `qcos` is
    * the PQ-space cosine a standing code index can compute without ever
    * touching the raw corpus vectors.
    *
    * Scale shape at 100 TB: codebooks are fitted on a bounded
    * driver-side sample (Faiss protocol, like IVF) and shipped as
    * literals (m·nlist·sub doubles — KBs); encoding is a map-only
    * codegen'd argmin per subspace; search is the broadcast-probes +
    * map-side-partial-top-k shape of [[sqTopK]], but each candidate row
    * carries only its m codes — the shuffle and the standing index are
    * both ~m bytes/vector instead of 4·dim. Compose with IVF cells for
    * sublinear candidate generation (IVF prunes, PQ compresses —
    * independent knobs, exactly the Faiss `IVFPQ` layout). */
  /** When `shortlist > k`, ADC only generates a per-probe candidate
    * shortlist and the final top-k is re-ranked by EXACT cosine over
    * the raw vectors of those candidates alone — the standard
    * PQ-shortlist + re-rank serving layout (Jégou et al. §V.A): the
    * full corpus is scanned as codes, the float vectors are fetched
    * for `shortlist` rows per probe only, and recall recovers what the
    * coarse codes lose. `shortlist <= k` disables re-ranking (pure
    * ADC; `qcos` column is the ADC score instead of the cosine). */
  def pqTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int = 64, m: Int = 4, nlist: Int = 16,
      trainSample: Int = 4096, shortlist: Int = 0): DataFrame = {
    import graft.functions.TopKAggregate.topK
    val sub = dim / m
    val books = fitPqCodebooks(corpus, idCol, vecCol, dim, m, nlist, trainSample)
    // ‖centroid‖² per codebook entry, summed in ascending-j order (the
    // oracle's list_sum matches this fold exactly)
    val norms = books.map(_.map(c => c.map(x => x * x).sum))

    // the codes frame IS the standing index: m small ints per vector
    val enc = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .select(col("neighbor_id"), pqCodes(books, norms, sub, col("cv")).as("codes"))
    val p = probes.select(col(idCol).as("probe_id"), asDouble(col(vecCol)).as("pv"))

    val adcK = math.max(k, shortlist)
    val adc = enc.crossJoin(broadcast(p))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("qcos", pqAdcCos(books, norms, sub, col("pv"), col("codes")))
      .groupBy(col("probe_id"))
      .agg(topK(col("qcos"), col("neighbor_id"), col("neighbor_id"), adcK).as("top"))
      .select(col("probe_id"), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("probe_id"), col("entry.payload").as("neighbor_id"),
        col("entry.score").as("qcos"), (col("pos") + 1).as("rank"))
    if (shortlist <= k) adc
    else exactRerank(corpus, idCol, vecCol, adc, p, k)
  }

  /** The m-entry PQ code array of vector `v`: per-subspace
    * argmin_{cell} (‖v_s‖² − 2·v_s·c) + ‖c‖², 1-based, ties to the
    * first minimal cell — identical expression tree to the oracle's
    * ranked re-derivation. Factored verbatim out of [[pqTopK]] so
    * [[ivfPqTopK]]'s encode cannot drift from the pinned one. */
  private def pqCodes(books: Array[Array[Array[Double]]],
      norms: Array[Array[Double]], sub: Int, v: Column): Column = {
    import graft.functions.VectorOps.dotNative
    array(books.indices.map { s =>
      val vs = slice(v, s * sub + 1, sub)
      val d = array(books(s).zipWithIndex.map { case (c, i) =>
        val cLit = array(c.map(lit): _*)
        (dotNative(vs, vs) - lit(2.0) * dotNative(vs, cLit)) + lit(norms(s)(i))
      }: _*)
      array_position(d, array_min(d)).cast("int")
    }: _*)
  }

  /** ADC cosine of exact probe `pv` vs code array `codes`:
    * Σ_s pv_s · centroid_s(code_s) / (‖pv‖ · sqrt(Σ_s ‖centroid_s(code_s)‖²))
    * — the probe side stays exact (the "asymmetric" in ADC). Codebooks
    * ship as literals; factored verbatim out of [[pqTopK]]. */
  private def pqAdcCos(books: Array[Array[Array[Double]]],
      norms: Array[Array[Double]], sub: Int, pv: Column,
      codes: Column): Column = {
    import graft.functions.VectorOps.dotNative
    val adot = books.indices.map { s =>
      val bookLit = array(books(s).map(c => array(c.map(lit): _*)): _*)
      dotNative(slice(pv, s * sub + 1, sub),
        element_at(bookLit, element_at(codes, s + 1)))
    }.reduce(_ + _)
    val cnorm = books.indices.map { s =>
      val nLit = array(norms(s).map(lit): _*)
      element_at(nLit, element_at(codes, s + 1))
    }.reduce(_ + _)
    adot / (sqrt(dotNative(pv, pv)) * sqrt(cnorm))
  }

  /** Exact-cosine re-rank of a per-probe shortlist: raw vectors are
    * fetched for shortlist×probes rows only — a semi-join-sized fetch,
    * never a second corpus-wide float scan. Factored verbatim out of
    * [[pqTopK]]; shared with [[ivfPqTopK]]. */
  private def exactRerank(corpus: DataFrame, idCol: String, vecCol: String,
      shortPairs: DataFrame, p: DataFrame, k: Int): DataFrame = {
    import graft.functions.TopKAggregate.topK
    val raw = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    shortPairs.select("probe_id", "neighbor_id")
      .join(raw, Seq("neighbor_id"))
      .join(broadcast(p), Seq("probe_id"))
      .withColumn("cosine", cosine(col("pv"), col("cv")))
      .groupBy(col("probe_id"))
      .agg(topK(col("cosine"), col("neighbor_id"), col("neighbor_id"), k).as("top"))
      .select(col("probe_id"), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("probe_id"), col("entry.payload").as("neighbor_id"),
        col("entry.score").as("cosine"), (col("pos") + 1).as("rank"))
  }

  /** IVF × PQ — the Faiss `IndexIVFPQ` serving layout both component
    * scaladocs point at ([[pqTopK]]: "compose with IVF cells for
    * sublinear candidate generation"; [[Similarity.ivfTopK]]'s cell
    * join): the coarse IVF quantizer prunes CANDIDATES — each probe
    * searches only its `nProbe` nearest of `ivfNlist` cells — while PQ
    * compresses the PAYLOAD — candidates are scored by ADC over their
    * `m` small-int codes, never their float vectors — and the final
    * top-k re-ranks the per-probe ADC shortlist by exact cosine over
    * the shortlist rows' raw vectors alone. The two knobs stay
    * independent exactly as the component operators document: recall
    * lost to cell pruning is tuned by `nProbe`/`ivfNlist`, recall lost
    * to code coarseness by `m`/`nlist`/`shortlist`.
    *
    * Both quantizers train on the SAME hash-ordered bounded driver
    * sample their standalone operators use ([[Similarity
    * .trainedCentroids]], [[fitPqCodebooks]] — the Faiss protocol:
    * train on a sample, hold fixed), so cell assignment is bit-equal
    * to the plain IVF index's and codes are bit-equal to the plain PQ
    * index's — the composed oracle reuses both pinned re-derivations
    * unchanged.
    *
    * Scale shape at 100 TB: the standing index row is (cell, m codes)
    * — ~m+1 small ints per vector, the only thing the ADC scan ever
    * shuffles or stores (a 64-dim float corpus compresses ~30×);
    * candidate generation is the IVF equi-join on cell id (candidates
    * ∝ nProbe·N/ivfNlist per probe, never N); ADC runs map-side
    * against literal codebooks; the exact re-rank fetches raw floats
    * for shortlist×probes rows only. Grow `ivfNlist` ∝ N to hold cell
    * size constant — the same dial as [[Similarity.ivfTopK]].
    *
    * Output (probe_id, neighbor_id, cosine, rank) when re-ranking
    * (`shortlist > k`, the serving default), else the raw ADC ranking
    * with its `qcos` score. */
  def ivfPqTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int = 64, m: Int = 4, nlist: Int = 16,
      ivfNlist: Int = 16, nProbe: Int = 4, trainSample: Int = 4096,
      shortlist: Int = 0): DataFrame = {
    import graft.functions.TopKAggregate.topK
    require(dim % m == 0, s"dim=$dim must split into m=$m equal subspaces")
    val sub = dim / m
    val centroids = Similarity.trainedCentroids(corpus, idCol, vecCol,
      ivfNlist, trainSample)
    val books = fitPqCodebooks(corpus, idCol, vecCol, dim, m, nlist, trainSample)
    val norms = books.map(_.map(c => c.map(x => x * x).sum))
    // the standing index: coarse cell + m PQ codes per vector — the
    // raw floats drop out right after encode
    val idx = Similarity.ivfAssign(corpus, idCol, vecCol, centroids)
      .select(col("neighbor_id"), col("cell"),
        pqCodes(books, norms, sub, col("cv")).as("codes"))
    val pc = Similarity.probeCells(probes, idCol, vecCol, centroids, nProbe)
    val adcK = math.max(k, shortlist)
    // every (probe, candidate) pair meets at most once: the corpus
    // side files under exactly ONE cell (rn=1 argmin), so no distinct
    // is needed after the cell join
    val adc = idx.join(pc, Seq("cell"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("qcos", pqAdcCos(books, norms, sub, col("pv"), col("codes")))
      .groupBy(col("probe_id"))
      .agg(topK(col("qcos"), col("neighbor_id"), col("neighbor_id"), adcK).as("top"))
      .select(col("probe_id"), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(col("probe_id"), col("entry.payload").as("neighbor_id"),
        col("entry.score").as("qcos"), (col("pos") + 1).as("rank"))
    if (shortlist <= k) adc
    else exactRerank(corpus, idCol, vecCol,
      adc, probes.select(col(idCol).as("probe_id"),
        asDouble(col(vecCol)).as("pv")), k)
  }
}
