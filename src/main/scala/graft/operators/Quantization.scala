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
    * partials, a single 2·dim-column row to the driver. */
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
}
