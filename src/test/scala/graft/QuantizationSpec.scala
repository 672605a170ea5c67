package graft

import org.apache.spark.sql.functions._

import graft.operators.{Quantization, Similarity}

/** SQ8 scalar quantization: round-trip error bound, the constant-
  * dimension edge, code range, and search quality vs exact top-k. */
class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("codes are in [0,255] and decode within half a step of the input") {
    val dim = 64
    val (mins, maxs) = Quantization.fitMinMax(emb, "embedding", dim)
    val v = graft.functions.VectorOps.asDouble(col("embedding"))
    val enc = Quantization.sqEncode(v, mins, maxs)
    val dec = Quantization.sqDecode(enc, mins, maxs)
    // worst per-dim reconstruction error is half a quantization step
    val steps = mins.indices.map(j => (maxs(j) - mins(j)) / 255.0)
    val rows = emb.select(
      aggregate(enc, lit(0), (a, c) => greatest(a, c)).as("maxCode"),
      aggregate(enc, lit(255), (a, c) => least(a, c)).as("minCode"),
      aggregate(zip_with(v, dec, (x, d) => abs(x - d)), lit(0.0),
        (a, e) => greatest(a, e)).as("maxErr"))
      .agg(max("maxCode"), min("minCode"), max("maxErr"))
      .as[(Int, Int, Double)].collect()(0)
    assert(rows._1 <= 255 && rows._2 >= 0)
    assert(rows._3 <= steps.max / 2 + 1e-12,
      s"max reconstruction error ${rows._3} exceeds half-step ${steps.max / 2}")
  }

  test("a constant dimension codes to 0 and decodes back exactly") {
    val df = Seq((1L, Seq(7.0f, 1.0f)), (2L, Seq(7.0f, 3.0f))).toDF("id", "v")
    val (mins, maxs) = Quantization.fitMinMax(df, "v", 2)
    assert(mins(0) == 7.0 && maxs(0) == 7.0)
    val dec = df.select(Quantization.sqDecode(
      Quantization.sqEncode(graft.functions.VectorOps.asDouble(col("v")),
        mins, maxs), mins, maxs).as("d"))
      .select(element_at(col("d"), 1)).as[Double].collect()
    assert(dec.forall(_ == 7.0))
  }

  test("SQ top-k tracks exact top-k closely (recall floor)") {
    val probes = emb.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(emb, probes, "vec_id", "embedding", k = 10)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val sq = Quantization.sqTopK(emb, probes, "vec_id", "embedding", k = 10)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(sq).size.toDouble / exact.size
    // 8 bits/dim over the observed range: near-lossless ranking
    assert(recall >= 0.9, s"SQ8 recall $recall unexpectedly low")
  }

  test("PQ codes index into the codebooks and search is layout-invariant") {
    val books = Quantization.fitPqCodebooks(emb, "vec_id", "embedding",
      dim = 64, m = 4, nlist = 16)
    assert(books.length == 4 && books.forall(_.length == 16) &&
      books.forall(_.forall(_.length == 16)))
    val probes = emb.filter($"vec_id" < 5)
    val base = Quantization.pqTopK(emb, probes, "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // deterministic under a different partition layout (hash-free
    // argmin encode + literal codebooks — nothing partition-seeded)
    val re = Quantization.pqTopK(emb.repartition(7), probes, "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(base == re)
  }

  test("PQ shortlist + exact re-rank tracks exact top-k (recall floor)") {
    val probes = emb.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(emb, probes, "vec_id", "embedding", k = 10)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pq = Quantization.pqTopK(emb, probes, "vec_id", "embedding", k = 10,
      m = 8, nlist = 16, shortlist = 100)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(pq).size.toDouble / exact.size
    // coarse 8×4-bit codes on a near-random synthetic corpus: the ADC
    // shortlist (100 of 500) recovers most of what the codes lose; the
    // measured per-config numbers live in Recall.scala's report
    assert(recall >= 0.7, s"PQ+rerank recall $recall unexpectedly low")
  }

  test("ivfPqTopK with every cell probed reduces bit-exactly to plain PQ") {
    // nProbe = ivfNlist turns cell pruning OFF: the candidate set is
    // the whole corpus, so ADC scores, shortlist, and exact re-rank
    // must reproduce pqTopK row-for-row (cosines included) — the
    // composition adds pruning and nothing else
    val probes = emb.filter($"vec_id" < 5)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("probe_id", "neighbor_id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val pure = rows(Quantization.pqTopK(emb, probes, "vec_id", "embedding",
      k = 10, m = 8, nlist = 16, shortlist = 100))
    val composed = rows(Quantization.ivfPqTopK(emb, probes, "vec_id",
      "embedding", k = 10, m = 8, nlist = 16, ivfNlist = 16, nProbe = 16,
      shortlist = 100))
    assert(pure == composed)
  }

  test("ivfPqTopK cell pruning keeps k rows per probe and a recall floor") {
    val probes = emb.filter($"vec_id" < 5)
    val got = Quantization.ivfPqTopK(emb, probes, "vec_id", "embedding",
      k = 10, m = 8, nlist = 16, ivfNlist = 16, nProbe = 4, shortlist = 100)
    val perProbe = got.groupBy("probe_id").count()
      .as[(Long, Long)].collect().toMap
    assert(perProbe.values.forall(_ == 10L), s"per-probe rows: $perProbe")
    val exact = Similarity.bruteForceTopK(emb, probes, "vec_id", "embedding",
      k = 10).select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val found = got.select("probe_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val recall = exact.intersect(found).size.toDouble / exact.size
    // pruning to 4 of 16 cells composes with the PQ shortlist loss; on
    // the structure-free synthetic corpus the combined recall floor is
    // deliberately loose — the measured value is an honesty signal,
    // not a tuning target
    assert(recall >= 0.4, s"IVF×PQ recall $recall unexpectedly low")
  }
}
