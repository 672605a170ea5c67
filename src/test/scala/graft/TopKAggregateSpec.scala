package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKAggregate.topK
import graft.operators.Similarity

/** Pins the native top-k aggregate: partial/merge correctness across
  * many partitions, tie determinism, and equality with the window
  * formulation on the real embeddings table. */
class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  test("top-k equals sortBy.take(k) on random data across partitions") {
    val rnd = new scala.util.Random(3)
    val rows = Seq.tabulate(5000)(i =>
      (i % 7L, rnd.nextInt(100).toDouble, i.toLong))
    val got = rows.toDF("g", "s", "id").repartition(16)
      .groupBy("g").agg(topK(col("s"), col("id"), col("id"), 5).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("g"), col("pos"), col("e.score"), col("e.payload"))
      .as[(Long, Int, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(x => (x._3, x._4)).toList).toMap
    val want = rows.groupBy(_._1).view.mapValues(
      _.map(r => (r._2, r._3)).sortBy(x => (-x._1, x._2)).take(5).toList).toMap
    assert(got == want) // exact values AND deterministic tie order
  }

  test("groups smaller than k return all their rows") {
    val got = Seq((1L, 2.0, 10L), (1L, 1.0, 11L)).toDF("g", "s", "id")
      .groupBy("g").agg(topK(col("s"), col("id"), col("id"), 5).as("top"))
      .select(size(col("top"))).as[Int].head()
    assert(got === 2)
  }

  test("null scores are skipped") {
    val got = Seq((1L, Some(2.0), 10L), (1L, None, 11L)).toDF("g", "s", "id")
      .groupBy("g").agg(topK(col("s"), col("id"), col("id"), 5).as("top"))
      .select(size(col("top"))).as[Int].head()
    assert(got === 1)
  }

  test("string tiebreak/payload: any orderable id type works (no silent drops)") {
    // regression: the builder used to cast the tiebreak to long — for a
    // string doc id the cast yields null and every row was skipped
    val docs = Seq((1L, 0.9, "doc-b"), (1L, 0.9, "doc-a"), (1L, 0.5, "doc-c"))
      .toDF("g", "s", "doc")
    val got = docs.groupBy("g")
      .agg(topK(col("s"), col("doc"), col("doc"), 2).as("top"))
      .select(posexplode(col("top")))
      .select(col("col.payload")).as[String].collect().toList
    assert(got == List("doc-a", "doc-b")) // score ties → lexicographic id order
  }

  test("bruteForceTopKAgg equals the window-based bruteForceTopK") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = e.filter(col("vec_id") < 5)
    val viaWindow = Similarity.bruteForceTopK(e, probes, "vec_id", "embedding", k = 10)
      .select("probe_id", "neighbor_id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toList
    val viaAgg = Similarity.bruteForceTopKAgg(e, probes, "vec_id", "embedding", k = 10)
      .select("probe_id", "neighbor_id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toList
    assert(viaAgg == viaWindow)
  }
}
