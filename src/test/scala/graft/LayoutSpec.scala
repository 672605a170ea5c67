package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout: per-file min/max boxes must be tight in BOTH
  * dimensions (the property parquet skipping feeds on), and the
  * re-layout must be content-preserving. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def events =
    sources.EventsTime.load(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"user_id", $"ts_s")

  test("zValue interleaves bits (hand-checked Morton codes)") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (5L, 2L))
      .toDF("a", "b")
      .select(Layout.zValue($"a", $"b", bits = 4)).as[Long].collect().toSeq
    // morton(a,b): a bits → even positions, b bits → odd
    assert(got == Seq(0L, 1L, 2L, 15L, 0x19L)) // 5=101,2=010 → 011001
  }

  test("z-ordered files have tight min/max boxes in BOTH dimensions") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val n = 16
    Layout.zorder(events, "user_id", "ts_s", numFiles = n)
      .write.mode("overwrite").parquet(dir)

    // per-file spread of each dimension, as a fraction of global spread
    def spreads(d: String): Seq[(Double, Double)] = {
      val g = spark.read.parquet(d)
        .agg(max($"user_id") - min($"user_id"), max($"ts_s") - min($"ts_s"))
        .as[(Long, Long)].head()
      new java.io.File(d).listFiles().filter(_.getName.endsWith(".parquet")).toSeq
        .map { f =>
          val r = spark.read.parquet(f.getPath)
            .agg(max($"user_id") - min($"user_id"), max($"ts_s") - min($"ts_s"))
            .as[(Long, Long)].head()
          (r._1.toDouble / g._1, r._2.toDouble / g._2)
        }
    }
    val zs = spreads(dir)
    assert(zs.size > 4, s"expected several output files, got ${zs.size}")
    // with ~16 files over a 2-D z-curve, the AVERAGE per-file box is a
    // small fraction of the global range in BOTH dims — a 1-D sort
    // would leave one dim at ~100%
    val (avgU, avgT) = (zs.map(_._1).sum / zs.size, zs.map(_._2).sum / zs.size)
    assert(avgU < 0.6, s"user_id per-file spread too wide: $avgU")
    assert(avgT < 0.6, s"ts_s per-file spread too wide: $avgT")

    // contrast: the same file count sorted by ts only → user_id boxes ~global
    val dir1 = java.nio.file.Files.createTempDirectory("sort1d").toString
    events.repartitionByRange(n, $"ts_s").sortWithinPartitions("ts_s")
      .write.mode("overwrite").parquet(dir1)
    val ss = spreads(dir1)
    val avgU1 = ss.map(_._1).sum / ss.size
    assert(avgU1 > 0.8, s"1-D layout should leave user_id unclustered, got $avgU1")
    assert(avgU < avgU1, "z-order must cluster user_id better than a ts-only sort")
  }

  test("normalize maps NULL keys to the origin bucket, not the top corner") {
    val got = Seq(Some(0.0), Some(50.0), Some(100.0), None)
      .toDF("v")
      .select(Layout.normalize($"v", 0.0, 100.0, bits = 4)).as[Long].collect().toSeq
    // 0→0, 50→8, 100→clamped to 15; NULL→0 (least() alone would skip
    // the null and return the 15 clamp — the silent top-corner bug)
    assert(got == Seq(0L, 8L, 15L, 0L))
  }

  test("zorder is content-preserving") {
    val dir = java.nio.file.Files.createTempDirectory("zcontent").toString
    Layout.zorder(events, "user_id", "ts_s", numFiles = 8)
      .write.mode("overwrite").parquet(dir)
    val got = spark.read.parquet(dir).as[(Long, Long, Long)].collect().sorted.toSeq
    val want = events.as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got == want)
  }

  test("partitioned roundtrip: partCol filter lands in PartitionFilters, not post-scan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("partprune").toString
    val back = Layout.partitionedRoundtrip(docs, "lang", dir)
      .filter($"lang" === "en")
    val plan = back.queryExecution.executedPlan.toString
    // the lang predicate must resolve at planning time against the
    // directory values — a DataFilter here means every partition is read
    assert(plan.contains("PartitionFilters") &&
      """PartitionFilters: \[[^\]]*lang""".r.findFirstIn(plan).isDefined,
      s"lang filter not pushed to partition pruning:\n$plan")
    // and the roundtrip loses nothing
    assert(back.count() == docs.filter($"lang" === "en").count())
    assert(Layout.partitionedRoundtrip(docs, "lang", dir).count() == docs.count())
  }
}
