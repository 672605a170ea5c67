package graft

import org.apache.spark.sql.functions._

import graft.operators.Cdc

/** Hand-computable CDC fixtures; the driver's cdc_apply / cdc_scd2
  * oracles cross-check the same operators on real data. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private lazy val snapshot = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "v", "amt")

  // k=1 updated twice (seq 2 must win), k=2 deleted, k=4 inserted,
  // k=3 untouched
  private lazy val changes = Seq(
    (1L, 1L, "U", "a1", 11.0),
    (1L, 2L, "U", "a2", 12.0),
    (2L, 1L, "D", null.asInstanceOf[String], 0.0),
    (4L, 1L, "I", "d", 40.0)
  ).toDF("k", "seq", "op", "v", "amt")

  test("applyChanges: latest-wins upsert, delete drops, untouched survives") {
    val got = Cdc.applyChanges(snapshot, changes, "k", "seq", "op")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a2", 12.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("applyChanges ships one candidate per key per partition (partial max_by, no window)") {
    val plan = Cdc.applyChanges(snapshot, changes, "k", "seq", "op")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"merge must not window the log:\n$plan")
  }

  test("maintainGroupAgg: delta maintenance equals full recompute; empty groups vanish") {
    import org.apache.spark.sql.types.DecimalType
    val snap = Seq((1L, "g1", 10.0), (2L, "g1", 20.0), (3L, "g2", 30.0),
      (5L, "g3", 5.0), (6L, "g4", 1.0)).toDF("k", "g", "amt")
    val ch = Seq(
      (1L, 1L, "U", "g2", 11.0), // moves g1 → g2
      (2L, 1L, "D", null.asInstanceOf[String], 0.0), // delete from g1
      (4L, 1L, "I", "g1", 40.0), // fresh insert into g1
      (5L, 1L, "D", null.asInstanceOf[String], 0.0), // delete…
      (5L, 2L, "I", "g3", 7.0), // …then re-insert (latest wins)
      (6L, 1L, "D", null.asInstanceOf[String], 0.0) // empties g4 entirely
    ).toDF("k", "seq", "op", "g", "amt")
    val maintained = Cdc.maintainGroupAgg(snap, ch, "k", "seq", "op", "g", "amt")
      .orderBy("g").as[(String, Long, Double)].collect().toSeq
    val recomputed = Cdc.applyChanges(snap, ch, "k", "seq", "op")
      .groupBy("g").agg(count(lit(1)).as("n"),
        sum(col("amt").cast(DecimalType(18, 2))).cast("double").as("total"))
      .orderBy("g").as[(String, Long, Double)].collect().toSeq
    assert(maintained == recomputed)
    assert(maintained == Seq(("g1", 1L, 40.0), ("g2", 2L, 41.0), ("g3", 1L, 7.0)))
    assert(!maintained.exists(_._1 == "g4")) // count hit 0 → gone
  }

  test("scd2History: version chain with exclusive upper bounds; D closes the key") {
    val got = Cdc.scd2History(changes, "k", "seq", "op")
      .orderBy("k", "valid_from")
      .select("k", "v", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, "a1", 1L, Some(2L), false),
      (1L, "a2", 2L, None, true),
      // k=2: the D at seq 1 closed a key with no prior version → no row
      (4L, "d", 1L, None, true)))
  }
}
