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
