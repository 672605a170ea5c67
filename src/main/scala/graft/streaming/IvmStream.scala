package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.DecimalType

import graft.operators.Cdc

/** Streaming incremental view maintenance — the continuous twin of the
  * batch IVM pair ([[graft.operators.Cdc.maintainGroupAgg]] /
  * [[graft.operators.Cdc.maintainJoinView]]), folding a CDC change
  * feed into a continuously-fresh materialization under the
  * [[SnapshotStore]] versioned-snapshot exactly-once protocol. This is
  * the shape a warehouse actually runs: the batch operators answer
  * "given today's feed, what is the next view?"; these sinks keep the
  * view CURRENT as the feed arrives, exactly-once through crashes.
  *
  * == Group-aggregate view ==
  *
  * State is TWO NUMBERS PER GROUP — (n, total) — plus one global
  * frontier, never per-key state: the feed's Debezium-style BEFORE
  * IMAGES make the retraction computable without consulting a key
  * store. Feed contract (one row per change):
  * `(key, seq, op, grp, value, old_grp, old_value)` where `op` ∈
  * I/U/D, `(old_grp, old_value)` is the key's image immediately
  * before its FIRST change of the batch (NULL old_grp ⇔ the key did
  * not exist), and `seq` is feed-monotone. Per batch, per key:
  * latest-wins `max_by` picks the final image (the
  * [[Cdc.applyChanges]] reduction), `min_by` picks the pre-batch old
  * image; delta = retract (−1, −old_value) if the key existed, add
  * (+1, +value) unless the final op is D. The sum runs in exact
  * DECIMAL(18,2) (order-independent, engine-comparable); a group
  * folding to n = 0 leaves the state (absence ≡ zero), and n < 0 —
  * only possible when a feed's old images LIE about the pre-state —
  * trips an in-plan assert instead of silently corrupting the view.
  *
  * Cross-batch ordering is guarded like the bucket twins
  * ([[SnapshotStore.foldPrelude]]'s frontier contract, adapted from
  * per-key buckets to the feed's global `seq`): the carried state
  * pins `last_seq` = the maximum folded sequence, and a batch whose
  * minimum new `seq` does not exceed it fails loudly — a regressed
  * or replayed-out-of-protocol feed would otherwise retract against
  * images the view no longer holds.
  *
  * Exactly-once: snapshot `b=<id>` overwrite, read strictly-below,
  * prune below id − retainBelow — the [[EwmaStream]] protocol
  * verbatim (the crash window replays batch id, which reads id−1).
  *
  * == Join view ==
  *
  * [[joinFoldBatch]] maintains `A ⋈_joinCol B` under ONE interleaved
  * feed carrying both sides (`side` ∈ 'A'/'B' with each side's
  * columns, the other side's NULL). State is FOUR SnapshotStore homes
  * under one root — `a/` and `b/` (the merged key-level snapshots,
  * maintained by [[Cdc.applyChanges]]), `view/` (the materialized
  * join, maintained by [[Cdc.maintainJoinView]]'s affected-key delta
  * algebra — each batch costs the batch, not the base), and `f/` (the
  * 1-row feed frontier carrying the same monotone-`seq` guard as the
  * group twin; a dedicated home because both `a/` and `view/` can be
  * legitimately empty while the feed advances). A crash between the
  * four commits replays the batch, which re-reads every home
  * strictly-below its id and rewrites identical content — the
  * protocol composes across homes because each read is versioned
  * independently.
  *
  * At 100 TB: state is the key space (a/b snapshots + view rows),
  * never the event volume; each micro-batch pays one hash shuffle of
  * the (small) batch per home plus [[Cdc.maintainJoinView]]'s
  * key-pruned semi/anti joins against the carried snapshots. Swap the
  * parquet SnapshotStore for an ACID table format at lake scale and
  * keep this exact batch protocol ([[CdcStream]]'s note).
  *
  * The reference engine is read-only over static CSVs
  * (/root/reference/sqlengine.py; no DML, no streams; SURVEY.md
  * §2.9); extension surface. */
object IvmStream {

  private val dec = DecimalType(18, 2)

  private def emptyAggState(spark: SparkSession, batch: DataFrame): DataFrame =
    batch.select(col("grp")).filter(lit(false))
      .withColumn("n", lit(0L))
      .withColumn("total_c", lit(0).cast(dec))
      .withColumn("last_seq", lit(Long.MinValue))

  /** Latest committed group-agg state:
    * (grp, n, total_c, last_seq). */
  def readState(spark: SparkSession, stateDir: String): DataFrame =
    SnapshotStore.readLatest(spark, stateDir, "IVM group-agg")

  /** [[readState]] reduced to the view a consumer queries —
    * (grp, n, total), the [[Cdc.maintainGroupAgg]] output shape with
    * the exact decimal cast to double at the boundary (the
    * engine-comparison policy of the batch twin). */
  def readView(spark: SparkSession, stateDir: String): DataFrame =
    readState(spark, stateDir)
      .select(col("grp"), col("n"), col("total_c").cast("double").as("total"))

  /** One foreachBatch step, public for spec-driven replay and crash
    * injection: fold change-batch `id` (the feed contract in the
    * object doc) onto the carried per-group state and commit snapshot
    * `b=<id>`. */
  def foldBatch(batch: DataFrame, id: Long, stateDir: String,
      retainBelow: Int = 1): Unit = {
    val spark = batch.sparkSession
    val prev = SnapshotStore.stateSoFar(spark, stateDir, id,
      emptyAggState(spark, batch))
    val ord = struct(col("seq"), col("op"))
    val perKey = batch.groupBy(col("key")).agg(
      max_by(col("op"), ord).as("__op"),
      max_by(col("grp"), ord).as("__g"),
      max_by(col("value"), ord).as("__v"),
      min_by(col("old_grp"), ord).as("__og"),
      min_by(col("old_value"), ord).as("__ov"),
      min(col("seq")).as("__minseq"),
      max(col("seq")).as("__maxseq"))
    // 1-row frontier frame: the monotone-seq guard rides it in-plan
    // (assert_true yields NULL on pass, so the filter keeps the row),
    // and the advanced frontier broadcasts onto every state row
    val frontier = prev.agg(
        coalesce(max(col("last_seq")), lit(Long.MinValue)).as("__pf"))
      .crossJoin(perKey.agg(min(col("__minseq")).as("__bmin"),
        max(col("__maxseq")).as("__bmax")))
      .filter(assert_true(
        col("__bmin").isNull || col("__bmin") > col("__pf"),
        concat(lit("IvmStream: batch seq "), col("__bmin"),
          lit(" not after carried last_seq "), col("__pf"),
          lit(" — the feed regressed; before-images would mis-retract")))
        .isNull)
      .select(greatest(col("__pf"), coalesce(col("__bmax"), col("__pf")))
        .as("last_seq"))
    val retract = perKey.filter(col("__og").isNotNull)
      .select(col("__og").as("grp"), lit(-1L).as("__dn"),
        (-col("__ov").cast(dec)).as("__ds"))
    val add = perKey.filter(col("__op") =!= "D")
      .select(col("__g").as("grp"), lit(1L).as("__dn"),
        col("__v").cast(dec).as("__ds"))
    val delta = retract.unionByName(add)
      .groupBy(col("grp"))
      .agg(sum("__dn").as("__dn"), sum("__ds").as("__ds"))
    val folded = prev.drop("last_seq")
      .join(delta, Seq("grp"), "full_outer")
      .select(col("grp"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as("n"),
        (coalesce(col("total_c"), lit(0).cast(dec)) +
          coalesce(col("__ds"), lit(0).cast(dec))).cast(dec).as("total_c"))
      .filter(assert_true(col("n") >= 0L,
        concat(lit("IvmStream: group "), col("grp"),
          lit(" folded to negative count "), col("n"),
          lit(" — the feed's before-images are inconsistent")))
        .isNull)
      .filter(col("n") > 0L)
      .crossJoin(frontier)
    SnapshotStore.commit(folded, stateDir, id, retainBelow)
  }

  /** Sink a group-agg CDC feed (the object doc's contract) as a
    * continuously-maintained (grp, n, total) snapshot. */
  def ivmSink(changes: DataFrame, stateDir: String, checkpoint: String,
      retainBelow: Int = 1): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        foldBatch(batch, id, stateDir, retainBelow)
      }
      .start()

  // =====================================================================
  // Join-view twin
  // =====================================================================

  private def emptyFrom(batch: DataFrame, cols: Seq[String]): DataFrame =
    batch.select(cols.map(col(_)): _*).filter(lit(false))

  /** Latest committed join view (the `view/` home under `rootDir`). */
  def readJoinView(spark: SparkSession, rootDir: String): DataFrame =
    SnapshotStore.readLatest(spark, rootDir + "/view", "IVM join-view")

  /** One foreachBatch step for the join-view twin: split interleaved
    * batch `id` by `side`, advance both key-level snapshots with
    * [[Cdc.applyChanges]], the view with [[Cdc.maintainJoinView]],
    * and the frontier guard; commit all four homes at `b=<id>`.
    *
    * `aPayload` = A's payload columns (must include `joinCol`);
    * `bPayload` = B's payload columns. The batch must carry
    * `side`, `seq`, `op`, `aKey`, `joinCol`, and every payload
    * column (the inactive side's columns NULL). */
  def joinFoldBatch(batch: DataFrame, id: Long, rootDir: String,
      aKey: String, joinCol: String, aPayload: Seq[String],
      bPayload: Seq[String], retainBelow: Int = 1): Unit = {
    require(aPayload.contains(joinCol),
      s"joinFoldBatch: A's payload must carry join column $joinCol")
    val spark = batch.sparkSession
    val aCols = Seq(aKey) ++ aPayload
    val bCols = Seq(joinCol) ++ bPayload
    val viewCols = (Seq(aKey) ++ aPayload) ++ bPayload
    val aPrev = SnapshotStore.stateSoFar(spark, s"$rootDir/a", id,
      emptyFrom(batch, aCols))
    val bPrev = SnapshotStore.stateSoFar(spark, s"$rootDir/b", id,
      emptyFrom(batch, bCols))
    val viewPrev = SnapshotStore.stateSoFar(spark, s"$rootDir/view", id,
      emptyFrom(batch, viewCols))
    val fPrev = SnapshotStore.stateSoFar(spark, s"$rootDir/f", id,
      batch.select(lit(Long.MinValue).as("last_seq")).filter(lit(false)))
    val aCh = batch.filter(col("side") === "A")
      .select((Seq("seq", "op") ++ aCols).map(col(_)): _*)
    val bCh = batch.filter(col("side") === "B")
      .select((Seq("seq", "op") ++ bCols).map(col(_)): _*)
    // same monotone-seq guard as the group twin, over the whole feed
    // (the shared one-home implementation — SnapshotStore.seqFrontier)
    val frontier = SnapshotStore.seqFrontier(fPrev, batch, "IvmStream join")
    val aNext = Cdc.applyChanges(aPrev, aCh, aKey, "seq", "op")
    val bNext = Cdc.applyChanges(bPrev, bCh, joinCol, "seq", "op")
    // persist = false: a long-lived stream would leak one pinned
    // affected-key frame per micro-batch; recomputing it is one
    // max_by aggregation of the (small) batch per consumer
    val viewNext = Cdc.maintainJoinView(viewPrev, aPrev, aCh, aKey,
      bPrev, bCh, joinCol, "seq", "op", persist = false)
    // The FRONTIER home commits FIRST: the monotone-seq guard rides
    // the frontier plan, so materializing f/ is what evaluates it. If
    // a/b/view committed first, a regressed feed would land mis-folded
    // state in three homes before the assert ever fired — and since
    // every replay of that batch fails the same guard, readJoinView
    // would serve the corrupt b=<id> snapshots indefinitely. With f/
    // first, a guarded batch throws before ANY state home advances.
    // Among the remaining three the order is irrelevant: each home is
    // read strictly-below the batch id, so a crash between any two
    // commits replays the whole batch from consistent prior versions.
    SnapshotStore.commit(frontier, s"$rootDir/f", id, retainBelow)
    SnapshotStore.commit(aNext, s"$rootDir/a", id, retainBelow)
    SnapshotStore.commit(bNext, s"$rootDir/b", id, retainBelow)
    SnapshotStore.commit(viewNext, s"$rootDir/view", id, retainBelow)
  }

  /** Sink an interleaved two-sided CDC feed as a continuously-
    * maintained join view (see [[joinFoldBatch]] for the contract). */
  def joinSink(changes: DataFrame, rootDir: String, checkpoint: String,
      aKey: String, joinCol: String, aPayload: Seq[String],
      bPayload: Seq[String], retainBelow: Int = 1): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        joinFoldBatch(batch, id, rootDir, aKey, joinCol, aPayload,
          bPayload, retainBelow)
      }
      .start()
}
