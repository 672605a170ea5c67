package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark's DataFrame API lacks as primitives:
  * as-of join and bounded range join. The reference engine has neither
  * (its only join is an equality nested loop,
  * /root/reference/sqlengine.py:483-487); these are extension surface
  * for event/time-series pipelines.
  *
  * Scale design — both operators are ONE hash shuffle on the key
  * columns, never a cross product:
  *  - [[asofJoin]] uses the union+window formulation: tag both sides,
  *    union (a free concat — no shuffle), then a single
  *    partitionBy(key).orderBy(ts) window carries the latest right-side
  *    row forward into each left row. Cost is one shuffle + one sort —
  *    the same as the sort-merge join Spark would need anyway, with no
  *    candidate blowup on skewed keys.
  *  - [[boundedRangeJoin]] buckets time into `ceil((hi-lo))`-wide slots
  *    and replicates each LEFT row into the (at most 2) slots its
  *    window can touch; the join is then an equi-join on (key, slot)
  *    with an exact range filter behind it. Replication factor is
  *    constant (≤ 1 + ceil(window/bucket)), independent of data size —
  *    at 100 TB the shuffle is ~2× the left side, not |L|×|R|.
  */
object TemporalJoins {

  /** As-of join: for every left row, attach the single right row with
    * the same key and the greatest `rightTs <= leftTs` (left-join
    * semantics: left rows with no prior right row keep nulls).
    *
    * `payload` columns are taken from the right side. Ties
    * (rightTs == leftTs) match, mirroring ANSI `ASOF JOIN ... ON
    * l.ts >= r.ts` (DuckDB dialect).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // The payload rides in ONE struct per right row (null on left rows)
    // and `last(ignoreNulls)` carries the whole struct forward — the
    // matched right row is taken ATOMICALLY. Carrying each payload
    // column independently would be wrong for nullable payloads: a null
    // field in the true latest right row must survive as null, not be
    // papered over by an older row's non-null value (and different
    // columns must never come from different rows).
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(right.schema.fieldIndex(p))))
    // Tagged union: right rows sort BEFORE left rows at equal ts so a
    // right row at exactly leftTs is visible to the left row (>= tie).
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
      .select(Seq(col("__ts"), col("__side")) ++
        keyCols.map(col) ++
        leftCols.filterNot(keyCols.contains).map(col) :+
        lit(null).cast(payloadType).as("__r"): _*)
    val r = right.withColumn("__ts", col(rightTs)).withColumn("__side", lit(0))
      .select(Seq(col("__ts"), col("__side")) ++
        keyCols.map(col) ++
        leftCols.filterNot(keyCols.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(p => col(p).as(p)): _*).as("__r"): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = l.unionByName(r)
      .withColumn("__c", last(col("__r"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__c.$p").as(s"asof_$p")): _*)
  }

  /** Bounded range join: all pairs (l, r) with equal keys and
    * `r.ts ∈ [l.ts + lo, l.ts + hi)` (offsets may be negative — e.g.
    * lo = -300, hi = 0 is "right events in the 5 minutes before l").
    * Inner semantics; aggregate on the caller side for left-join-like
    * counts (see usage in PipelineQueries).
    *
    * Implementation: slot width = hi - lo; each left row lands in the
    * ≤2 slots its window overlaps, the right side in exactly one; then
    * equi-join on (key..., slot) + the exact range predicate.
    *
    * `payload` columns ride through from the RIGHT side (they must not
    * collide with left column names — rename on the way in, as
    * [[asofJoin]] callers do); the matched right timestamp is always
    * exposed as `__rts`. */
  def boundedRangeJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, lo: Long, hi: Long,
      payload: Seq[String] = Nil): DataFrame = {
    require(hi > lo, "hi must exceed lo")
    val width = hi - lo
    // exact for any long incl. past 2^53 (epoch-nanos) and floor-
    // consistent with DuckDB `//` on negatives — see ExactMath
    def slot(ts: Column): Column =
      graft.functions.ExactMath.floorDiv(ts, width)
    val lSlots = left
      .withColumn("__slot", explode(array_distinct(array(
        slot(col(leftTs) + lo), slot(col(leftTs) + hi - 1)))))
    val rSlots = right.select(
      keyCols.map(col) ++ Seq(col(rightTs).as("__rts"),
        slot(col(rightTs)).as("__slot")) ++ payload.map(col): _*)
    lSlots.join(rSlots, keyCols :+ "__slot")
      .filter(col("__rts") >= col(leftTs) + lo && col("__rts") < col(leftTs) + hi)
      .drop("__slot")
  }

  /** Interval OVERLAP join — the two-sided sibling of
    * [[boundedRangeJoin]]: all pairs (l, r) with equal keys whose
    * half-open intervals intersect (`lStart < rEnd && rStart < lEnd`).
    * Spark has no interval-join primitive; the naive range-predicate
    * join plans as a per-key cross product (or a
    * BroadcastNestedLoopJoin without keys) — |L|·|R| at scale.
    *
    * Implementation: time is cut into `slot`-wide buckets; EACH side
    * replicates a row into every bucket its interval covers (floor
    * division via the pmod identity — exact for any long, sign-safe),
    * the join is an equi-join on (key..., bucket) with the exact
    * overlap predicate behind it. EXACTLY-ONCE without a distinct:
    * a qualifying pair is emitted only in its CANONICAL bucket — the
    * one containing `greatest(lStart, rStart)`, which both sides
    * provably cover (the overlap start lies inside both intervals,
    * and floor division is monotone), so every matching pair meets
    * there and the slot-equality filter keeps exactly that meeting.
    *
    * Replication factor per row is `len/slot + 1` — choose `slot` ≈
    * the typical interval length so the shuffle is ~2× the input,
    * never |L|×|R|; a degenerate empty interval (end ≤ start)
    * replicates nowhere and joins nothing, by half-open convention.
    * Non-key columns of the two sides must not collide (rename on
    * the way in — the [[boundedRangeJoin]] payload contract). */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], lStart: String, lEnd: String,
      rStart: String, rEnd: String, slot: Long): DataFrame = {
    require(slot >= 1, s"intervalOverlapJoin: slot must be >= 1, got $slot")
    // exact for any long incl. past 2^53 (epoch-micros ~1.7e18 land
    // there) — the earlier double `/` rounded the numerator and could
    // shift a row one bucket, silently dropping overlapping pairs
    def bucket(ts: Column): Column =
      graft.functions.ExactMath.floorDiv(ts, slot)
    def slotted(df: DataFrame, s: String, e: String): DataFrame =
      df.filter(col(e) > col(s))
        .withColumn("__slot",
          explode(sequence(bucket(col(s)), bucket(col(e) - 1))))
    slotted(left, lStart, lEnd)
      .join(slotted(right, rStart, rEnd), keyCols :+ "__slot")
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(bucket(greatest(col(lStart), col(rStart))) === col("__slot"))
      .drop("__slot")
  }
}
