package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Change-data-capture maintenance — how a pipeline keeps a mutable
  * upstream table (a crawl frontier, a license registry, a source
  * catalog) usable as an immutable snapshot on the lake.
  *
  * Input model (the Debezium-ish shape every CDC feed reduces to): a
  * change log with a business key, a monotone sequence column (LSN /
  * commit timestamp / offset) and an op column `I`/`U`/`D`. Two
  * consumers of the same log:
  *
  *  - [[applyChanges]] → the NEXT SNAPSHOT: latest-wins per key merged
  *    into the previous snapshot (upserts replace, deletes drop,
  *    inserts append).
  *  - [[scd2History]] → the FULL HISTORY (slowly-changing dimension
  *    type 2): one row per (key, version) with a [valid_from,
  *    valid_to) sequence range and an is_current flag — the shape a
  *    temporal/as-of join consumes.
  *
  * Scale shape at 100 TB: both are one hash shuffle on the business
  * key. applyChanges reduces the log map-side first (`max_by` partial
  * aggregation ships ONE candidate row per key per partition — a
  * window rank would shuffle the whole log), then merges with a single
  * outer join against the snapshot; a daily 1 TB change log against a
  * 100 TB snapshot co-partitions on the key (bucketed tables make the
  * snapshot side shuffle-free). scd2History windows over (key, seq) —
  * there per-key history order is the whole point, and the shuffle
  * carries only the changed keys' rows.
  *
  * The reference engine is read-only over static CSVs
  * (/root/reference/sqlengine.py loads `metadata.txt` once; no DML of
  * any kind); extension surface. */
object Cdc {

  /** Merge a change log into a snapshot; returns the next snapshot
    * with the snapshot's columns. `changes` must carry the key, the
    * sequence, the op, and every payload column of the snapshot.
    * Latest-wins per key by sequence; the op is a deterministic
    * tie-break only (a feed that reuses a sequence number for one key
    * is malformed — CDC sequences are unique per key by contract). */
  def applyChanges(snapshot: DataFrame, changes: DataFrame, keyCol: String,
      seqCol: String, opCol: String): DataFrame = {
    val payload = snapshot.columns.filter(_ != keyCol)
    // ONE winner row per key, map-side-combining: max_by over a struct
    // ordered by (seq, op) — no window, no full-log shuffle
    val ord = struct(col(seqCol), col(opCol))
    val latest = changes.groupBy(col(keyCol)).agg(
      max_by(col(opCol), ord).as("__op"),
      payload.map(c => max_by(col(c), ord).as(c)): _*)
    snapshot.join(latest, Seq(keyCol), "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(
        col(keyCol) +:
          payload.map(c =>
            when(col("__op").isNotNull, latest(c)).otherwise(snapshot(c)).as(c)): _*)
  }

  /** Incrementally maintain a grouped COUNT/SUM view under the change
    * log — incremental view maintenance, the reason warehouses keep
    * aggregates fresh without rescanning the base table. The base
    * snapshot is touched only to fetch the OLD contribution of the
    * changed keys (one key equi-join, shuffle ∝ |changes|; bucketed
    * base tables make the snapshot side shuffle-free), so maintaining
    * a view over a 100 TB base under a 1 TB/day change feed costs the
    * feed, not the base. Delta algebra per changed key (latest-wins,
    * same max_by reduction as [[applyChanges]]):
    * retract (−1, −old_value) if the key exists in the snapshot; add
    * (+1, +new_value) unless the final op is a delete. The sum runs in
    * exact DECIMAL(18,2) (order-independent, engine-comparable) and a
    * group whose count reaches 0 vanishes — output equals a full
    * recompute over the merged snapshot, which is what the oracle
    * pins. Output: (group, n, total). */
  def maintainGroupAgg(snapshot: DataFrame, changes: DataFrame, keyCol: String,
      seqCol: String, opCol: String, groupCol: String, valueCol: String): DataFrame = {
    val dec = DecimalType(18, 2)
    val prevAgg = snapshot.groupBy(col(groupCol)).agg(
      count(lit(1)).as("__n0"), sum(col(valueCol).cast(dec)).as("__s0"))
    val ord = struct(col(seqCol), col(opCol))
    val latest = changes.groupBy(col(keyCol)).agg(
      max_by(col(opCol), ord).as("__op"),
      max_by(col(groupCol), ord).as("__g"),
      max_by(col(valueCol), ord).as("__v"))
    val snapKeyed = snapshot.select(col(keyCol),
      col(groupCol).as("__og"), col(valueCol).as("__ov"))
    val retract = latest.join(snapKeyed, Seq(keyCol))
      .select(col("__og").as(groupCol), lit(-1L).as("__dn"),
        (-col("__ov").cast(dec)).as("__ds"))
    val add = latest.filter(col("__op") =!= "D")
      .select(col("__g").as(groupCol), lit(1L).as("__dn"),
        col("__v").cast(dec).as("__ds"))
    val delta = retract.unionByName(add)
      .groupBy(col(groupCol)).agg(sum("__dn").as("__dn"), sum("__ds").as("__ds"))
    prevAgg.join(delta, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("__n0"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n"),
        (coalesce(col("__s0"), lit(0).cast(dec)) +
          coalesce(col("__ds"), lit(0).cast(dec))).cast("double").as("total"))
      .filter(col("n") > 0)
  }

  /** Expand a change log into SCD2 history rows: (key, payload...,
    * valid_from, valid_to, is_current). `valid_to` is the next
    * version's sequence (exclusive) or NULL while current; a `D` op
    * closes the key (emits no row itself, but bounds its
    * predecessor). */
  def scd2History(changes: DataFrame, keyCol: String, seqCol: String,
      opCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol).asc)
    changes
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .filter(col(opCol) =!= "D")
      .withColumn("is_current", col("valid_to").isNull)
      .withColumnRenamed(seqCol, "valid_from")
      .drop(opCol)
  }
}
