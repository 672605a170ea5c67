package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the manual counterpart to AQE's
  * runtime skew-join splitting, for when the skew is known up front
  * (e.g. a null-ish default key holding 10% of a 100 TB fact table).
  *
  * Both operators preserve exact results; they only change the
  * partitioning:
  *  - [[saltedJoin]]: the left (large, skewed) side scatters each row
  *    into one of `salts` sub-keys by a content hash; the right (small)
  *    side replicates `salts`× so every sub-key still finds its match.
  *    A key that used to land on 1 reducer now spreads over `salts`.
  *  - [[saltedAggregate]]: two-phase aggregation — partial aggregate on
  *    (key, salt), final aggregate on key. Spark's hash aggregate
  *    already does map-side partials; the extra phase helps when a
  *    single key's *post-shuffle* groups overwhelm one reducer (huge
  *    distinct-value state, for example).
  */
object Skew {

  /** Per-row salt in [0, salts): hash of the partition-position id —
    * spreads EVERY key across salts, including the very common skew
    * shape where a hot key's other columns are all identical (a
    * content hash would send those to one salt). No data columns are
    * hashed, so unhashable types (maps) never break it, and no row
    * pays for hashing wide payloads. Correctness never depends on the
    * salt value in either operator below (the join replicates the
    * right side to every salt; the aggregate re-groups on the bare
    * keys), so the id's partition-layout dependence is harmless. */
  private def rowSalt(salts: Int): Column =
    pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int")

  /** Inner equi-join on `keys` with the left side salted `salts` ways
    * and the right side replicated. Result equals
    * `left.join(right, keys)` exactly. Use when `right` is small enough
    * to replicate (dimension-sized) but too big / too cold to
    * broadcast, and `left` has hot keys. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int = 8): DataFrame = {
    require(salts > 0)
    val l = left.withColumn("__salt", rowSalt(salts))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase salted sum/count aggregation: exact `groupBy(keys)
    * .agg(sum, count)` with the first shuffle spread over
    * (keys, salt). `valueCol` is summed; the row count rides along. */
  def saltedAggregate(df: DataFrame, keys: Seq[String], valueCol: String,
      salts: Int = 8): DataFrame = {
    require(salts > 0)
    val salted = df.withColumn("__salt", rowSalt(salts))
    salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pn"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pn")).as("n"))
  }

  /** Skew-resistant sessionization — the mitigation for the one shape
    * salting cannot touch: a per-user `Window.orderBy(ts)` puts the
    * head user's EVERY event on one task (the round-14 skew sweep
    * measured ev_sessionize 1.9× and ev_session_paths 2.8× slower at
    * a 30%-head zipf, 3M rows), and a salt would break the ordering
    * that IS the semantics.
    *
    * Two-level restructure, output BIT-IDENTICAL to the single-window
    * gap sessionize (same (user_id, session_idx, n_events, duration_s)
    * rows — the registered `ev_sessionize_skew` query shares
    * `ev_sessionize`'s oracle verbatim to prove it):
    *
    *  1. events sessionize WITHIN (user, time-bucket of `bucketSeconds`)
    *     — the heavy event-level sort now spreads over
    *     user × time-bucket keys, so the head user costs
    *     (events / buckets-active) per task, not (events);
    *  2. the per-bucket runs collapse to one SESSION row each
    *     (start, end, n, first-event key), and a second per-user window
    *     over those SESSION rows applies the identical gap test between
    *     adjacent runs — sound because bucket ranges are disjoint, so
    *     the global (ts, tie) event order is the bucket concatenation
    *     and consecutive runs meet exactly where consecutive events do.
    *     No bucket-width precondition: an empty bucket between two runs
    *     just means the gap test compares their true end/start times
    *     (`bucketSeconds` may be smaller than `gapSeconds`).
    *
    * The second window's partition carries one row PER LOCAL SESSION,
    * not per event — the win therefore rides the events-per-session
    * density of the hot user (a head user is hot BECAUSE it is dense;
    * an adversarial all-singleton-sessions stream degrades back to
    * per-event rows, with the first level still having spread the
    * sort). `tieCol` must make (ts, tie) unique per user or session
    * numbering is nondeterministic in BOTH forms. */
  def sessionizeTwoLevel(df: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts_s", tieCol: String = "event_id",
      gapSeconds: Long = 1800L, bucketSeconds: Long = 86400L): DataFrame =
    twoLevelRuns(df, userCol, tsCol, tieCol, gapSeconds, bucketSeconds,
      Nil, Nil)
      .groupBy(col(userCol), col("session_idx"))
      .agg(sum(col("__n")).as("n_events"),
        (max(col("__end")) - min(col("__start"))).as("duration_s"))

  /** Per-session ordered payload sequence under the same two-level
    * chain — the skew-resistant core of the session-paths rollup
    * (`ev_session_paths` degraded 2.8× in the zipf sweep, worst of the
    * five: the hot user's window carries whole event structs, not just
    * timestamps). Each local run aggregates its own SORTED payload
    * segment; the merge concatenates segments in run order, which IS
    * the global (ts, tie) order because bucket time-ranges are
    * disjoint. Returns (userCol, session_idx, path) with
    * `path = payload₁>payload₂>…` — bit-identical to the one-window
    * form (the registered `ev_session_paths_skew` shares
    * `ev_session_paths`'s oracle verbatim). */
  def sessionPathsTwoLevel(df: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts_s", tieCol: String = "event_id",
      payloadCol: String = "event_type",
      gapSeconds: Long = 1800L, bucketSeconds: Long = 86400L): DataFrame =
    twoLevelRuns(df, userCol, tsCol, tieCol, gapSeconds, bucketSeconds,
      Seq(payloadCol),
      Seq(array_sort(collect_list(
        struct(col(tsCol), col(tieCol), col(payloadCol)))).as("__elems")))
      .groupBy(col(userCol), col("session_idx"))
      .agg(concat_ws(">", transform(
        // runs sorted by first-event key, then their pre-sorted
        // segments flattened = the globally sorted event sequence
        flatten(transform(
          array_sort(collect_list(struct(col("__skey"), col("__elems")))),
          x => x.getField("__elems"))),
        e => e.getField(payloadCol))).as("path"))

  /** The shared two-level engine: sessionize WITHIN (user, time
    * bucket) — spreading the event-level sort over user × bucket keys
    * — collapse each run to one row (count, start, end, first-event
    * key, plus `extraAggs`), then merge runs across bucket boundaries
    * with the identical gap test in a per-user window over RUN rows.
    * Sound because bucket time-ranges are disjoint: the global
    * (ts, tie) event order is the bucket concatenation, so adjacent
    * runs meet exactly where adjacent events do, and an empty bucket
    * between runs still compares their true end/start times (no
    * bucket-width precondition). Returns one row per LOCAL RUN with
    * the chain-global `session_idx` attached. */
  private def twoLevelRuns(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapSeconds: Long, bucketSeconds: Long,
      carryCols: Seq[String], extraAggs: Seq[Column]): DataFrame = {
    require(gapSeconds > 0 && bucketSeconds > 0)
    import org.apache.spark.sql.expressions.Window
    val w1 = Window.partitionBy(col(userCol), col("__b"))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val aggs = Seq(count(lit(1)).as("__n"),
      min(col(tsCol)).as("__start"), max(col(tsCol)).as("__end"),
      min(struct(col(tsCol), col(tieCol))).as("__skey")) ++ extraAggs
    val local = df
      .select((Seq(userCol, tsCol, tieCol) ++ carryCols).map(col): _*)
      .withColumn("__b", floor(col(tsCol) / bucketSeconds).cast("long"))
      .withColumn("__prev", lag(col(tsCol), 1).over(w1))
      .withColumn("__new", when(col("__prev").isNull ||
          col(tsCol) - col("__prev") > gapSeconds, 1L).otherwise(0L))
      .withColumn("__lidx", sum(col("__new"))
        .over(w1.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(userCol), col("__b"), col("__lidx"))
      .agg(aggs.head, aggs.tail: _*)
    val w2 = Window.partitionBy(col(userCol)).orderBy(col("__skey").asc)
    local
      .withColumn("__pend", lag(col("__end"), 1).over(w2))
      .withColumn("__chain", when(col("__pend").isNull ||
          col("__start") - col("__pend") > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("__chain"))
        .over(w2.rowsBetween(Window.unboundedPreceding, 0)))
  }
}
