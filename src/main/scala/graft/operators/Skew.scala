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
}
