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

  /** Deterministic per-row salt in [0, salts): content hash of the given
    * columns (falls back to all columns) — stable across retries, no
    * RNG state. */
  private def saltCol(df: DataFrame, salts: Int, from: Seq[String]): Column = {
    val basis = if (from.nonEmpty) from else df.columns.toSeq
    pmod(xxhash64(basis.map(col): _*), lit(salts)).cast("int")
  }

  /** Inner equi-join on `keys` with the left side salted `salts` ways
    * and the right side replicated. Result equals
    * `left.join(right, keys)` exactly. Use when `right` is small enough
    * to replicate (dimension-sized) but too big / too cold to
    * broadcast, and `left` has hot keys. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int = 8): DataFrame = {
    require(salts > 0)
    val l = left.withColumn("__salt",
      saltCol(left, salts, left.columns.toSeq.filterNot(keys.contains)))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase salted sum/count aggregation: exact `groupBy(keys)
    * .agg(sum, count)` with the first shuffle spread over
    * (keys, salt). `valueCol` is summed; the row count rides along.
    *
    * The salt mixes a per-row component (partition-position id) into
    * the content hash: a hot key whose non-key values are all equal —
    * a very common skew shape (value = 0 defaults) — must still spread
    * across salts, and a pure content hash would send it to one.
    * Correctness never depends on the salt value (the second phase
    * re-aggregates on the bare keys), so the id's partition-layout
    * dependence is harmless. */
  def saltedAggregate(df: DataFrame, keys: Seq[String], valueCol: String,
      salts: Int = 8): DataFrame = {
    require(salts > 0)
    val nonKey = df.columns.toSeq.filterNot(keys.contains).map(col)
    val salted = df.withColumn("__salt",
      pmod(xxhash64(nonKey :+ monotonically_increasing_id(): _*), lit(salts)).cast("int"))
    salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pn"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pn")).as("n"))
  }
}
