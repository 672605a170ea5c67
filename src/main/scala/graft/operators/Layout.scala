package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional file clustering via
  * Z-ordering (Morton codes) — the OPTIMIZE ZORDER analog of the lake
  * formats, expressed as plain Spark.
  *
  * Why it matters at 100 TB: parquet row-group and file skipping works
  * off min/max statistics. A corpus sorted by ONE column answers range
  * predicates on that column with tight skipping but reads everything
  * for predicates on any other column; interleaving the bits of two
  * (rank-normalized) key columns gives every file a tight min/max box
  * in BOTH dimensions, so filters on either column skip most files.
  * The z-value is a pure codegen'd bit-interleave — no UDF, no shuffle
  * beyond the single range-partitioning pass any re-layout needs.
  */
object Layout {

  /** Morton interleave of two already-normalized non-negative int
    * columns (each in [0, 2^bits)): bit i of `a` → bit 2i, bit i of
    * `b` → bit 2i+1. Plain bitwise arithmetic — whole-stage codegen. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(1L), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(1L), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))

  /** Min-max scale a numeric column to [0, 2^bits), given the global
    * min/max (from a cheap stats pass). Degenerate (constant) columns
    * map to 0. NULL values also map to 0 — they cluster at the origin
    * corner (the coalesce sits INSIDE the `least`, which would
    * otherwise skip the null and silently send nulls to the TOP
    * bucket). */
  def normalize(c: Column, min: Double, max: Double, bits: Int = 16): Column = {
    val span = max - min
    if (span <= 0) lit(0L)
    else least(lit((1L << bits) - 1),
      coalesce(floor((c.cast("double") - min) / span * (1L << bits)).cast("long"),
        lit(0L)))
  }

  /** Hive-style partitioned parquet roundtrip: write `df` partitioned
    * by `partCol` (one directory per value), read it back. A filter on
    * `partCol` over the returned frame prunes at PLANNING time —
    * `.explain` shows it under `PartitionFilters`, and unselected
    * directories are never listed, let alone read. This is the
    * coarse-grained complement to [[zorder]]'s min/max file skipping:
    * partition on the low-cardinality routing column (language,
    * source, date), z-order within partitions on the range columns.
    * Cardinality guard is the caller's job — a high-cardinality
    * `partCol` produces one tiny file per value, the classic small-
    * files failure at 100 TB. */
  def partitionedRoundtrip(df: DataFrame, partCol: String,
      path: String): DataFrame = {
    df.write.mode("overwrite").partitionBy(partCol).parquet(path)
    // Partition values come back through directory-name type INFERENCE
    // (spark.sql.sources.partitionColumnTypeInference), which need not
    // reproduce the written type — a LongType day returns IntegerType.
    // Cast back to the declared type and restore the original column
    // order so the roundtrip is schema-faithful for any partCol type.
    df.sparkSession.read.parquet(path)
      .withColumn(partCol, col(partCol).cast(df.schema(partCol).dataType))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Re-layout `df` so files cluster in BOTH `colA` and `colB`:
    * compute per-column min/max (one aggregate job), z-interleave the
    * normalized values, range-partition on the z-value into `numFiles`
    * partitions and sort within each. Returns the frame to write (the
    * caller picks format/path); `__z` is dropped from the output. */
  def zorder(df: DataFrame, colA: String, colB: String,
      numFiles: Int, bits: Int = 16): DataFrame = {
    val stats = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    // empty frame or an all-null cluster column: nothing to cluster on
    // — return the frame unchanged (same spirit as the constant-column
    // case in normalize) instead of NPEing on a null stat
    if (stats.isNullAt(0) || stats.isNullAt(2)) return df
    val z = zValue(
      normalize(col(colA), stats.getDouble(0), stats.getDouble(1), bits),
      normalize(col(colB), stats.getDouble(2), stats.getDouble(3), bits), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Deterministic audit of the z-order layout: the same normalize +
    * Morton interleave as [[zorder]], but with the range split made
    * EXACT — `ntile(numFiles)` over (z, id) instead of Spark's
    * sample-based RangePartitioner — and the output reduced to the
    * per-file (min, max) box of both cluster columns plus the row
    * count. This is what a cross-engine oracle can re-derive bit for
    * bit (the sampled partitioner boundaries cannot be), and the boxes
    * are exactly the statistics parquet skipping feeds on.
    *
    * The global-ordered window is the audit path's one concession: it
    * funnels through a single task, fine for a layout-quality check
    * (numFiles × 6 output rows), deliberately NOT the production write
    * path — [[zorder]] keeps the parallel range partitioner. */
  def zorderAudit(df: DataFrame, colA: String, colB: String, idCol: String,
      numFiles: Int, bits: Int = 16): DataFrame = {
    val stats = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    val z = zValue(
      normalize(col(colA), stats.getDouble(0), stats.getDouble(1), bits),
      normalize(col(colB), stats.getDouble(2), stats.getDouble(3), bits), bits)
    df.withColumn("__z", z)
      .withColumn("file_id",
        ntile(numFiles).over(Window.orderBy(col("__z"), col(idCol))).cast("long"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n"),
        min(col(colA)).as(s"min_$colA"), max(col(colA)).as(s"max_$colA"),
        min(col(colB)).as(s"min_$colB"), max(col(colB)).as(s"max_$colB"))
  }
}
