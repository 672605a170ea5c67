package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Vector math over `array<float>` / `array<double>` columns, built from
  * Spark's codegen'd higher-order functions (`zip_with` / `aggregate` /
  * `transform`) — no UDFs, so the whole expression stays inside
  * whole-stage codegen and is safe at any scale.
  *
  * The reference engine has no vector type at all (integers only,
  * /root/reference/sqlengine.py problem statement p.1); this module is
  * part of the LLM-pipeline extension surface (similarity search,
  * embedding dedup) over the `embeddings` testdata table.
  */
object VectorOps {

  /** Cast every element to double (embeddings are array<float>; doing
    * the arithmetic in double keeps Spark's result deterministic and
    * engine-comparable). */
  def asDouble(v: Column): Column = transform(v, _.cast(DoubleType))

  /** Elementwise dot product via higher-order functions. Left-to-right
    * accumulation — the evaluation order is fixed per row, so results
    * are bit-stable across partitionings. Kept as the reference
    * implementation; the hot path uses [[dotNative]]. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  /** Dot product as a native codegen'd Catalyst expression
    * ([[ArrayDotProduct]]) — same left-to-right fold (bit-identical to
    * [[dot]]) compiled to a primitive loop with no intermediate array.
    * No function registration needed. */
  def dotNative(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(ArrayDotProduct(
      GraftBridge.expression(a.cast("array<double>")),
      GraftBridge.expression(b.cast("array<double>"))))
  }

  def normSq(a: Column): Column = dotNative(a, a)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity of two double-array columns (native dot). */
  def cosine(a: Column, b: Column): Column =
    dotNative(a, b) / (norm(a) * norm(b))

  /** L2-normalize, so downstream cosine reduces to a plain dot. */
  def normalize(v: Column): Column = {
    val n = norm(v)
    transform(v, x => x / n)
  }

  /** Signs of projections onto `planes` (a literal matrix), as a bucket
    * string "0110…" — the random-hyperplane LSH key. Planes are
    * generated driver-side from a fixed seed (deterministic), shipped
    * as literals: no data-dependent state, no shuffle. */
  def hyperplaneBucket(v: Column, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.map { p =>
      val plane = array(p.map(lit): _*)
      when(dotNative(v, plane) >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }
}
