package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact integer arithmetic idioms shared across operators — each
  * exists because the "obvious" Spark expression silently loses
  * precision at scale and the defect class kept reappearing one site
  * at a time (round 17: the same floor-division bug was fixed
  * pointwise in TemporalJoins twice, then found again in the
  * bucket-grid family by review).
  *
  * The reference engine is integer-only single-process Python
  * (/root/reference/sqlengine.py) and never meets these limits;
  * extension-surface infrastructure. */
object ExactMath {

  /** Floor division `⌊x / d⌋` with EVERY step integral, for any long
    * `x` and positive literal `d`, via the pmod identity
    * `(x - pmod(x, d)) div d`:
    *
    *  - Spark's `/` on integral columns routes through DOUBLE, which
    *    rounds the NUMERATOR once |x| exceeds 2⁵³ — epoch-micros
    *    (~1.7e18) and epoch-nanos timestamps live there, and a
    *    one-off numerator shifts the row a whole bucket (for a
    *    bucketed join: silently dropped matches).
    *  - A bare `x div d` truncates TOWARD ZERO, which disagrees with
    *    DuckDB's floor `//` on negative x — the cross-engine trap
    *    every oracle comparison must dodge. `pmod` is non-negative,
    *    so the subtraction lands on the floor multiple first and the
    *    `div` is then exact for either sign.
    *
    * Returns LongType. */
  def floorDiv(x: Column, d: Long): Column = {
    require(d > 0, s"floorDiv: divisor must be positive, got $d")
    call_function("div", x - pmod(x, lit(d)), lit(d))
  }
}
