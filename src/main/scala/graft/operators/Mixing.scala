package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-mixture operators for assembling a training corpus from scored
  * documents: per-group caps and token-budget sampling — the step
  * between "scored/deduped documents" and "the mixture the model
  * actually trains on". The reference engine has nothing comparable
  * (integer-only SELECT subset, /root/reference/sqlengine.py); this is
  * extension surface over the `documents` table.
  *
  * Scale design:
  *  - [[topKPerGroup]] rides on the native [[graft.functions.TopKAggregate]]:
  *    map-side bounded heaps mean the shuffle carries ≤ k rows per
  *    (group, partition) — a 100 TB corpus with a "5M docs per source"
  *    cap never ships more than the cap per partition.
  *  - [[tokenBudgetPerGroup]] is a single ranked window per group
  *    (one shuffle). Groups are mixture cells (language × source):
  *    thousands of them, so partitions stay balanced; for a degenerate
  *    single giant cell, pre-cap with [[topKPerGroup]] (budget/minTokens
  *    rows bound the winners) before the ranked scan.
  */
object Mixing {

  /** Keep the `k` best rows of every group by `scoreCol` DESC (ties →
    * `idCol` ASC — deterministic). Output: groupCols + id + score +
    * rank (1-based). The id tiebreak works for ANY orderable id type
    * (string doc ids included). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], scoreCol: String,
      idCol: String, k: Int): DataFrame = {
    import graft.functions.TopKAggregate.topK
    df.groupBy(groupCols.map(col): _*)
      .agg(topK(col(scoreCol), col(idCol), col(idCol), k).as("__top"))
      .select(groupCols.map(col) :+ posexplode(col("__top")).as(Seq("__pos", "__e")): _*)
      .select(groupCols.map(col) ++ Seq(
        col("__e.payload").as(idCol),
        col("__e.score").as(scoreCol),
        (col("__pos") + 1).cast("long").as("rank")): _*)
  }

  /** Token-budget sampling: per group, take rows in `scoreCol` DESC
    * (ties → `idCol` ASC) order while the tokens taken BEFORE a row
    * stay under `budget` — i.e. the first row to cross the budget is
    * still included (standard fill-the-budget semantics: every group
    * with any data reaches its budget). Exact long arithmetic, fully
    * deterministic. */
  def tokenBudgetPerGroup(df: DataFrame, groupCols: Seq[String],
      tokenCol: String, scoreCol: String, idCol: String,
      budget: Long): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(scoreCol).desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__taken", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .filter(col("__taken") < budget)
      .drop("__taken")
  }

  /** Concat-and-chunk sequence packing — the GPT-style pretraining
    * layout: within each group, documents are laid end to end in
    * `idCol` order and the token stream is cut into fixed `seqLen`
    * windows. Adds `pack_id` (which training sequence this document
    * STARTS in) and `pack_offset` (its first token's position there);
    * long documents straddle pack boundaries by construction, exactly
    * like the real layout. One ranked window per group (groups are
    * mixture cells — thousands, balanced); exact long arithmetic. */
  def packSequences(df: DataFrame, groupCols: Seq[String], tokenCol: String,
      idCol: String, seqLen: Long): DataFrame = {
    require(seqLen > 0)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // integral DIV, not `/`: Spark's `/` is double division, exact only
    // below 2^53 — a per-group cumulative token count can cross that on
    // a large corpus with coarse groups (same rule as the range-join
    // slot math in TemporalJoins.boundedRangeJoin). __cum >= 0, so
    // truncating DIV == floor here.
    df.withColumn("__cum", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"__cum DIV ${seqLen}L"))
      .withColumn("pack_offset", pmod(col("__cum"), lit(seqLen)))
      .drop("__cum")
  }

  /** Temperature-based source resampling (the multilingual-pretraining
    * mixture rule, e.g. mBERT/XLM-R: sample source s with probability
    * ∝ count(s)^α, α < 1 flattening the head): each source's keep rate
    * is `min(1, (√c_s / Σ_t √c_t) · target / c_s)` at α = 0.5 — √ is
    * IEEE-correctly-rounded, so the rates (and therefore the sample)
    * reproduce bit-identically in any engine, unlike a general pow().
    * Membership is the same hash-gated deterministic rule as
    * [[Sampling.hashSample]]: keep iff xxh64(id) mod denom < rate·denom.
    *
    * Scale shape: per-source counts are one partial-agg shuffle;
    * the counts frame is driver-collected — bounded by the number of
    * mixture cells (sources), NOT data size — and the per-source
    * thresholds ship back as one literal CASE; the gate itself is a
    * map-only codegen'd filter on the corpus scan. */
  def temperatureSample(df: DataFrame, idCol: String, groupCol: String,
      target: Long, denom: Long = Sampling.DefaultDenom): DataFrame = {
    // ascending-group order fixes the Σ√c accumulation order — the
    // one float reduction here (engine-portable: an ORDER BY list_sum
    // reproduces it)
    val counts = df.groupBy(col(groupCol)).count()
      .orderBy(col(groupCol)).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    var total = 0.0
    counts.foreach { case (_, c) => total += math.sqrt(c.toDouble) }
    val thresholds = counts.map { case (g, c) =>
      val rate = math.min(1.0, math.sqrt(c.toDouble) / total * target.toDouble / c.toDouble)
      (g, (rate * denom).toLong)
    }
    val thrCol = thresholds.foldLeft(lit(0L): Column) {
      case (acc, (g, thr)) => when(col(groupCol) === g, lit(thr)).otherwise(acc)
    }
    df.filter(Sampling.hashBucket(col(idCol), denom) < thrCol)
  }
}
