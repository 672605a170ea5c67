package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics rollups over an activity log. Inputs are the
  * already-projected (entity, period) frame so the same operators serve
  * events at any granularity (user-day here; account-week, device-hour
  * elsewhere).
  *
  * The reference engine has nothing in this family (integer-only SELECT
  * subset, /root/reference/sqlengine.py); extension surface.
  */
object Analytics {

  /** Growth-accounting ledger over distinct (entity, period) activity:
    * each active pair is `new` (first period), `retained` (also active
    * the period before) or `resurrected` (returning after a gap);
    * churned(p) = active(p-1) − retained(p) on consecutive observed
    * periods (NULL after a global gap); cumulative entities = running
    * sum of n_new.
    *
    * Output schema is FIXED regardless of the input column names:
    * (day, n_new, n_retained, n_resurrected, n_active, n_churned,
    * cume_users) — `entityCol`/`periodCol` only select the inputs.
    *
    * Shape at 100 TB: distinct is a partial-agg shuffle on the pair;
    * the lag sorts within entity partitions (the sessionize shape); the
    * per-period rollup and both post-agg windows run on one row per
    * period — never the raw log. */
  def growthAccounting(activity: DataFrame, entityCol: String = "user_id",
      periodCol: String = "day"): DataFrame = {
    val ud = activity.select(col(entityCol), col(periodCol).as("day")).distinct()
    val wu = Window.partitionBy(col(entityCol)).orderBy(col("day"))
    val status = ud.withColumn("prev_day", lag(col("day"), 1).over(wu))
    val daily = status.groupBy("day").agg(
      sum(when(col("prev_day").isNull, 1L).otherwise(0L)).as("n_new"),
      sum(when(col("day") - col("prev_day") === 1, 1L).otherwise(0L))
        .as("n_retained"),
      sum(when(col("prev_day").isNotNull && col("day") - col("prev_day") > 1, 1L)
        .otherwise(0L)).as("n_resurrected"))
    val wd = Window.orderBy(col("day"))
    daily
      .withColumn("n_active",
        col("n_new") + col("n_retained") + col("n_resurrected"))
      .withColumn("n_churned",
        when(lag(col("day"), 1).over(wd) === col("day") - 1,
          lag(col("n_active"), 1).over(wd) - col("n_retained")))
      .withColumn("cume_users",
        sum(col("n_new")).over(wd.rowsBetween(Window.unboundedPreceding, 0)))
      .select("day", "n_new", "n_retained", "n_resurrected",
        "n_active", "n_churned", "cume_users")
  }

  /** Consecutive-day unique-user overlap by HLL SKETCH ALGEBRA
    * (Apache DataSketches via `hll_sketch_agg`/`hll_union`), beside
    * the exact answer and a tolerance verdict. The scale story is the
    * sketches' MERGEABILITY: one scan builds one ~KB sketch per day;
    * every pairwise (or any-range) union after that is sketch-only
    * arithmetic — at 100 TB you persist the per-day sketches and
    * answer overlap/retention questions without rescans forever; the
    * exact form pays a distinct-join per question. Intersection has no
    * unbiased sketch estimator, so the standard inclusion–exclusion
    * estimate is used: |A∩B| ≈ est(A) + est(B) − est(A ∪ B).
    *
    * Output, one row per day with a successor: (day, exact_overlap,
    * exact_union, within_bound) — exact values ride a distinct-pair
    * join, the verdict compares the I–E estimate against
    * max(absTol, relTol · exact_union): inclusion–exclusion compounds
    * three estimates' errors on the UNION's scale, so the bound is
    * union-relative (the ev_window_uniques honesty contract — HLL has
    * no exact sparse mode; tiny days can still be off by ones). */
  def uniqueOverlapDays(df: DataFrame, tsSec: Column, idCol: Column,
      absTol: Double = 10.0, relTol: Double = 0.05): DataFrame = {
    require(absTol >= 0 && relTol >= 0 && (absTol > 0 || relTol > 0),
      s"uniqueOverlapDays: need a positive tolerance, got $absTol/$relTol")
    // floor, not truncate-toward-zero: pre-1970 seconds must land on
    // the same day key the oracle's `// 86400` floor division produces;
    // ExactMath keeps it exact even for a (mis-fed) micros column
    val days = df.select(
      graft.functions.ExactMath.floorDiv(tsSec.cast("long"), 86400L)
        .as("day"), idCol.as("__id"))
    val sk = days.groupBy("day").agg(hll_sketch_agg(col("__id")).as("__sk"),
      count_distinct(col("__id")).as("__n"))
    val du = days.distinct()
    val exactOv = du.as("x").join(du.as("y"),
        col("y.__id") === col("x.__id") && col("y.day") === col("x.day") + 1)
      .groupBy(col("x.day").as("day")).agg(count(lit(1)).as("exact_overlap"))
    sk.as("a").join(sk.as("b"), col("b.day") === col("a.day") + 1)
      .select(col("a.day").as("day"), col("a.__n").as("__na"),
        col("b.__n").as("__nb"),
        (hll_sketch_estimate(col("a.__sk")) +
          hll_sketch_estimate(col("b.__sk")) -
          hll_sketch_estimate(hll_union(col("a.__sk"), col("b.__sk"))))
          .as("__est"))
      .join(exactOv, Seq("day"), "left")
      .na.fill(0L, Seq("exact_overlap"))
      .select(col("day"), col("exact_overlap"),
        (col("__na") + col("__nb") - col("exact_overlap")).as("exact_union"),
        col("__est"))
      .select(col("day"), col("exact_overlap"), col("exact_union"),
        (abs(col("__est") - col("exact_overlap")) <=
          greatest(lit(absTol), lit(relTol) * col("exact_union")))
          .as("within_bound"))
  }
}
