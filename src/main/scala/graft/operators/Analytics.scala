package graft.operators

import org.apache.spark.sql.{DataFrame}
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
}
