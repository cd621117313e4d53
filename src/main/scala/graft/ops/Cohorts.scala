package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention analysis — the events-table workload every product
  * analytics stack runs: bucket users by their FIRST activity period
  * (the cohort), then count how many of each cohort are still active
  * 0, 1, 2, … periods later.
  *
  * Scale shape (two hash aggregations + one broadcast-friendly join,
  * nothing quadratic):
  *  1. per-user first activity period — one hash agg keyed on the user
  *     (map-side combined min);
  *  2. distinct (user, period) activity — one hash agg (dedup multiple
  *     events in a period before counting, so a chatty user counts
  *     once);
  *  3. join activity to the user's cohort (both keyed on the user — one
  *     shuffle each side, AQE broadcast if the user dimension is small)
  *     and aggregate `(cohort_period, period_offset) → distinct users`. The
  *     final count is exact distinct on the user id, keyed by a
  *     cohort×offset grid whose size is periods², independent of event
  *     volume.
  *
  * Periods are integral epoch buckets (`floor(epoch_us / periodUs)`) —
  * exact integer arithmetic, engine-replayable, timezone-free. Offset 0
  * rows ARE each cohort's size (every user is active in their first
  * period by construction), so retention RATES are `n_users /
  * cohort-size-at-offset-0` downstream.
  */
object Cohorts {

  def retention(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      periodUs: Long = 7L * 24 * 3600 * 1000000 // weekly
  ): DataFrame = {
    require(periodUs > 0, s"periodUs must be positive, got $periodUs")
    val period = floor(unix_micros(col(tsCol)) / periodUs).cast("long")
    val activity = events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("_u"), period.as("_p"))
      .distinct()
    val cohorts = activity.groupBy(col("_u")).agg(min(col("_p")).as("_cohort"))
    activity
      .join(cohorts, Seq("_u"))
      .groupBy(col("_cohort").as("cohort_period"), (col("_p") - col("_cohort")).as("period_offset"))
      .agg(countDistinct(col("_u")).as("n_users"))
  }
}
