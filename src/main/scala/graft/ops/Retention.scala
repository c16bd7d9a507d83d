package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Cohort retention: users grouped by first-activity day (their cohort),
 * counted on each subsequent active day as an offset from the cohort
 * day, with retention as a fraction of the cohort's size.
 *
 * Scale shape: two user-keyed hash aggregates (first-day per user, then
 * distinct (user, day)) that share one shuffle key, a co-partitioned
 * join, and a final aggregate whose output is bounded by
 * #cohort-days × #offsets — calendar-sized, not data-sized. The
 * per-(cohort, offset) count uses count(*), not count(DISTINCT user):
 * the (user, day) frame is already distinct and a user has exactly one
 * cohort, so the distinct expansion would be pure overhead. The
 * cohort-size denominator comes from a window over the calendar-sized
 * result (every user is active on their own day 0, so offset 0 IS the
 * cohort size), not from another pass over the data.
 */
object Retention {

  def cohorts(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val user = col(userCol)
    val day = to_date(col(tsCol))
    val firstDay = events.groupBy(user)
      .agg(min(day).as("cohort_day"))
    val activeDays = events.select(user, day.as("active_day")).distinct()
    val grid = activeDays.join(firstDay, userCol)
      .groupBy(col("cohort_day"),
        datediff(col("active_day"), col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
    val wCohort = Window.partitionBy(col("cohort_day"))
    grid
      .withColumn("cohort_size",
        max(when(col("day_offset") === 0, col("n_users"))).over(wCohort))
      .withColumn("retention",
        round(col("n_users").cast("double") / col("cohort_size"), 4))
  }

  /**
   * Rolling distinct-active-user counts (WAU-style): for every observed
   * activity day, the number of distinct users active in the trailing
   * `window` days.
   *
   * Exact sliding DISTINCT does not decompose into window partials
   * (distinct is not subtractable), and the collect_set-over-window
   * formulation buffers every active user id of the window per day on
   * one reducer — the classic rolling-MAU OOM. The scalable exact
   * shape instead: dedup activity to (user, day) once, EXPLODE each
   * pair into the `window` report days it contributes to, and
   * count-distinct per report day. Work scales linearly with
   * window × distinct activity pairs; the count itself is a standard
   * two-phase distinct aggregate per day — nothing holds a whole
   * window's user set in one task's memory. (When window × activity is
   * still too hot, the approximate path is per-day HLL partials
   * unioned over the window — same sketch family as
   * `Profile.numericApprox`.)
   *
   * Report days are restricted to observed activity days (a broadcast
   * semi-join against the tiny distinct-day frame), so the output is a
   * well-defined function of the data, not of the explode horizon.
   */
  def rollingActiveUsers(events: DataFrame, userCol: String,
      tsCol: String, window: Int = 7): DataFrame = {
    require(window >= 1, "window must be at least 1 day")
    val pairs = events
      .select(col(userCol).as("__user"), to_date(col(tsCol)).as("__day"))
      .distinct()
    val days = pairs.select(col("__day").as("report_day")).distinct()
    pairs
      .select(col("__user"), explode(sequence(col("__day"),
        date_add(col("__day"), window - 1))).as("report_day"))
      .join(broadcast(days), Seq("report_day"), "left_semi")
      .groupBy("report_day")
      .agg(countDistinct(col("__user")).as("active_users"))
  }
}
