package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Ordered-step funnel analysis over an event stream: for a step sequence
 * like view → click → purchase, find per user the earliest time each
 * step can complete IN ORDER (step i counts only strictly after the
 * earliest completion of step i−1 — the greedy earliest-completion
 * semantics every funnel product uses), then aggregate users reached per
 * step.
 *
 * Scale shape: ONE user-keyed shuffle total. Each step is a conditional
 * cumulative min over the same (user, ts) sort — Catalyst stacks the
 * Window operators over a single Exchange+Sort because partitioning and
 * ordering never change. Per-row state is O(#steps) timestamps; nothing
 * buffers a user's event history (the collect_list formulation dies on
 * power users at 100 TB), and the final per-user reduction is an
 * ordinary partial-aggregating groupBy. #steps is small and fixed — the
 * plan grows linearly in it, the data never re-shuffles.
 *
 * Determinism: the cumulative min at a row depends only on the SET of
 * rows at-or-before it in (ts, tieBreak) order, and ties in ts resolve
 * by tieBreak, so the result is insensitive to physical row order.
 */
object Funnel {

  /** Per-user earliest in-order completion time for each step:
    * (user, step_ts_0 … step_ts_{k−1}); a NULL step_ts_i means the user
    * never reached step i. */
  def completionTimes(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], tieBreak: String): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // __f_i at a row = earliest ts so far of a step-i event that occurred
    // strictly after the (then-known) earliest step-(i−1) completion.
    // Each withColumn is its own projection, so step i's condition reads
    // step i−1's already-materialized column — same window, no reshuffle.
    val chained = steps.zipWithIndex.foldLeft(events) {
      case (df, (step, i)) =>
        val hit = col(typeCol) === lit(step)
        val inOrder = if (i == 0) hit
          else hit && col(s"__f_${i - 1}").isNotNull &&
            col(tsCol) > col(s"__f_${i - 1}")
        df.withColumn(s"__f_$i", min(when(inOrder, col(tsCol))).over(w))
    }
    // The cumulative min is non-increasing along the frame, so the
    // group-min IS the final (whole-partition) value at the last row.
    chained.groupBy(col(userCol))
      .agg(min(col("__f_0")).as("step_ts_0"),
        (1 until steps.size).map(i =>
          min(col(s"__f_$i")).as(s"step_ts_$i")): _*)
  }

  /** Funnel conversion report: one row per step with the number of users
    * whose in-order journey reached it (monotone non-increasing). */
  def conversion(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], tieBreak: String): DataFrame = {
    val per = completionTimes(events, userCol, tsCol, typeCol, steps, tieBreak)
    val counts = per.agg(
      count(when(col("step_ts_0").isNotNull, lit(1))).as("n_0"),
      (1 until steps.size).map(i =>
        count(when(col(s"step_ts_$i").isNotNull, lit(1))).as(s"n_$i")): _*)
    // k tiny literal rows out of one scalar aggregate row — unpivot via
    // explode keeps it a single job (k is 3, not a data dimension).
    val stepCols = steps.zipWithIndex.map { case (step, i) =>
      struct(lit(i + 1).as("step"), lit(step).as("step_type"),
        col(s"n_$i").as("n_users"))
    }
    counts.select(explode(array(stepCols: _*)).as("r"))
      .select(col("r.step"), col("r.step_type"), col("r.n_users"))
  }
}
