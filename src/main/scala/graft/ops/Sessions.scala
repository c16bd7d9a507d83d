package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sessionization: split each key's event stream into sessions separated
 * by inactivity gaps ≥ `gapSeconds`, then aggregate per session — the
 * classic lag → boundary-flag → running-sum → group plan.
 *
 * Scale notes: two windows over the same (key ORDER BY ts) partitioning
 * — Catalyst evaluates them in one WindowExec pass after one shuffle on
 * the key; the per-session aggregation then reuses the same hash
 * partitioning modulo the added session column (map-side partials).
 * State per key is O(1) (lag + running sum), so skewed users don't
 * blow memory — unlike collect-then-split sessionizers.
 */
object Sessions {

  /**
   * Assign `session_id` (0-based per key, in time order) to every event.
   * `orderCols` must make the per-key order total (pass an event id as
   * tiebreaker for determinism).
   */
  def assign(df: DataFrame, keys: Seq[String], tsCol: String,
      gapSeconds: Long, orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val prevTs = lag(col(tsCol), 1).over(w)
    // millisecond arithmetic: integer-exact and identical in any engine
    // (seconds-level unix_timestamp truncation is engine-dependent)
    val boundary = when(prevTs.isNull, lit(0))
      .when(unix_millis(col(tsCol)) - unix_millis(prevTs) >= gapSeconds * 1000,
        lit(1))
      .otherwise(lit(0))
    df.withColumn("session_id",
      sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session stats: event count, span millis, value sum. */
  def stats(df: DataFrame, keys: Seq[String], tsCol: String,
      valueCol: String, gapSeconds: Long,
      orderCols: Seq[String]): DataFrame = {
    val keyCols: Seq[Column] = keys.map(col) :+ col("session_id")
    assign(df, keys, tsCol, gapSeconds, orderCols)
      .groupBy(keyCols: _*)
      .agg(
        count(lit(1)).as("n_events"),
        (unix_millis(max(col(tsCol))) - unix_millis(min(col(tsCol))))
          .as("span_ms"),
        round(sum(col(valueCol)), 4).as("value_sum"))
  }
}
