package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series regularization: resample an irregular per-key daily series
 * onto a dense calendar spine and forward-fill the gaps — the missing-
 * trading-day treatment the reference leaves implicit (its rolling
 * window simply skips absent weekend rows, SURVEY.md §2.6; gap-filling
 * is the other standard policy, and a training-data pipeline needs both).
 *
 * Scale shape: the spine is generated distributed — `sequence()` +
 * `explode` per key, sized by each key's own [min, max] date range, so
 * no key pays for another key's history. One shuffle builds the spine
 * bounds (tiny: 2 dates per key), the observations join onto the spine
 * by (key, date), and the forward-fill window sorts within the same
 * key partitioning. Nothing is collected; per-key state in the window
 * is O(1) (`last` with ignoreNulls over an unbounded-preceding frame).
 */
object Resample {

  /**
   * Dense daily spine per key over each key's observed [min, max] date
   * range, with `valueCols` forward-filled from the most recent observed
   * row and an `observed` flag marking real rows. The first spine day of
   * every key is observed by construction, so forward-fill never emits
   * a leading null.
   *
   * Observed rows ALWAYS keep their original value — including a
   * legitimate NULL (a bare `last(ignoreNulls)` over every row would
   * overwrite an observed null with the prior day's value). An observed
   * null also becomes the fill source: gap days after it are null until
   * the next observation, matching "the most recent observed row", not
   * "the most recent non-null value". (The struct wrap below is what
   * lets `last(ignoreNulls)` distinguish "no observation" from
   * "observed null": the struct is non-null whenever the row is
   * observed, whatever its payload.)
   */
  def dailyFfill(df: DataFrame, keys: Seq[String], dateCol: String,
      valueCols: Seq[String]): DataFrame = {
    val k = keys.map(col)
    val spine = df.groupBy(k: _*)
      .agg(min(col(dateCol)).as("__d0"), max(col(dateCol)).as("__d1"))
      .select(k :+ explode(sequence(col("__d0"), col("__d1")))
        .as(dateCol): _*)
    val ffillW = Window.partitionBy(k: _*).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = spine.join(
      df.select(((keys :+ dateCol) ++ valueCols).map(col) :+
        lit(true).as("__obs"): _*),
      keys :+ dateCol, "left")
    valueCols.foldLeft(
        joined.withColumn("observed", coalesce(col("__obs"), lit(false)))
          .drop("__obs")) { (acc, c) =>
        acc.withColumn(c,
          when(col("observed"), col(c)).otherwise(
            last(when(col("observed"), struct(col(c).as("v"))),
              ignoreNulls = true).over(ffillW)("v")))
      }
  }

  /**
   * Trailing calendar-interval window aggregates — the RANGE-frame
   * complement of `Rolling.metrics`' ROWS frame: "the last `days`
   * calendar days" rather than "the last 7 observed rows". On a gappy
   * series the two genuinely differ (a Monday row sees 7 prior rows but
   * only the rows within the calendar week in RANGE mode). The frame
   * orders by day number (`unix_date`) so the range arithmetic is exact
   * integer math in every engine.
   */
  def trailingRange(df: DataFrame, keys: Seq[String], dateCol: String,
      valueCol: String, days: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(unix_date(col(dateCol)))
      .rangeBetween(-(days - 1), Window.currentRow)
    df.withColumn(s"n_in_range", count(lit(1)).over(w))
      .withColumn(s"avg_in_range", avg(col(valueCol)).over(w))
      .withColumn(s"max_in_range", max(col(valueCol)).over(w))
  }

  /** Linear interpolation variant of `dailyFfill` for one numeric
    * column: gaps get the straight line between the surrounding observed
    * values (the forward-fill's step function is right for state-like
    * series, interpolation for continuous measures). Same plan shape —
    * spine + two windows over one key partitioning.
    *
    * Same observed-row contract as `dailyFfill`: an observed row ALWAYS
    * keeps its original value, including an observed NULL. Interpolation
    * anchors are the surrounding NON-NULL observations on both the date
    * and value axes — an observed-NULL row contributes neither (a
    * one-sided anchor would distort the slope across it), so gap days
    * interpolate straight across it between the non-null endpoints.
    * Gaps after the last non-null observation forward-fill from it; gaps
    * before the first one stay null. */
  def dailyInterpolate(df: DataFrame, keys: Seq[String], dateCol: String,
      valueCol: String): DataFrame = {
    val k = keys.map(col)
    val filled = dailyFfill(df, keys, dateCol, Seq(valueCol))
    val byKey = Window.partitionBy(k: _*).orderBy(col(dateCol))
    val fwd = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bwd = byKey.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // dailyFfill preserved observed values verbatim, so "observed and
    // non-null" identifies exactly the rows fit to anchor a segment.
    val anchor = col("observed") && col(valueCol).isNotNull
    val obsDate = when(anchor, col(dateCol))
    val obsVal = when(anchor, col(valueCol))
    filled
      .withColumn("__d_prev", last(obsDate, ignoreNulls = true).over(fwd))
      .withColumn("__v_prev", last(obsVal, ignoreNulls = true).over(fwd))
      .withColumn("__d_next", first(obsDate, ignoreNulls = true).over(bwd))
      .withColumn("__v_next", first(obsVal, ignoreNulls = true).over(bwd))
      .withColumn(valueCol,
        when(col("observed"), col(valueCol))
          .when(col("__d_next").isNull, col("__v_prev"))
          .otherwise(col("__v_prev") +
            (col("__v_next") - col("__v_prev")) *
            (unix_date(col(dateCol)) - unix_date(col("__d_prev"))) /
            (unix_date(col("__d_next")) - unix_date(col("__d_prev")))))
      .drop("__d_prev", "__v_prev", "__d_next", "__v_next")
  }
}
