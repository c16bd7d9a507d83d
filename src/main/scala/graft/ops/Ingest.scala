package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Source normalization: turn a raw event/bar feed into exactly one row per
 * (key, day).
 *
 * Reference semantics: the ingest loop requests up to 5 aggregate bars per
 * ticker but keeps only the first (reference `dags/dag.py:80-109`, `break`
 * at `:109`) — i.e. source truncation to one bar per (ticker, day). Here
 * that is a distributed `row_number() === 1` over a (key, day) window, not
 * a driver-side loop: at 100 TB the dedup shuffles once on the composite
 * key and never collects.
 */
object Ingest {

  /**
   * Keep the first row per (keys..., day(tsCol)) ordered by `orderCols`
   * (which must be unique per group for determinism — pass a tiebreaker
   * such as an event id).
   */
  def firstPerDay(df: DataFrame, keys: Seq[String], tsCol: String,
      orderCols: Seq[String]): DataFrame = {
    val w = Window
      .partitionBy((keys.map(col) :+ to_date(col(tsCol))): _*)
      .orderBy(orderCols.map(col): _*)
    df.withColumn("date", to_date(col(tsCol)))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /**
   * Generic first-row-per-key dedup: keep the first row per `keys`
   * ordered by `orderCols` (must be unique per group for determinism).
   */
  def firstPerKey(df: DataFrame, keys: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /**
   * Aggregate a tick-level stream into daily OHLCV bars per key:
   * open/close = value at min/max `idCol` within the day (the id must be
   * unique and time-ordered within a group), high/low = max/min value,
   * volume = row count. Single hash-aggregate: one shuffle on
   * (keys..., date), map-side partial aggregation included — scales
   * linearly with input and never materializes per-day row lists.
   */
  def dailyBars(df: DataFrame, keys: Seq[String], tsCol: String,
      valueCol: String, idCol: String): DataFrame = {
    val v = col(valueCol)
    df.groupBy((keys.map(col) :+ to_date(col(tsCol)).as("date")): _*)
      .agg(
        min_by(v, col(idCol)).as("open"),
        max(v).as("high"),
        min(v).as("low"),
        max_by(v, col(idCol)).as("close"),
        count(lit(1)).as("volume"))
  }

  /**
   * Re-aggregate finer-grain OHLCV bars into a coarser calendar bucket
   * (daily → weekly/monthly): open/close = the open/close of the
   * earliest/latest contributing bar by `dateCol`, high/low = extrema,
   * volume = sum — the bar-algebra composition a consumer of the
   * reference's cumulative daily table runs to chart coarser frames
   * (reference context: the daily bar store at `dags/dag.py:141-151`).
   * `bucket` is any deterministic date expression (e.g.
   * `date_trunc("week", col("date"))`); the output keeps it under
   * `bucketName`.
   *
   * Scale: ONE hash aggregate shuffled on (keys..., bucket) with
   * map-side partial agg — input is bar-count-sized (already ≪ ticks),
   * state per group is O(1), and no window pass is needed because
   * min_by/max_by carry the open/close picks through the combine.
   */
  def resampleBars(bars: DataFrame, keys: Seq[String], dateCol: String,
      bucket: Column, bucketName: String = "bucket"): DataFrame =
    bars.groupBy((keys.map(col) :+ bucket.as(bucketName)): _*)
      .agg(
        min_by(col("open"), col(dateCol)).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), col(dateCol)).as("close"),
        sum(col("volume")).as("volume"))

  /**
   * Stamp ingestion time (reference `CURRENT_TIMESTAMP` at
   * `dags/dag.py:103`). Kept separate so verified outputs can skip it —
   * it is nondeterministic by design.
   */
  def stampInsertion(df: DataFrame, at: Column = current_timestamp()): DataFrame =
    df.withColumn("insertion_timestamp", at)
}
