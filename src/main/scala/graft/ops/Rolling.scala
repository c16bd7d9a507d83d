package graft.ops

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Trailing-N-row rolling metrics — the reference's flagship derivation
 * (reference `dags/dag.py:385-437`): per-key window ordered by date,
 * `ROWS BETWEEN 6 PRECEDING AND CURRENT ROW`, materializing trailing
 * arrays of each value column plus avg(volume) and sample-stddev(close)
 * with NULL→0 coalesce for 1-row frames (reference `dags/dag.py:416,433`).
 *
 * Scale notes: the window shuffles once on the key columns; state per key
 * is bounded (N rows) so WindowExec never spills frames. The per-day
 * variant (`forDay`) pre-filters the scan to the trailing 8-calendar-day
 * range *before* windowing (reference `dags/dag.py:399-400`) — that
 * hand-pushed range predicate is load-bearing: Catalyst pushes the final
 * `date = ds` filter down, but cannot widen it through the window into a
 * range, so without the pre-filter a daily run would scan all history.
 * With date-partitioned storage the range filter prunes to 8 partitions.
 */
object Rolling {

  /**
   * Rolling metrics for every row of `bars` (one row per (keys..., date)
   * required; dates need not be contiguous — the frame is over *observed*
   * rows, matching the reference's trading-day semantics).
   */
  def metrics(bars: DataFrame, keys: Seq[String], dateCol: String,
      arrayCols: Seq[String], volumeCol: String, closeCol: String,
      n: Int = 7): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(dateCol))
      .rowsBetween(-(n - 1), Window.currentRow)
    val withArrays = arrayCols.foldLeft(bars) { (df, c) =>
      // collect_list over an ordered ROWS frame is deterministic and
      // frame-ordered (oldest→newest), matching ARRAY_AGG OVER w.
      df.withColumn(s"last_${n}_days_$c", collect_list(col(c)).over(w))
    }
    withArrays
      .withColumn(s"avg_${n}_day_volume", avg(col(volumeCol)).over(w))
      .withColumn(s"volatility_${n}_day",
        coalesce(stddev_samp(col(closeCol)).over(w), lit(0.0)))
  }

  /**
   * Dyadic exponentially-weighted trailing average (half-life = one
   * bar): weight 2^i for the i-th-oldest row of the trailing `window`
   * frame, normalized by 2^m − 1 — the recency-weighted smoothing of a
   * price/metric series, stated so every arithmetic step is exact or
   * order-fixed. Weights are integer powers of two via `shiftleft`
   * (multiplying a double by 2^i is exact scaling — no `pow`, whose
   * libm rounding differs across engines), and the weighted sum folds
   * left-to-right over the frame-ordered array, so any engine replaying
   * the same fold reproduces the doubles bit-for-bit.
   *
   * A general-α EWMA over unbounded history is inherently sequential
   * per key (x̄_t = αx + (1−α)x̄_{t−1}); the windowed dyadic form keeps
   * the operator frame-bounded (O(window) state, same single shuffle as
   * `metrics`) and covers the smoothing use while staying distributed
   * and oracle-portable.
   */
  def ewmaHalfLife(bars: DataFrame, keys: Seq[String], dateCol: String,
      valueCol: String, window: Int = 7, outCol: String = "ewma"): DataFrame = {
    require(window >= 1 && window <= 62, "window in [1, 62] (weights fit a long)")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(dateCol))
      .rowsBetween(-(window - 1), Window.currentRow)
    bars
      .withColumn("__arr", collect_list(col(valueCol).cast("double")).over(w))
      .withColumn(outCol, expr(
        """aggregate(transform(__arr, (x, i) -> x * cast(shiftleft(1L, i) as double)),
          |          0D, (a, v) -> a + v)
          |  / cast(shiftleft(1L, size(__arr)) - 1 as double)""".stripMargin))
      .drop("__arr")
  }

  /**
   * The reference's exact per-run shape: restrict the scan to the trailing
   * (n+1)-calendar-day inclusive range ending at `ds` (8 days for n=7 —
   * reference `dags/dag.py:399-400`), window, then keep only `ds` rows
   * (reference `dags/dag.py:436`).
   */
  def forDay(bars: DataFrame, ds: LocalDate, keys: Seq[String],
      dateCol: String, arrayCols: Seq[String], volumeCol: String,
      closeCol: String, n: Int = 7): DataFrame = {
    val d = lit(java.sql.Date.valueOf(ds))
    val pre = bars.where(col(dateCol).between(date_sub(d, n), d))
    metrics(pre, keys, dateCol, arrayCols, volumeCol, closeCol, n)
      .where(col(dateCol) === d)
  }
}
