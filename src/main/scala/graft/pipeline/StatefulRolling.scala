package graft.pipeline

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Incremental rolling 7-day metrics as a stateful streaming operator
 * (`flatMapGroupsWithState`): per-ticker state holds only the trailing
 * ≤7 observed bars, and every arriving bar emits its cumulative row
 * directly — no re-scan of the production table per day (the batch
 * path's `Rolling.forDay` reads the trailing 8-day slice each run; this
 * derives the same rows from O(7) state per key).
 *
 * Semantics match the reference window exactly (`dags/dag.py:385-437`
 * via ops/Rolling.scala): frame = the ≤7 most recent observed rows
 * within the trailing 8 CALENDAR days ending at the bar's date
 * (weekend/holiday gaps shrink the frame), arrays oldest→newest,
 * avg(volume), sample stddev(close) with 1-row frames coalesced to 0.
 *
 * Ordering contract: bars must arrive in ascending date order PER KEY
 * across micro-batches (the pipeline's strict daily ordering —
 * `depends_on_past` in the reference, `dags/dag.py:289`); within a
 * batch any order is fine (sorted here). Backfills that rewrite history
 * go through the batch path, which is idempotent per partition.
 *
 * State size: 7 bars × ~48 bytes per key — bounded, no timeout needed
 * for a finite ticker universe; pass a timeout config for unbounded key
 * spaces.
 *
 * Output semantics: a CHANGELOG. A same-day re-send replaces state
 * idempotently and emits a REVISED row for that (ticker, date); append
 * sinks therefore hold every revision, and downstream consumers keep
 * the last row per (ticker, date) (the pipeline's partition-overwrite
 * sink does exactly that).
 */
object StatefulRolling {

  case class BarIn(ticker: String, date: java.sql.Date, open: Double,
      high: Double, low: Double, close: Double, volume: Long)

  /** Compact in-state bar (epoch day keeps the state flat). */
  case class BarLite(epochDay: Long, open: Double, high: Double,
      low: Double, close: Double, volume: Long)

  case class RollState(bars: List[BarLite])

  case class CumulativeOut(ticker: String, date: java.sql.Date,
      last_7_days_open: Seq[Double], last_7_days_high: Seq[Double],
      last_7_days_low: Seq[Double], last_7_days_close: Seq[Double],
      last_7_days_volume: Seq[Long], avg_7_day_volume: Double,
      volatility_7_day: Double, ewma_close: Double)

  private def stddevSamp(xs: Seq[Double]): Double =
    if (xs.size <= 1) 0.0
    else {
      val mean = xs.sum / xs.size
      math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (xs.size - 1))
    }

  /** Bit-identical to `Rolling.ewmaHalfLife`: weight 2^i for the
    * i-th-oldest close (exact double scaling), left fold from 0.0,
    * normalized by 2^m − 1. NOTE the frame difference: the EWMA is over
    * the ≤7 most recent OBSERVED bars (the batch query's ROWS frame),
    * while the reference arrays use the trailing-8-CALENDAR-day frame —
    * both semantics ride in one emitted row. */
  private def ewmaDyadic(closes: Seq[Double]): Double =
    closes.zipWithIndex
      .foldLeft(0.0) { case (a, (x, i)) => a + x * (1L << i).toDouble } /
      ((1L << closes.size) - 1).toDouble

  private def emit(ticker: String, frame: Seq[BarLite],
      rowsFrame: Seq[BarLite], date: java.sql.Date): CumulativeOut =
    CumulativeOut(ticker, date,
      frame.map(_.open), frame.map(_.high), frame.map(_.low),
      frame.map(_.close), frame.map(_.volume),
      frame.map(_.volume.toDouble).sum / frame.size,
      stddevSamp(frame.map(_.close)),
      ewmaDyadic(rowsFrame.map(_.close)))

  /** The state-transition function (exposed for testing). */
  def update(ticker: String, in: Iterator[BarIn],
      state: GroupState[RollState]): Iterator[CumulativeOut] = {
    var bars = state.getOption.map(_.bars).getOrElse(Nil)
    val out = in.toSeq.sortBy(_.date.toLocalDate.toEpochDay).map { b =>
      val d = b.date.toLocalDate.toEpochDay
      val lite = BarLite(d, b.open, b.high, b.low, b.close, b.volume)
      // replace any same-day bar (idempotent re-send), keep ≤7 most recent
      bars = (bars.filterNot(_.epochDay == d) :+ lite)
        .sortBy(_.epochDay).takeRight(7)
      // reference frame: ≤7 rows within the trailing 8-calendar-day
      // range; EWMA frame: the ≤7 most recent observed rows NOT NEWER
      // than the emitted date — without the <= d filter, a bar arriving
      // a micro-batch late would emit an EWMA polluted by bars dated
      // after its own date, breaking parity with the batch ROWS frame
      emit(ticker, bars.filter(x => x.epochDay >= d - 7 && x.epochDay <= d),
        bars.filter(_.epochDay <= d).takeRight(7), b.date)
    }
    state.update(RollState(bars))
    out.iterator
  }

  /** Wire the operator over a (streaming or batch) Dataset of bars. */
  def apply(bars: Dataset[BarIn]): Dataset[CumulativeOut] = {
    implicit val stateEnc = Encoders.product[RollState]
    implicit val outEnc = Encoders.product[CumulativeOut]
    implicit val keyEnc = Encoders.STRING
    bars.groupByKey(_.ticker)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }
}
