package graft

import java.time.LocalDate

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Rolling
import graft.pipeline.StatefulRolling
import graft.pipeline.StatefulRolling.BarIn

/**
 * The stateful incremental operator must reproduce the batch window
 * (`Rolling.metrics`) row-for-row when bars arrive in date order across
 * micro-batches — including weekend gaps shrinking the frame and
 * same-day re-sends replacing state idempotently.
 */
class StatefulRollingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val tickers = Seq("AAPL", "META")
  private val days = (1 to 12).map(d => LocalDate.of(2024, 5, d))
    .filterNot(d => d.getDayOfWeek.getValue >= 6)

  private def bar(t: String, ds: LocalDate): BarIn = {
    val base = 50.0 + t.length + ds.getDayOfMonth * 2
    BarIn(t, java.sql.Date.valueOf(ds), base - 1, base + 2, base - 3, base,
      500L + ds.getDayOfMonth)
  }

  test("incremental state output equals batch window over multi-batch arrival") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[BarIn]
    val q = StatefulRolling(stream.toDS()).writeStream
      .format("memory").queryName("cum_inc").outputMode("append").start()

    // three micro-batches split mid-stream; each batch is date-ordered
    val (b1, rest) = days.splitAt(3)
    val (b2, b3) = rest.splitAt(4)
    for (batch <- Seq(b1, b2, b3)) {
      stream.addData(batch.flatMap(d => tickers.map(t => bar(t, d))))
      q.processAllAvailable()
    }
    q.stop()

    val got = spark.table("cum_inc")
      .orderBy("ticker", "date")
      .select("ticker", "date", "last_7_days_close", "last_7_days_volume",
        "avg_7_day_volume", "volatility_7_day")

    // the incremental EWMA must be BIT-identical to the batch operator
    // (same dyadic weights, same fold order) over its ROWS frame
    val ewmaBatch = Rolling.ewmaHalfLife(
        days.flatMap(d => tickers.map(t => bar(t, d))).toDF(),
        Seq("ticker"), "date", "close", window = 7, outCol = "ewma_close")
      .select("ticker", "date", "ewma_close")
      .as[(String, java.sql.Date, Double)].collect()
      .map(t => (t._1, t._2.toString) -> t._3).toMap
    spark.table("cum_inc").select("ticker", "date", "ewma_close")
      .as[(String, java.sql.Date, Double)].collect()
      .foreach { case (t, d, v) =>
        assert(v == ewmaBatch((t, d.toString)), s"ewma mismatch at ($t, $d)")
      }

    // the batch baseline is the PIPELINE's per-day shape (Rolling.forDay:
    // trailing 8-calendar-day pre-filter), which is what the cumulative
    // table holds — not the unbounded generalized Rolling.metrics
    val batchBars = days.flatMap(d => tickers.map(t => bar(t, d))).toDF()
    val expected = days.map(d =>
        Rolling.forDay(batchBars, d, Seq("ticker"), "date",
          Seq("close", "volume"), "volume", "close"))
      .reduce(_ unionAll _)
      .orderBy("ticker", "date")
      .select("ticker", "date", "last_7_days_close", "last_7_days_volume",
        "avg_7_day_volume", "volatility_7_day")

    val g = got.collect().toSeq
    val e = expected.collect().toSeq
    assert(g.size == e.size)
    g.zip(e).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0) && a.getDate(1) == b.getDate(1))
      assert(a.getSeq[Double](2) == b.getSeq[Double](2))
      assert(a.getSeq[Long](3) == b.getSeq[Long](3))
      assert(math.abs(a.getDouble(4) - b.getDouble(4)) < 1e-9)
      assert(math.abs(a.getDouble(5) - b.getDouble(5)) < 1e-9)
    }
  }

  test("same-day re-send replaces state instead of growing the frame") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[BarIn]
    val q = StatefulRolling(stream.toDS()).writeStream
      .format("memory").queryName("cum_resend").outputMode("append").start()
    val d = LocalDate.of(2024, 6, 3)
    stream.addData(Seq(bar("AAPL", d)))
    q.processAllAvailable()
    stream.addData(Seq(bar("AAPL", d), bar("AAPL", d.plusDays(1))))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("cum_resend")
      .where(col("date") === java.sql.Date.valueOf(d.plusDays(1)))
      .select("last_7_days_close").head()
    assert(rows.getSeq[Double](0).size == 2) // day + next day, no duplicate
  }

  test("cross-batch late bar emits EWMA over bars <= its own date only") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[BarIn]
    val q = StatefulRolling(stream.toDS()).writeStream
      .format("memory").queryName("cum_late").outputMode("append").start()
    val d1 = LocalDate.of(2024, 7, 1)
    val (b1, b2, b3) = (bar("AAPL", d1), bar("AAPL", d1.plusDays(1)),
      bar("AAPL", d1.plusDays(2)))
    // day 2 arrives a micro-batch AFTER day 3 — its emitted row must not
    // see day 3's close in the EWMA (batch ROWS-frame parity)
    stream.addData(Seq(b1, b3)); q.processAllAvailable()
    stream.addData(Seq(b2)); q.processAllAvailable()
    q.stop()
    val got = spark.table("cum_late")
      .where(col("date") === b2.date).select("ewma_close").head().getDouble(0)
    assert(got == (b1.close * 1 + b2.close * 2) / 3.0,
      s"late-bar EWMA must cover [day1, day2] only, got $got")
  }
}
