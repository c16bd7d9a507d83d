package graft

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Pipeline, PipelineConfig, Streaming}

/**
 * The streaming variant must produce byte-identical tables to the batch
 * `Pipeline.runDay` path on the same feed (SURVEY §2.11): same
 * production rows, same cumulative rolling metrics, duplicate bars
 * deduped, incremental restarts processing only new files.
 */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val tickers = Seq("AAPL", "AMZN", "NFLX", "GOOGL", "META")
  private val days = (1 to 9).map(d => LocalDate.of(2024, 3, d))
    .filterNot(d => d.getDayOfWeek.getValue >= 6)

  private def feed(ds: LocalDate): DataFrame = {
    val rows = tickers.zipWithIndex.map { case (t, i) =>
      val base = 200.0 + 10 * i + ds.getDayOfMonth
      (t, java.sql.Date.valueOf(ds), base - 1, base + 2, base - 3, base,
        2000L + i, base + 0.5, ds.toEpochDay * 86400000L, 20 + i)
    }
    rows.toDF("ticker", "date", "open", "high", "low", "close",
      "volume", "vwap", "event_ts", "transactions")
  }

  private def sortedRows(df: DataFrame): Seq[org.apache.spark.sql.Row] =
    df.drop("insertion_timestamp", "updated_at")
      .orderBy("ticker", "date")
      .select(df.drop("insertion_timestamp", "updated_at")
        .columns.sorted.map(col): _*)
      .collect().toSeq

  test("streaming AvailableNow run equals batch runDay output, dedupes, resumes") {
    val root = Files.createTempDirectory("graft_stream").toString
    val in = s"$root/in"
    new java.io.File(in).mkdirs()

    // feed files: one per day, first day duplicated (dedup must collapse)
    days.foreach { ds =>
      feed(ds).write.mode("append").parquet(in)
    }
    feed(days.head).write.mode("append").parquet(in) // exact duplicates

    val streamCfg = PipelineConfig(s"$root/sprod", s"$root/scum")
    val q = Streaming.run(spark, in, feed(days.head).schema, streamCfg,
      s"$root/ckpt")
    q.awaitTermination()

    // batch reference over the identical feed
    val batchCfg = PipelineConfig(s"$root/bprod", s"$root/bcum")
    val pipe = new Pipeline(spark, batchCfg)
    days.foreach(ds => pipe.runDay(ds, feed))

    val sProd = spark.read.parquet(streamCfg.productionPath)
    val bProd = spark.read.parquet(batchCfg.productionPath)
    assert(sProd.count() == tickers.size * days.size) // duplicates collapsed
    assert(sortedRows(sProd) == sortedRows(bProd))
    assert(sortedRows(spark.read.parquet(streamCfg.cumulativePath)) ==
      sortedRows(spark.read.parquet(batchCfg.cumulativePath)))

    // incremental restart: a new day's file → only it is processed, and
    // the rolling metrics pick up the new date
    val extra = LocalDate.of(2024, 3, 11)
    feed(extra).write.mode("append").parquet(in)
    val q2 = Streaming.run(spark, in, feed(extra).schema, streamCfg,
      s"$root/ckpt")
    q2.awaitTermination()
    pipe.runDay(extra, feed)
    assert(sortedRows(spark.read.parquet(streamCfg.productionPath)) ==
      sortedRows(spark.read.parquet(batchCfg.productionPath)))
    assert(sortedRows(spark.read.parquet(streamCfg.cumulativePath)) ==
      sortedRows(spark.read.parquet(batchCfg.cumulativePath)))
  }
}
