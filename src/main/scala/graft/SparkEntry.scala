package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Ingest, Rolling}
import graft.sources.Tables

/**
 * Driver contract: one `queries` entry per implemented operator from
 * SURVEY.md §2 (+ §7.5 extensions), each with equivalent DuckDB ANSI SQL
 * in `oracleSql` where expressible.
 *
 * Determinism rules (SURVEY.md §5.2): every verified query sorts its
 * output on a full key, excludes wall-clock columns, breaks window-order
 * ties with a unique id, and rounds cross-engine float aggregates to a
 * granularity far coarser than the engines' numeric divergence.
 */
object SparkEntry {

  private def read(spark: SparkSession, dir: String, table: String): DataFrame =
    Tables.load(spark, dir, table)

  /** Flagship on sf0.001 — rolling 7-day metrics; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    rolling7Day(spark, "/root/testdata/sf0.001")

  /**
   * The reference's flagship derivation (reference `dags/dag.py:385-437`)
   * realized on testdata: events re-keyed as a price stream —
   * (user_id, event_type) ≙ ticker, day(ts) ≙ date, value ≙ price,
   * per-day row count ≙ volume. Computed for all dates (the generalized
   * form of the per-ds query; `Rolling.forDay` gives the per-run shape).
   */
  private def rolling7Day(spark: SparkSession, dir: String): DataFrame = {
    val keys = Seq("user_id", "event_type")
    val bars = Ingest.dailyBars(read(spark, dir, "events"), keys,
      tsCol = "ts", valueCol = "value", idCol = "event_id")
    Rolling.metrics(bars, keys, dateCol = "date",
        arrayCols = Seq("open", "high", "low", "close", "volume"),
        volumeCol = "volume", closeCol = "close")
      .select(col("user_id"), col("event_type"), col("date"),
        col("last_7_days_open"), col("last_7_days_high"),
        col("last_7_days_low"), col("last_7_days_close"),
        col("last_7_days_volume"),
        round(col("avg_7_day_volume"), 4).as("avg_7_day_volume"),
        round(col("volatility_7_day"), 4).as("volatility_7_day"))
      .orderBy("user_id", "event_type", "date")
  }

  /** Source normalization S1+O2: first event per (key, day). */
  private def ingestNormalize(spark: SparkSession, dir: String): DataFrame =
    Ingest.firstPerDay(read(spark, dir, "events"),
        keys = Seq("user_id", "event_type"), tsCol = "ts",
        orderCols = Seq("ts", "event_id"))
      .select("user_id", "event_type", "date", "event_id", "value")
      .orderBy("user_id", "event_type", "date")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rolling_7day" -> ((s, dir) => rolling7Day(s, dir)),
    "ingest_normalize" -> ((s, dir) => ingestNormalize(s, dir))
  )

  def oracleSql: Map[String, String] = Map(
    "rolling_7day" ->
      """WITH bars AS (
        |  SELECT user_id, event_type, CAST(ts AS DATE) AS date,
        |         arg_min(value, event_id) AS open,
        |         max(value) AS high,
        |         min(value) AS low,
        |         arg_max(value, event_id) AS close,
        |         count(*) AS volume
        |  FROM events
        |  GROUP BY 1, 2, 3
        |)
        |SELECT user_id, event_type, date,
        |       list(open)   OVER w AS last_7_days_open,
        |       list(high)   OVER w AS last_7_days_high,
        |       list(low)    OVER w AS last_7_days_low,
        |       list(close)  OVER w AS last_7_days_close,
        |       list(volume) OVER w AS last_7_days_volume,
        |       round(avg(volume) OVER w, 4) AS avg_7_day_volume,
        |       round(coalesce(stddev_samp(close) OVER w, 0), 4) AS volatility_7_day
        |FROM bars
        |WINDOW w AS (PARTITION BY user_id, event_type ORDER BY date
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_type, date""".stripMargin,
    "ingest_normalize" ->
      """SELECT user_id, event_type, date, event_id, value
        |FROM (
        |  SELECT user_id, event_type, CAST(ts AS DATE) AS date, event_id, value,
        |         row_number() OVER (PARTITION BY user_id, event_type, CAST(ts AS DATE)
        |                            ORDER BY ts, event_id) AS rn
        |  FROM events
        |)
        |WHERE rn = 1
        |ORDER BY user_id, event_type, date""".stripMargin
  )
}
