package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/**
 * Canonical schemas for the stock-tracker domain, re-expressed as Spark
 * `StructType`s. Derived from the reference DDL
 * (reference `dags/dag.py:130-148` production, `dags/dag.py:158-175`
 * staging, `dags/dag.py:336-354` cumulative).
 *
 * The reference's staging INSERT carries an epoch-millis `timestamp`
 * field that its DDL omits (reference `dags/dag.py:90-102` vs `160-172`);
 * we resolve the discrepancy by carrying it as `event_ts BIGINT`
 * (SURVEY.md §1.4).
 */
object Schemas {

  /** Whitelisted tickers (reference `dags/dag.py:61`). */
  val TickerWhitelist: Seq[String] = Seq("AAPL", "AMZN", "NFLX", "GOOGL", "META")

  /** Production / staging table schema (`daily_stock_prices`). */
  val stockBar: StructType = StructType(Seq(
    StructField("ticker", StringType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("open", DecimalType(10, 2)),
    StructField("high", DecimalType(10, 2)),
    StructField("low", DecimalType(10, 2)),
    StructField("close", DecimalType(10, 2)),
    StructField("volume", LongType),
    StructField("vwap", DecimalType(10, 2)),
    StructField("event_ts", LongType), // epoch millis from the source feed
    StructField("transactions", IntegerType),
    StructField("insertion_timestamp", TimestampType)
  ))

  /** Derived rolling-metrics table (`daily_stock_prices_cumulative`). */
  val cumulative: StructType = StructType(Seq(
    StructField("ticker", StringType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("last_7_days_open", ArrayType(DecimalType(10, 2))),
    StructField("last_7_days_high", ArrayType(DecimalType(10, 2))),
    StructField("last_7_days_low", ArrayType(DecimalType(10, 2))),
    StructField("last_7_days_close", ArrayType(DecimalType(10, 2))),
    StructField("last_7_days_volume", ArrayType(LongType)),
    StructField("avg_7_day_volume", DecimalType(15, 2)),
    StructField("volatility_7_day", DecimalType(10, 4)),
    StructField("updated_at", TimestampType)
  ))

  /**
   * Conform a frame to a canonical schema: align columns BY NAME (the
   * resolution of reference bug #6, SURVEY.md §2.14 — its positional
   * `SELECT *` promote silently depends on column order), cast each to
   * the declared type (the reference's implicit cast-on-INSERT into the
   * DECIMAL DDL), and fail fast on missing or extra columns.
   */
  def conform(df: DataFrame, schema: StructType): DataFrame = {
    val have = df.columns.toSet
    val missing = schema.fieldNames.filterNot(have)
    val extra = df.columns.filterNot(schema.fieldNames.contains(_))
    require(missing.isEmpty && extra.isEmpty,
      s"schema mismatch: missing=${missing.mkString(",")} extra=${extra.mkString(",")}")
    df.select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
  }

  /**
   * Schema evolution on promote: like `conform`, but a column declared
   * in `schema` and ABSENT from the frame is added with a default (NULL
   * unless given in `defaults`) instead of failing — the add-column
   * migration the reference motivates with Iceberg schema evolution
   * (reference `README.md:29`). Two-step rollout on a plain-parquet
   * table, where old partition files won't carry the new column:
   *
   *   1. backfill: `Exchange.promoteAtomic(evolve(Exchange.table(...),
   *      newSchema, defaults), path)` rewrites existing partitions with
   *      the default filled in;
   *   2. new writes go through `evolve` (a no-op once the writer emits
   *      the column).
   *
   * Extra frame columns still fail fast — silently dropping data is
   * never a migration — and a default for a column the schema doesn't
   * declare is rejected as a likely typo.
   */
  def evolve(df: DataFrame, schema: StructType,
      defaults: Map[String, Column] = Map.empty): DataFrame = {
    val have = df.columns.toSet
    val extra = df.columns.filterNot(schema.fieldNames.contains(_))
    require(extra.isEmpty, s"schema mismatch: extra=${extra.mkString(",")}")
    val unknown = defaults.keySet -- schema.fieldNames
    require(unknown.isEmpty,
      s"defaults for undeclared columns: ${unknown.mkString(",")}")
    df.select(schema.fields.map { f =>
      val base =
        if (have(f.name)) col(f.name)
        else defaults.getOrElse(f.name, lit(null))
      base.cast(f.dataType).as(f.name)
    }: _*)
  }
}

/** Typed row model for the production table (Dataset[StockBar] use). */
case class StockBar(
    ticker: String,
    date: java.sql.Date,
    open: BigDecimal,
    high: BigDecimal,
    low: BigDecimal,
    close: BigDecimal,
    volume: Long,
    vwap: BigDecimal,
    event_ts: Long,
    transactions: Int,
    insertion_timestamp: java.sql.Timestamp)
