package graft.pipeline

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas
import graft.ops.{Exchange, Ingest, Quality, Rolling, Versioned,
  VersionedPartitioned}

/**
 * The whole reference DAG as one composable daily run (reference
 * `dags/dag.py:444-452` task graph → plain function composition,
 * SURVEY.md §2.13).
 *
 * Per `ds`: normalize the day's raw bars → stage (a DataFrame — staging
 * needs no materialization in-process, reference `dags/dag.py:158-175`) →
 * advisory DQ report (reference `dags/dag.py:198-282`) → idempotent
 * promote of partition `date=ds` → derive rolling 7-day metrics from the
 * trailing 8-day production range and promote partition `ds` of the
 * cumulative table (reference `dags/dag.py:385-437`).
 *
 * `runDay` is pure in `ds` (no hidden state), so backfills are re-runs:
 * partition overwrite makes them byte-idempotent
 * (reference `README.md:25-26,127-134`).
 */
final case class PipelineConfig(
    productionPath: String,
    cumulativePath: String,
    whitelist: Seq[String] = Schemas.TickerWhitelist,
    strictDq: Boolean = false,
    // when set, every run's DQ report commits as one `Versioned`
    // snapshot tagged `ds=<date>` — an append-only, time-travelable
    // audit history (a backfill re-run adds a NEW version rather than
    // overwriting the original run's evidence)
    dqReportPath: Option[String] = None,
    // when true, the production and cumulative FACT tables ride
    // `VersionedPartitioned` manifest commits instead of
    // `Exchange.promote`'s dynamic partition overwrite — the
    // reference's `USING ICEBERG` reader guarantees (dag.py:141,146):
    // a reader concurrent with a backfill sees entirely-old or
    // entirely-new partitions, and every run stays time-travelable.
    // Same per-date promote cost; plain mode remains the default for
    // drop-in parquet-directory compatibility.
    versionedFacts: Boolean = false,
    // when true (requires versionedFacts), each day's fact promote runs
    // write-audit-publish: the partition merge is staged on a branch,
    // the WRITTEN state is re-read and audited (partition non-empty, no
    // NULL ticker — post-write verification, catching what a pre-write
    // DQ pass cannot), and only a passing audit publishes the
    // metadata-only fast-forward. A failing audit drops the branch and
    // aborts the day with main untouched — a concurrent reader can
    // never observe an unaudited write.
    wapFacts: Boolean = false,
    // when false, DayResult.staged is -1 and the per-day staged.count()
    // job is skipped — one fewer Spark job per day for callers that
    // don't consume the count (a backfill loop over years of days pays
    // one scheduling barrier per day for a number nobody reads)
    eagerCount: Boolean = true)

final case class DayResult(ds: LocalDate, staged: Long, dqReport: DataFrame)

class Pipeline(spark: SparkSession, cfg: PipelineConfig) {

  /**
   * `rawBars(ds)` plays the reference's Polygon fetch (reference
   * `dags/dag.py:68-112`): any frame with ticker/date/open/high/low/
   * close/volume/vwap/event_ts/transactions rows for that day (possibly
   * duplicated or multi-bar — normalization dedups to 1 row/ticker/day).
   */
  def runDay(ds: LocalDate, rawBars: LocalDate => DataFrame): DayResult = {
    val d = java.sql.Date.valueOf(ds)

    // ingest + normalize: ≤1 bar per (ticker, day) — reference break at
    // dag.py:109; distributed row_number dedup, no driver loop.
    val raw = rawBars(ds).where(col("date") === lit(d))
    val hasEventTs = raw.columns.contains("event_ts")
    val ordered = if (hasEventTs) Seq("event_ts") else Seq("date")
    val staged0 = Ingest.firstPerKey(raw, Seq("ticker", "date"), ordered)
    val staged = Ingest.stampInsertion(staged0).cache()

    // advisory DQ (strict mode = documented deviation, SURVEY §2.13)
    val checks = Quality.stockChecks(ds, cfg.whitelist)
    val report = Quality.report(staged, checks)
    // versioned audit trail: each run (including backfill re-runs)
    // appends one atomic snapshot; time travel recovers any past
    // run's evidence even after the day was re-promoted
    cfg.dqReportPath.foreach { p =>
      Versioned.commit(report.withColumn("ds", lit(d)), p, Some(s"ds=$ds"))
    }
    if (cfg.strictDq) Quality.enforce(staged, checks)

    // promote: replace exactly partition date=ds (DELETE+INSERT pair →
    // one dynamic partition overwrite), conformed to the canonical
    // DECIMAL schema (the reference DDL, dags/dag.py:130-148)
    promoteFact(Schemas.conform(staged, Schemas.stockBar),
      cfg.productionPath, ds)

    // cumulate from production: trailing 8-calendar-day scan (partition
    // pruned to ≤8 date dirs; in versioned mode the MANIFEST is pruned
    // first, so only snapshots holding an in-range day enter the union
    // — on a year-deep history the daily run plans ≤8 branches, not
    // one per historical snapshot)
    val prod = factRange(cfg.productionPath, Schemas.stockBar,
      ds.minusDays(7), ds)
    val cum = Rolling.forDay(prod, ds, Seq("ticker"), "date",
        arrayCols = Seq("open", "high", "low", "close", "volume"),
        volumeCol = "volume", closeCol = "close")
      .select(col("ticker"), col("date"),
        col("last_7_days_open"), col("last_7_days_high"),
        col("last_7_days_low"), col("last_7_days_close"),
        col("last_7_days_volume"),
        col("avg_7_day_volume"), col("volatility_7_day"))
    promoteFact(
      Schemas.conform(cum.withColumn("updated_at", current_timestamp()),
        Schemas.cumulative),
      cfg.cumulativePath, ds)

    val n = if (cfg.eagerCount) staged.count() else -1L
    staged.unpersist()
    DayResult(ds, n, report)
  }

  private def promoteFact(df: DataFrame, path: String, ds: LocalDate): Unit =
    if (cfg.wapFacts) {
      require(cfg.versionedFacts, "wapFacts requires versionedFacts")
      val branch = s"wap_$ds".replace("-", "_")
      VersionedPartitioned.promoteToBranch(df, path, branch)
      // audit what was WRITTEN, not what was about to be written: the
      // branch read resolves the staged manifest, pruned to the day.
      // Fail on a lost write (input had rows, written partition empty)
      // or a NULL key; an empty day (market holiday) skips the audit
      // and publishes the no-op fast-forward, matching plain-promote
      // behavior.
      if (!df.isEmpty) {
        val audited = VersionedPartitioned.readBranch(spark, path, branch)
          .where(col("date") === lit(java.sql.Date.valueOf(ds)))
        val bad = audited.limit(1).count() == 0 ||
          audited.where(col("ticker").isNull).limit(1).count() > 0
        if (bad) {
          VersionedPartitioned.dropBranch(spark, path, branch)
          throw new IllegalStateException(
            s"WAP audit failed for $path date=$ds; branch dropped, main untouched")
        }
      }
      VersionedPartitioned.publish(spark, path, branch)
      ()
    } else if (cfg.versionedFacts) {
      VersionedPartitioned.promote(df, path); ()
    } else Exchange.promote(df, path)

  private def factTable(path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    if (cfg.versionedFacts)
      // manifest reads surface the partition column last; restore the
      // canonical field order so both modes present the same shape
      VersionedPartitioned.read(spark, path)
        .select(schema.fieldNames.map(col): _*)
    else Exchange.table(spark, path)

  /** The fact table restricted to a date range: plain mode relies on
    * Catalyst dir pruning from the downstream filter; versioned mode
    * prunes the manifest itself (ISO date strings compare correctly). */
  private def factRange(path: String,
      schema: org.apache.spark.sql.types.StructType,
      from: LocalDate, to: LocalDate): DataFrame =
    if (cfg.versionedFacts)
      VersionedPartitioned.readPartitionsWhere(spark, path,
          v => v >= from.toString && v <= to.toString)
        .select(schema.fieldNames.map(col): _*)
    else Exchange.table(spark, path)

  def production: DataFrame = factTable(cfg.productionPath, Schemas.stockBar)
  def cumulative: DataFrame = factTable(cfg.cumulativePath, Schemas.cumulative)
}
