package graft.ops

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-quality checks — the reference's 6-check validation query
 * (reference `dags/dag.py:202-277`), re-expressed as a generic,
 * single-pass aggregation.
 *
 * The reference glues six aggregate subqueries with UNION ALL — six full
 * scans of the staging table. Here every check over one table is one
 * aggregate expression in ONE `agg(...)` call: a single scan with
 * map-side partial aggregation, then an in-memory unpivot to the
 * reference's 4-column report shape
 * (check_name, actual_count, expected_count, status). At 100 TB this is
 * the difference between 1 and 6 table scans; the aggregation state is a
 * handful of longs per partition.
 *
 * As in the reference, a check PASSes when actual == expected
 * (`dags/dag.py:209` and siblings). Reporting is advisory by default
 * (`dags/dag.py:31-37,279` — results printed, never enforced);
 * `enforce` gives the strict variant as a documented deviation.
 */
object Quality {

  /** One check: an aggregate expression and the value it must equal. */
  case class DqCheck(name: String, actual: Column, expected: Long)

  /** Count-of-violating-rows check (PASS when zero violations). */
  def violations(name: String, violation: Column): DqCheck =
    DqCheck(name, count_if(violation), 0L)

  /**
   * ROW-LEVEL quarantine annotation — the split-path companion to the
   * aggregate `report`: tag every row with the names of the row-level
   * rules it violates (`reasonsCol` string array, empty = clean), so a
   * pipeline can promote the clean rows and route violators to a
   * quarantine table WITH their reasons instead of failing the whole
   * run (`enforce`) or merely counting (`report`). One codegen'd
   * projection — zero shuffle, zero extra scans; the reason array is
   * built per row from the same predicates `report` would count.
   */
  def annotate(df: DataFrame, rules: Seq[(String, Column)],
      reasonsCol: String = "dq_reasons"): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val tagged = array(rules.map { case (n, p) =>
      when(p, lit(n)).otherwise(lit(null).cast("string"))
    }: _*)
    df.withColumn(reasonsCol, filter(tagged, x => x.isNotNull))
  }

  /** `annotate` split into (clean rows without the reasons column,
    * violating rows with it) — promote the first, quarantine the
    * second. */
  def split(df: DataFrame, rules: Seq[(String, Column)],
      reasonsCol: String = "dq_reasons"): (DataFrame, DataFrame) = {
    val ann = annotate(df, rules, reasonsCol)
    (ann.where(size(col(reasonsCol)) === 0).drop(reasonsCol),
      ann.where(size(col(reasonsCol)) > 0))
  }

  /**
   * Run all checks over `df` in a single aggregation pass and return the
   * reference-shaped report.
   */
  def report(df: DataFrame, checks: Seq[DqCheck]): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      c.actual.cast("long").as(s"__c$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = checks.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c.name).as("check_name"),
        col(s"__c$i").as("actual_count"),
        lit(c.expected).as("expected_count"))
    }
    row.select(explode(array(entries: _*)).as("c"))
      .select(
        col("c.check_name").as("check_name"),
        col("c.actual_count").as("actual_count"),
        col("c.expected_count").as("expected_count"),
        when(col("c.actual_count") === col("c.expected_count"), lit("PASS"))
          .otherwise(lit("FAIL")).as("status"))
  }

  /** Strict mode: throw if any check FAILs (deviation from the reference,
    * which only prints — SURVEY.md §2.13). */
  def enforce(df: DataFrame, checks: Seq[DqCheck]): Unit = {
    val failed = report(df, checks).where(col("status") === "FAIL")
      .select("check_name", "actual_count", "expected_count").collect()
    if (failed.nonEmpty)
      throw new IllegalStateException(
        "DQ checks failed: " + failed.map(_.toString).mkString(", "))
  }

  /**
   * The reference's exact six checks against a staging frame of stock
   * bars (reference `dags/dag.py:202-277`): ticker presence, null OHLC,
   * OHLC ordering sanity, positive volume, date consistency with the run
   * date, ticker whitelist.
   */
  def stockChecks(ds: LocalDate, whitelist: Seq[String]): Seq[DqCheck] = {
    val d = lit(java.sql.Date.valueOf(ds))
    Seq(
      DqCheck("Missing stocks check", countDistinct(col("ticker")), whitelist.size.toLong),
      violations("Null values check",
        col("open").isNull || col("high").isNull ||
        col("low").isNull || col("close").isNull),
      violations("Invalid OHLC relationship check",
        col("high") < col("low") || col("open") > col("high") ||
        col("open") < col("low") || col("close") > col("high") ||
        col("close") < col("low")),
      violations("Invalid volume check", col("volume") <= 0),
      violations("Date consistency check", col("date") =!= d),
      violations("Invalid ticker check", !col("ticker").isin(whitelist: _*)))
  }
}
