package graft.sources

import org.apache.spark.sql.SparkSession

/**
 * SQL front door: the reference's entire user interface is raw SQL
 * strings executed against named tables (reference `dags/dag.py:28`
 * `cursor.execute(query)`; every pipeline step `dags/dag.py:202-277,
 * 385-437` is a SQL literal). This registers every testdata table as a
 * session temp view so that same SQL runs verbatim via `spark.sql(...)`
 * — a user porting the reference's queries needs only `Views.register`
 * and their existing strings.
 *
 * Temp views are metadata-only: each view IS the `Tables.load` frame
 * (nanos-timestamp normalization included), so Catalyst sees straight
 * through to the parquet relation — filter pushdown, column pruning and
 * partition pruning behave exactly as for the DataFrame API. Nothing is
 * materialized; registration is free at any scale.
 */
object Views {

  /** Register every testdata table under its own name (idempotent —
    * re-registration just rebinds the view to a fresh load). */
  def register(spark: SparkSession, dir: String): Unit =
    Tables.tableNames.foreach { t =>
      Tables.load(spark, dir, t).createOrReplaceTempView(t)
    }

  /** Register one table under an alternate view name (the reference
    * addresses its tables by catalog-qualified names, e.g.
    * `production_stock_data` — callers map those onto testdata). */
  def registerAs(spark: SparkSession, dir: String, table: String,
      viewName: String): Unit =
    Tables.load(spark, dir, table).createOrReplaceTempView(viewName)
}
