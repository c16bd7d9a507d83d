package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join — for every left row, the most recent right row with
 * `rightTs <= leftTs` per key (the time-series join Spark has no native
 * operator for; reference engines and DuckDB ship it as ASOF JOIN).
 *
 * Plan: the classic union–sort–fill. Tag both inputs, union them, and
 * run ONE window per key ordered by (ts, side) carrying the right
 * side's payload forward with `last_value(ignoreNulls)`; left rows then
 * hold their as-of match. At equal timestamps the right row sorts
 * first, so `>=` is inclusive (DuckDB ASOF semantics).
 *
 * Scale: one shuffle on the key for the union'd stream, O(1) window
 * state (last seen payload) per key — no per-key loops, no range
 * self-join blowup, skewed keys bounded by the window's streaming
 * frame. This beats the broadcast-right/filter-max alternative whenever
 * the right side is large; `tolerance` bounds match staleness.
 */
object AsOf {

  /**
   * Left as-of join. `rightPayload` columns are emitted with a `ref_`
   * prefix; rows with no earlier right row (or none within
   * `toleranceMs`) carry nulls.
   *
   * Determinism contract: `rightTs` must be unique per key (the usual
   * as-of shape — one reference row per key-instant). With duplicate
   * right timestamps the winner among them is tie-ordered arbitrarily;
   * dedupe the right side first (`Ingest.firstPerKey`) if that matters.
   */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      toleranceMs: Option[Long] = None): DataFrame = {
    val l = left
      .withColumn("__ats", col(leftTs))
      .withColumn("__side", lit(1))
    // the whole right row travels as ONE struct: filling payload columns
    // independently would splice fields from different right rows
    // whenever a payload column is null
    val r = right.select(
      (keys.map(col) :+ col(rightTs).as("__ats") :+ lit(0).as("__side")) :+
        struct((col(rightTs).as("__ref_ts") +:
          rightPayload.map(c => col(c).as(s"ref_$c"))): _*).as("__ref"): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ats"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__ref", last(col("__ref"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val stale = toleranceMs match {
      case Some(tol) => col("__ref").isNull ||
        unix_millis(col("__ats")) - unix_millis(col("__ref.__ref_ts")) > tol
      case None => col("__ref").isNull
    }
    val out = rightPayload.foldLeft(matched) { (df, c) =>
      df.withColumn(s"ref_$c",
        when(stale, lit(null)).otherwise(col(s"__ref.ref_$c")))
    }
    out.drop("__ats", "__side", "__ref")
  }
}
