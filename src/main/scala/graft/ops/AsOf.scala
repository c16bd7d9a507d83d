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
   * prefix; rows with no matching right row (or none within
   * `toleranceMs`) carry nulls.
   *
   * `direction` (the pandas `merge_asof` surface):
   *  - `"backward"` (default): most recent right row with ts ≤ left ts;
   *  - `"forward"`: earliest right row with ts ≥ left ts;
   *  - `"nearest"`: whichever of the two is closer in time, ties to
   *    backward (pandas' tie rule). Both candidate fills ride the SAME
   *    key shuffle — nearest costs one extra per-partition sort, never
   *    a second exchange.
   * Equal timestamps match in every direction (inclusive, DuckDB ASOF
   * semantics).
   *
   * Determinism contract: `rightTs` must be unique per key (the usual
   * as-of shape — one reference row per key-instant). With duplicate
   * right timestamps the winner among them is tie-ordered arbitrarily;
   * dedupe the right side first (`Ingest.firstPerKey`) if that matters.
   */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      toleranceMs: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
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

    // carry-forward over ascending time = backward match; over
    // descending time = forward match. The right row sorts before the
    // left at equal timestamps in BOTH orders (side 0 first), so ties
    // are inclusive each way.
    def fill(asc: Boolean): org.apache.spark.sql.Column = {
      val ord = if (asc) col("__ats").asc else col("__ats").desc
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(ord, col("__side").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      last(col("__ref"), ignoreNulls = true).over(w)
    }
    val matched = (direction match {
      case "backward" => unioned.withColumn("__ref", fill(asc = true))
      case "forward" => unioned.withColumn("__ref", fill(asc = false))
      case "nearest" =>
        unioned
          .withColumn("__b", fill(asc = true))
          .withColumn("__f", fill(asc = false))
          .withColumn("__gb",
            unix_millis(col("__ats")) - unix_millis(col("__b.__ref_ts")))
          .withColumn("__gf",
            unix_millis(col("__f.__ref_ts")) - unix_millis(col("__ats")))
          .withColumn("__ref",
            when(col("__b").isNull, col("__f"))
              .when(col("__f").isNull, col("__b"))
              .when(col("__gb") <= col("__gf"), col("__b")) // ties → backward
              .otherwise(col("__f")))
          .drop("__b", "__f", "__gb", "__gf")
    }).where(col("__side") === 1)
    val gap = direction match {
      case "forward" =>
        unix_millis(col("__ref.__ref_ts")) - unix_millis(col("__ats"))
      case _ =>
        // nearest: the chosen side's absolute gap
        abs(unix_millis(col("__ats")) - unix_millis(col("__ref.__ref_ts")))
    }
    val stale = toleranceMs match {
      case Some(tol) => col("__ref").isNull || gap > tol
      case None => col("__ref").isNull
    }
    val out = rightPayload.foldLeft(matched) { (df, c) =>
      df.withColumn(s"ref_$c",
        when(stale, lit(null)).otherwise(col(s"__ref.ref_$c")))
    }
    out.drop("__ats", "__side", "__ref")
  }
}
