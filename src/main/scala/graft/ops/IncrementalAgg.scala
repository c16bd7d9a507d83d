package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Incremental maintenance of a materialized COUNT/SUM aggregate — the
 * classic delta-rule view maintenance (count and sum are
 * self-maintainable distributive aggregates; the formulation goes back
 * to Gupta/Mumick's view-maintenance surveys) specialized to the
 * partition-replacement change shape `VersionedPartitioned` commits:
 * a version window touches a set of partitions, and the new aggregate
 * is
 *
 *   state' = state − aggregate(old rows of touched partitions)
 *                  + aggregate(new rows of touched partitions)
 *
 * applied per group. The whole-history recompute a naive consumer runs
 * after every promote reads the FULL table; maintenance reads only the
 * touched partitions' two sides (`VersionedPartitioned.changedSides`)
 * — at 100 TB with daily partition promotes, that is the difference
 * between scanning years and scanning a day.
 *
 * Exactness: counts are longs; sums should be DECIMAL columns
 * (caller casts) so add/subtract is associative and exact — a double
 * sum would drift from the recompute by re-association. A group whose
 * maintained count reaches 0 disappears, exactly as a recompute would
 * drop it; groups appearing in the delta only are inserted.
 *
 * Scale shape: `aggregate` is one map-combined hash aggregation;
 * `maintain` is one outer join of two group-keyed frames (both already
 * aggregate-sized, ≪ data) plus the same aggregation over the delta
 * sides. Nothing row-level ever joins.
 */
object IncrementalAgg {

  /** The materialized shape: groupCols, `n_rows`, and `sum_<c>` per sum
    * column. */
  def aggregate(df: DataFrame, groupCols: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    val aggs = count(lit(1)).as("n_rows") +:
      sumCols.map(c => sum(col(c)).as(s"sum_$c"))
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Apply one change window to a materialized aggregate: `oldChanged` /
   * `newChanged` are the touched partitions' rows before and after
   * (either may be empty). Returns the maintained aggregate, equal to
   * `aggregate` over the post-change table.
   */
  def maintain(state: DataFrame, oldChanged: DataFrame,
      newChanged: DataFrame, groupCols: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    val minus = aggregate(oldChanged, groupCols, sumCols)
    val plus = aggregate(newChanged, groupCols, sumCols)
    def signed(df: DataFrame, sign: Int): DataFrame =
      df.select((groupCols.map(col) :+
        (col("n_rows") * sign).as("n_rows")) ++
        sumCols.map(c => (col(s"sum_$c") * sign).as(s"sum_$c")): _*)
    val aggs = sum(col("n_rows")).as("n_rows") +:
      sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c"))
    signed(state, 1)
      .unionByName(signed(minus, -1))
      .unionByName(signed(plus, 1))
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      // a maintained count of 0 means the group left the table; a
      // recompute would not emit it either
      .where(col("n_rows") > 0)
  }
}
