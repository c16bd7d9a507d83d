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

  // --------------------------------------- COUNT DISTINCT via sketches —
  //
  // COUNT DISTINCT is not subtractable — `state − old + new` has no
  // inverse for set cardinality, so the delta rule above cannot carry
  // it. The standard MV answer is PARTITION-GRAINED partial sketches:
  // keep one mergeable HLL sketch per (partition, group) cell
  // (Datasketches HLL via Spark's `hll_sketch_agg`), and maintain under
  // partition replacement by dropping the touched partitions' cells and
  // re-sketching only the NEW rows (O(day), never O(table)); the
  // per-group estimate re-unions the surviving cells — an
  // aggregate-sized pass (`hll_union_agg`), never a data scan. The
  // estimate is exact while a group's true cardinality is far below
  // 2^lgK (the sketch stays in exact coupon mode) and ±~1.6%/√(2^lgK)
  // beyond — AggSpec pins merge-of-partials ≡ whole-input and
  // exactness vs countDistinct at gate cardinalities; estimates are
  // deliberately not oracle-gated (precedent: Profile.numericApprox).

  /** Default Datasketches lgConfigK: 2^12 registers ≈ 1.6 kB dense,
    * <1% relative error — the Spark default. */
  val DefaultLgK = 12

  /** Partition-grained sketch state: one row per (partitionCol ×
    * groupCols) cell carrying an `hll_<c>` binary sketch per distinct
    * column. One map-combined hash aggregation; the shuffle carries
    * sketches (≤ ~1.6 kB each at lgK 12), never row values. */
  def sketchState(df: DataFrame, partitionCol: String,
      groupCols: Seq[String], distinctCols: Seq[String],
      lgK: Int = DefaultLgK): DataFrame = {
    require(distinctCols.nonEmpty, "at least one distinct column")
    val aggs = distinctCols.map(c =>
      hll_sketch_agg(col(c), lit(lgK)).as(s"hll_$c"))
    df.groupBy((partitionCol +: groupCols).map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Collapse partition-grained sketch state to per-group approximate
    * distinct counts (`approx_distinct_<c>`): union the cells' sketches
    * per group, then estimate. Aggregate-sized input — this is the
    * read path of the maintained COUNT DISTINCT view. */
  def distinctCounts(state: DataFrame, groupCols: Seq[String],
      distinctCols: Seq[String]): DataFrame = {
    val aggs = distinctCols.map(c =>
      hll_sketch_estimate(hll_union_agg(col(s"hll_$c")))
        .as(s"approx_distinct_$c"))
    state.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Maintain partition-grained sketch state under one partition-
   * replacement change window: cells of the touched partitions (either
   * side) are dropped and the NEW rows re-sketched — equal to
   * `sketchState` over the post-change table, cell for cell. Only
   * `newChanged` is scanned at row grain; the state join is
   * aggregate-sized (anti-join on the partition key).
   */
  def maintainSketches(state: DataFrame, oldChanged: DataFrame,
      newChanged: DataFrame, partitionCol: String, groupCols: Seq[String],
      distinctCols: Seq[String], lgK: Int = DefaultLgK): DataFrame = {
    val touched = oldChanged.select(col(partitionCol))
      .unionByName(newChanged.select(col(partitionCol))).distinct()
    state.join(touched, Seq(partitionCol), "left_anti")
      .unionByName(
        sketchState(newChanged, partitionCol, groupCols, distinctCols, lgK))
  }
}
