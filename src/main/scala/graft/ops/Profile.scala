package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Single-pass numeric column profiler — the data-exploration companion
 * to Quality's pass/fail checks: per column, row/null/distinct counts
 * and min/max/mean, computed in ONE aggregation over one scan (all
 * per-column aggregates live in the same `agg`; map-side partials
 * apply; `countDistinct` expands the plan per column, which is the
 * exact-count trade-off — swap for `approx_count_distinct` at 100 TB
 * when ±2% is acceptable), then unpivoted to the row-per-column report
 * shape like Quality.report.
 */
object Profile {

  def numeric(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "at least one column")
    val aggs = columns.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__rows_$c"),
        count_if(col(c).isNull).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"),
        avg(col(c)).as(s"__avg_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = columns.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"__rows_$c").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__dist_$c").as("n_distinct"),
        round(col(s"__min_$c"), 4).as("min_value"),
        round(col(s"__max_$c"), 4).as("max_value"),
        round(col(s"__avg_$c"), 4).as("avg_value"))
    }
    row.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /**
   * The 100 TB variant: identical report shape with
   * `approx_count_distinct` (HyperLogLog++, `rsd` relative error) in the
   * `n_distinct` slot. Exact `countDistinct` EXPANDs the aggregate — one
   * shuffled pass per distinct-counted column — while the HLL sketches
   * of all columns ride one pass with bounded state (2^p registers
   * each), which is the difference between #cols shuffles and one.
   * Deterministic for a given input (hash-based, no sampling), but NOT
   * oracle-portable: the sketch estimate is engine-specific, so this
   * variant is spec-verified against `numeric` within rsd tolerance
   * rather than DuckDB-diffed.
   */
  def numericApprox(df: DataFrame, columns: Seq[String],
      rsd: Double = 0.02): DataFrame = {
    require(columns.nonEmpty, "at least one column")
    val aggs = columns.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__rows_$c"),
        count_if(col(c).isNull).as(s"__nulls_$c"),
        approx_count_distinct(col(c), rsd).as(s"__dist_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"),
        avg(col(c)).as(s"__avg_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = columns.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"__rows_$c").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__dist_$c").as("n_distinct"),
        round(col(s"__min_$c"), 4).as("min_value"),
        round(col(s"__max_$c"), 4).as("max_value"),
        round(col(s"__avg_$c"), 4).as("avg_value"))
    }
    row.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /**
   * Approximate per-column quantiles (Greenwald–Khanna via
   * `approx_percentile`): one pass, bounded sketch state per column —
   * the exact `percentile` aggregate buffers every value of a group.
   * `accuracy` trades state (≈ accuracy × #quantiles ints) for rank
   * error ≤ n/accuracy. Like the HLL profile, the estimate is
   * engine-specific, so it is spec-verified against the exact quantiles
   * within rank tolerance rather than DuckDB-diffed.
   */
  def quantilesApprox(df: DataFrame, columns: Seq[String],
      probs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    require(columns.nonEmpty && probs.nonEmpty, "columns and probs required")
    val probsArr = s"array(${probs.mkString("D, ")}D)"
    val aggs = columns.map { c =>
      expr(s"approx_percentile(`$c`, $probsArr, $accuracy)").as(s"__q_$c")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = columns.map { c =>
      struct((lit(c).as("col_name") +:
        probs.zipWithIndex.map { case (p, i) =>
          round(col(s"__q_$c")(i), 4).as(s"p${(p * 100).toInt}")
        }): _*)
    }
    row.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /**
   * Fixed-width histogram of a numeric column over [lo, hi): one
   * map-combined aggregate; state is `nBuckets` counters regardless of
   * input size. The bucket formula is plain clamped arithmetic
   * (`floor((x − lo) / width)`) rather than an engine-specific
   * `width_bucket`, so any engine replays it term for term.
   * Out-of-range values clamp into the edge buckets and NULLs are
   * dropped (both documented — derive lo/hi from a prior `numeric`
   * profile pass to make clamping empty). Only non-empty buckets are
   * returned (at scale most histograms are sparse at the edges).
   */
  def histogram(df: DataFrame, valueCol: String, lo: Double, hi: Double,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 1 && hi > lo, "need hi > lo and at least 1 bucket")
    val width = (hi - lo) / nBuckets
    val bucket = least(greatest(
        floor((col(valueCol) - lit(lo)) / lit(width)), lit(0L)),
      lit(nBuckets - 1L)).cast("long")
    df.where(col(valueCol).isNotNull)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("lo_edge", round(lit(lo) + col("bucket") * lit(width), 4))
      .withColumn("hi_edge", round(lit(lo) + (col("bucket") + 1) * lit(width), 4))
      .select("bucket", "lo_edge", "hi_edge", "n_rows")
  }
}
