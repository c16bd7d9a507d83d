package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Group-wise z-score outlier detection with an EXACT membership test —
 * the metric-anomaly / data-quality gate ("flag rows more than t sigma
 * from their group's mean") stated so that the flag set is identical in
 * every engine and under every partitioning.
 *
 * The naive `abs(x - avg) / stddev > t` gate hides two float hazards:
 * avg/stddev are order-dependent double sums (partial aggregation
 * reorders them run to run), and a row sitting at z ≈ t flips with the
 * ulp. Instead the inequality is cleared of divisions and square roots:
 *
 *   (x·n − S)² · (n−1)  >  t² · n · (n·Q − S²)
 *
 * over integer-scaled values x (`scale` decimal digits preserved),
 * S = Σx, Q = Σx², all in scale-0 DECIMAL — exact arithmetic, no
 * rounding, order-independent sums (same device as `above_brand_avg`'s
 * decimal membership, extended to second moments). Equivalent to
 * (x−μ)² > t²·σ² with the SAMPLE variance. The reported z column is
 * cosmetic (doubles, rounded); membership never depends on it.
 *
 * Scale shape: one map-combined aggregate per group (3 numbers), then a
 * broadcast join of the tiny stats frame back onto the scan — the data
 * rows never shuffle. Bounds: the decimal products stay inside
 * DECIMAL(38,0) for |x| ≤ 10^6 and n ≤ 10^9 per group; past that,
 * pre-aggregate per sub-group or accept the double gate with a
 * tolerance band.
 */
object Outliers {

  /**
   * Rows of `df` whose `valueCol` lies more than `threshold` sample
   * standard deviations from its `groupCol` mean, with a cosmetic `z`.
   * `valueCol` must carry at most `scale` decimal digits (it is scaled
   * to an exact integer; a lossy cast here would change the question,
   * so values are required exact). Groups with n < 2 or zero variance
   * flag nothing.
   */
  def zscore(df: DataFrame, groupCol: String, valueCol: String,
      scale: Int = 2, threshold: Int = 3): DataFrame = {
    require(scale >= 0 && scale <= 6, "scale in [0, 6]")
    require(threshold > 0, "threshold must be positive")
    val factor = math.pow(10, scale)
    val x = (col(valueCol) * lit(factor)).cast("decimal(12,0)")
    val scaled = df.withColumn("__x", x)
    val stats = scaled.groupBy(col(groupCol)).agg(
      count(lit(1)).as("__n"),
      sum(col("__x")).as("__s"),
      sum(col("__x") * col("__x")).as("__q"))
    val n = col("__n").cast("decimal(20,0)")
    val lhs = (col("__x") * n - col("__s"))
    val varNum = n * col("__q") - col("__s") * col("__s") // n·Q − S²  (≥ 0)
    scaled.join(broadcast(stats), groupCol :: Nil)
      .where(col("__n") >= 2 &&
        lhs * lhs * (n - lit(1)) >
          lit(threshold * threshold) * n * varNum)
      .withColumn("z", round(
        lhs.cast("double") /
          sqrt((n * varNum).cast("double") / (col("__n") - lit(1))), 4))
      .drop("__x", "__n", "__s", "__q")
  }
}
