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
 * Scale shape: one map-combined aggregate per group (4 numbers), then a
 * broadcast join of the tiny stats frame back onto the scan — the data
 * rows never shuffle. Bounds: with m = max|x|·10^scale the largest
 * product is max(4, t²)·m²·n³, which must stay inside DECIMAL(38,0);
 * at scale=2 and |x| ≤ 10^6 that means n ≲ 10^7 rows per group (NOT
 * 10^9 — the cube on n dominates). The bound is enforced at runtime:
 * the per-group stats frame carries max|x| and a violating group
 * raises rather than silently NULLing the comparison (non-ANSI) or
 * erroring mid-join (ANSI). Past the bound, pre-aggregate per
 * sub-group or accept the double gate with a tolerance band.
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
    val statsRaw = scaled.groupBy(col(groupCol)).agg(
      count(lit(1)).as("__n"),
      sum(col("__x")).as("__s"),
      sum(col("__x") * col("__x")).as("__q"),
      max(abs(col("__x"))).as("__m"))
    // Overflow guard (evaluated per GROUP on the tiny stats frame, not
    // per row): every decimal product below is bounded by
    // max(4, t²)·m²·n³, so requiring that ≤ 9e37 keeps all of lhs²(n−1),
    // n·Q and S² inside DECIMAL(38,0) with headroom. A where-clause
    // cannot be pruned away, and raise_error fires lazily only on a
    // violating group.
    val nD = col("__n").cast("double")
    val mD = col("__m").cast("double")
    // t·t in double form so the coefficient equals the documented
    // max(4, t²) bound even if the threshold type ever widens to a
    // fractional value (truncating t²=12.25 → 10.5-style underestimates
    // would eat the ~11% headroom between the 9e37 guard and 1e38).
    val guardCoef = math.max(4.0, threshold.toDouble * threshold)
    val stats = statsRaw.where(
      when(lit(guardCoef) * mD * mD * nD * nD * nD <= lit(9e37), lit(true))
        .otherwise(raise_error(concat(
          lit(s"Outliers.zscore: DECIMAL(38,0) overflow risk in group "),
          col(groupCol).cast("string"),
          lit(": n="), col("__n").cast("string"),
          lit(", max|x_scaled|="), col("__m").cast("string"),
          lit(s" exceeds max(4,t^2)*m^2*n^3 <= 9e37; ") ,
          lit("pre-aggregate per sub-group or reduce scale"))).cast("boolean")))
      .drop("__m")
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
