package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Token-budget shard packing — lay documents out in a deterministic
 * order and cut fixed-capacity training shards (contiguous fill: a doc
 * goes in shard floor((cum - own) / capacity), so a doc may straddle a
 * boundary but shard membership is a pure function of the order).
 *
 * The naive formulation is one running sum per packing group
 * (`ExtQueries.packShards`), which serializes each group onto a single
 * window reducer — on a real 90 %-English corpus the `en` partition IS
 * the corpus and the pack runs on one core. This op is the scale
 * formulation: a classic two-pass distributed prefix sum.
 *
 *   pass 1  per-(group, bucket) token totals — one hash aggregate,
 *           #buckets rows per group;
 *   offset  exclusive prefix sum of bucket totals within each group —
 *           a window over the TINY bucket-total frame (thousands of
 *           rows at 100 TB, not billions);
 *   pass 2  per-(group, bucket) local running sum + broadcast-joined
 *           bucket offset — parallel across every (group, bucket)
 *           partition.
 *
 * cum(row) = offset(bucket) + local_cum(row) equals the global running
 * sum exactly, because `bucketExpr` is required to be monotone
 * non-decreasing in `orderCol` within each group — ordering by
 * (bucket, orderCol) is then the same total order as orderCol alone.
 * Output rows, shard ids and totals are bit-identical to the
 * single-window formulation (oracle-checked against the same SQL).
 */
object Shards {

  /**
   * Assign each row a `shard` id within its `groupCols` group, packing
   * `tokensCol` token counts into shards of `capacity` in `orderCol`
   * order. `bucketExpr` partitions each group's order range into
   * parallel prefix-sum chunks; it MUST be monotone non-decreasing in
   * `orderCol` within a group (e.g. `floor(col("doc_id") / 4096)` for a
   * numeric id order).
   */
  def packByBudget(df: DataFrame, groupCols: Seq[String], orderCol: String,
      tokensCol: String, capacity: Long, bucketExpr: Column): DataFrame = {
    val g = groupCols.map(col)
    val withBucket = df.withColumn("__bucket", bucketExpr)
    val bucketSums = withBucket
      .groupBy(g :+ col("__bucket"): _*)
      .agg(sum(col(tokensCol)).as("__bucket_sum"))
    // Exclusive prefix over bucket totals: still one window per group,
    // but over #buckets rows, not #docs — the whole point of pass 1.
    val wBuckets = Window.partitionBy(g: _*).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketSums
      .withColumn("__offset",
        coalesce(sum(col("__bucket_sum")).over(wBuckets), lit(0L)))
      .select((groupCols :+ "__bucket").map(col) :+ col("__offset"): _*)
    val wLocal = Window.partitionBy(g :+ col("__bucket"): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withBucket
      .join(broadcast(offsets), groupCols :+ "__bucket")
      .withColumn("__cum", col("__offset") + sum(col(tokensCol)).over(wLocal))
      .withColumn("shard",
        floor((col("__cum") - col(tokensCol)) / lit(capacity)).cast("long"))
      .drop("__bucket", "__offset", "__cum")
  }

  /** Shard manifest: one row per (group, shard) with membership bounds
    * and sizes — the summary a training loader consumes. */
  def manifest(packed: DataFrame, groupCols: Seq[String], orderCol: String,
      tokensCol: String): DataFrame =
    packed.groupBy((groupCols :+ "shard").map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("shard_tokens"),
        min(col(orderCol)).as("first_doc"),
        max(col(orderCol)).as("last_doc"))
}
