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
   * numeric id order). The contract is ENFORCED at runtime: pass 1 also
   * aggregates each bucket's [min, max] `orderCol` range, and a bucket
   * whose range interleaves its predecessor's (on the tiny per-group
   * bucket frame, so the check is #buckets rows and costs no extra
   * scan) raises — a non-monotone `bucketExpr` would otherwise corrupt
   * every downstream shard id silently.
   */
  def packByBudget(df: DataFrame, groupCols: Seq[String], orderCol: String,
      tokensCol: String, capacity: Long, bucketExpr: Column): DataFrame = {
    val g = groupCols.map(col)
    val withBucket = df.withColumn("__bucket", bucketExpr)
    val bucketSums = withBucket
      .groupBy(g :+ col("__bucket"): _*)
      .agg(sum(col(tokensCol)).as("__bucket_sum"),
        min(col(orderCol)).as("__omin"), max(col(orderCol)).as("__omax"))
    // Exclusive prefix over bucket totals: still one window per group,
    // but over #buckets rows, not #docs — the whole point of pass 1.
    val wBuckets = Window.partitionBy(g: _*).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wLag = Window.partitionBy(g: _*).orderBy(col("__bucket"))
    val offsets = bucketSums
      .withColumn("__offset",
        coalesce(sum(col("__bucket_sum")).over(wBuckets), lit(0L)))
      // monotonicity guard: consecutive buckets' order ranges must be
      // strictly separated, or (bucket, orderCol) order is NOT the
      // orderCol order and cum sums diverge from the serial formulation
      .withColumn("__prev_max", lag(col("__omax"), 1).over(wLag))
      .where(when(col("__prev_max").isNull ||
          col("__prev_max") < col("__omin"), lit(true))
        .otherwise(raise_error(concat(
          lit("packByBudget: bucketExpr is not monotone in "),
          lit(s"$orderCol: bucket "), col("__bucket").cast("string"),
          lit(" starts at "), col("__omin").cast("string"),
          lit(" but an earlier bucket reaches "),
          col("__prev_max").cast("string"))).cast("boolean")))
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

  /**
   * Deterministic global training-order shuffle: every row gets a
   * position `pos` (1-based, dense) equal to its rank under an
   * md5-derived sort key — a stable, seed-parameterized permutation a
   * training loader can reproduce anywhere (md5 of "<id>:<seed>" is the
   * same bytes in every engine, unlike xxhash64).
   *
   * The naive formulation is `row_number() OVER (ORDER BY key)` — one
   * global sort partition, one reducer ranking the whole corpus. This is
   * the two-pass shape instead: the first hex byte of the key buckets
   * rows into 256 ranges; because the bucket is a PREFIX of the sort key,
   * ordering by (bucket, key) is the global key order, so
   * pos = bucket_offset + rank_within_bucket exactly — every bucket ranks
   * in parallel and the only serial step is a 256-row prefix sum.
   */
  def shuffleOrder(df: DataFrame, idCol: String, seed: String): DataFrame = {
    val key = md5(concat(col(idCol).cast("string"), lit(":" + seed)))
    val withKey = df.withColumn("__key", key)
      // hex chars sort the same as their numeric value, so the first two
      // chars are both the top byte and a prefix of the string order.
      .withColumn("__bucket", conv(substring(col("__key"), 1, 2), 16, 10)
        .cast("int"))
    val wBuckets = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withKey.groupBy(col("__bucket"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__offset", coalesce(sum(col("__n")).over(wBuckets), lit(0L)))
      .select(col("__bucket"), col("__offset"))
    // md5 collisions are no-shows; idCol tie-breaks anyway so the rank is
    // total and deterministic.
    val wLocal = Window.partitionBy(col("__bucket"))
      .orderBy(col("__key"), col(idCol))
    withKey.join(broadcast(offsets), "__bucket")
      .withColumn("pos", (col("__offset") + row_number().over(wLocal)).cast("long"))
      .drop("__key", "__bucket", "__offset")
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
