package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.functions._

/**
 * Bloom-filter-pruned semi-join — the explicit form of the runtime
 * filter Spark's optimizer sometimes injects on its own
 * (`InjectRuntimeFilter`), for the times it doesn't (non-equi follow-up
 * stages, DSv2 sources without runtime-filter support, or a semi-join
 * whose big side the planner cannot see is 1000× the small side).
 *
 * Why this is THE 100 TB shape for "keep fact rows matching a filtered
 * dimension": a plain left-semi join shuffles the full fact table on the
 * join key — at 100 TB that shuffle dwarfs everything else. Here the
 * small side is condensed into a bloom filter (~1.2 MB per 1M keys at
 * 1 % fpp) that rides to the executors inside the serialized plan; the
 * fact scan drops non-matching rows AT THE SCAN (no false negatives, so
 * nothing is lost), and only the ≤ (match + fpp) survivors reach the real
 * semi-join that removes the false positives. The result is exactly the
 * semi-join's, with the shuffle shrunk by the selectivity of the
 * dimension filter.
 *
 * Probe-side evaluation uses Spark's own codegen'd
 * `BloomFilterMightContain` expression (registered here as the SQL
 * function `bloom_might_contain`) over `xxhash64(key)`; the build side
 * inserts the same `xxhash64` values via the public
 * `DataFrameStatFunctions.bloomFilter`, so build and probe hash
 * identically. The bloom bytes live in a foldable literal: fine for
 * single-digit-MB filters (they ship once per task binary); a
 * 100 M-key filter (~120 MB) should instead lower `expectedItems` per
 * partition-pruned build or accept a higher fpp — the follow-up exact
 * join keeps correctness either way.
 */
object BloomPrune {

  /** `bloom_might_contain(bloomBytes, xxhash64Value)` — Spark's native
    * codegen'd probe expression, surfaced as a registrable function
    * (it ships in catalyst but is not in the public FunctionRegistry) —
    * and `bloom_filter_agg(xxhash64Value, estItems, numBits)`, its
    * build-side AGGREGATE twin (what `InjectRuntimeFilter` plants on
    * the creation side), which makes per-GROUP blooms expressible —
    * the per-FILE bloom sidecars `VersionedPartitioned.writeSnapshot`
    * emits are one `groupBy(__file).agg(bloom_filter_agg(…))`. Both
    * ends hash through `xxhash64`, so build and probe agree by
    * construction. */
  val injections: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "bloom_might_contain(bloom_bytes, xxhash64_value)")
        BloomFilterMightContain(children.head, children(1))
      }),
    (FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "bloom_filter_agg(xxhash64_value, est_items, num_bits)")
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(children.head, children(1), children(2))
      }))

  /** Idempotent per-session registration (same contract as
    * `TextExprs.register`). */
  def register(spark: SparkSession): Unit =
    injections.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }

  /**
   * Serialized bloom filter over `xxhash64(keyCol)` of `build`.
   * `expectedItems < 0` sizes the filter from an exact count of the
   * build side (one extra cheap action over the SMALL side only).
   */
  def keyBloom(build: DataFrame, keyCol: String,
      expectedItems: Long = -1L, fpp: Double = 0.01): Array[Byte] = {
    val hashed = build.select(xxhash64(col(keyCol)).as("__h"))
    val n = if (expectedItems >= 0) expectedItems
            else math.max(hashed.count(), 1L)
    val bf = hashed.stat.bloomFilter("__h", n, fpp)
    val os = new ByteArrayOutputStream()
    bf.writeTo(os)
    os.toByteArray
  }

  /** Rows of `big` whose `bigKey` MIGHT be in the bloom — no false
    * negatives; callers that need exactness re-join (see `semiJoin`).
    * The predicate is plain codegen'd scan-side filtering: it composes
    * with pushdown of any other predicate and costs one hash + a few
    * cache lines per row. */
  def prunedScan(big: DataFrame, bigKey: String,
      bloom: Array[Byte]): DataFrame = {
    register(big.sparkSession)
    big.where(call_function("bloom_might_contain",
      lit(bloom), xxhash64(col(bigKey))))
  }

  /**
   * Exact left-semi join of `big` against `small`'s keys, with the
   * bloom pre-filter shrinking `big`'s shuffle to the survivors. Output
   * ≡ `big.join(small, bigKey === smallKey, "left_semi")` for non-null
   * keys (xxhash64 of NULL is the seed constant, but the exact
   * semi-join drops null keys regardless of the bloom's vote).
   */
  def semiJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, expectedItems: Long = -1L,
      fpp: Double = 0.01): DataFrame = {
    val bloom = keyBloom(small, smallKey, expectedItems, fpp)
    val keys = small.select(col(smallKey)).distinct()
    prunedScan(big, bigKey, bloom)
      .join(keys, col(bigKey) === col(smallKey), "left_semi")
  }
}
