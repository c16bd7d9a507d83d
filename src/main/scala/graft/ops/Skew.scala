package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for shuffled equi-joins: salting. A hot key whose
 * rows exceed one executor's share stalls the stage (or OOMs it) in a
 * plain shuffle join; AQE's skew-join split handles sort-merge cases
 * but not aggregations-after-join or severe single-key skew. Salting
 * spreads each hot key over `parts` shuffle partitions deterministically:
 *
 *  - the BIG (skewed) side gets `salt = pmod(xxhash64(unique id), parts)`;
 *  - the SMALL side is replicated `parts`× (one copy per salt value);
 *  - the join key becomes (key, salt) — hot keys now land on `parts`
 *    reducers instead of one.
 *
 * Cost model: replication multiplies the small side by `parts`, so
 * choose `parts` ≈ (hot-key row count) / (target rows per task) and
 * keep the replicated side the genuinely smaller one. Deterministic
 * (hash salt, not rand()) so retried tasks and re-runs agree — a
 * rand() salt breaks exactly-once semantics under task retry.
 */
object Skew {

  /**
   * Inner equi-join `big ⋈ small` on `key`, with `big`'s skew spread
   * over `parts` salts. `bigIdCols` must be columns that (together)
   * vary within a key group — they seed the deterministic salt; row
   * content beyond them does not matter.
   */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      bigIdCols: Seq[String], parts: Int): DataFrame = {
    require(parts >= 1, "parts must be >= 1")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(bigIdCols.map(col): _*), lit(parts.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(parts.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
