package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Blocked edit-distance similarity join — approximate string matching
 * for entity resolution / catalog reconciliation (name variants, typo'd
 * identifiers) without the all-pairs cross product.
 *
 * The standard block–verify shape: candidate pairs must agree on at
 * least one cheap equality key derived from the string (default: first
 * OR last whitespace token — a single-token edit can destroy one of
 * them, rarely both), then exact `levenshtein` on candidates decides.
 * Precision is exact; recall is the blocking scheme's, by construction:
 * only pairs sharing a block key are considered (the documented trade
 * of every blocking join — see `Dedup.simhashCandidatePairs` for the
 * same contract). Callers needing tighter recall pass more keys (e.g.
 * character q-gram samples).
 *
 * Scale shape: distinct values → explode block keys → equi-join on the
 * key. Shuffles carry (string, key) postings; pair expansion is local
 * per key bucket, quadratic only in per-key frequency (cap hot keys
 * upstream the same way `ngramJaccardPairs.maxDocFreq` does if the key
 * distribution is skewed). The verify stage is one codegen'd
 * `levenshtein` per candidate — Spark's implementation bails early for
 * length gaps beyond the threshold when given the 3-arg form.
 */
object Fuzzy {

  /** Default block keys: first and last whitespace token. */
  def tokenEndpointKeys(s: Column): Seq[Column] = {
    val toks = split(s, " ")
    Seq(element_at(toks, 1), element_at(toks, -1))
  }

  /**
   * Distinct unordered pairs (s_a < s_b) of `strCol` values within
   * `maxDist` edits that share ≥1 block key, with the distance.
   */
  def selfJoin(df: DataFrame, strCol: String, maxDist: Int,
      blockKeys: Column => Seq[Column] = tokenEndpointKeys): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    val vals = df.select(col(strCol).as("__s")).distinct()
    val keyed = vals
      .select(col("__s"),
        explode(array(blockKeys(col("__s")): _*)).as("__bk"))
      .distinct()
    val a = keyed.select(col("__s").as("s_a"), col("__bk"))
    val b = keyed.select(col("__s").as("s_b"), col("__bk"))
    a.join(b, "__bk")
      .where(col("s_a") < col("s_b"))
      .select("s_a", "s_b").distinct()
      // 3-arg levenshtein short-circuits to -1 past the threshold
      // (bails on length gap alone without touching the DP matrix)
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), maxDist))
      .where(col("dist") >= 0)
  }
}
