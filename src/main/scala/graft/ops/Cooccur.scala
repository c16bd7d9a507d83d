package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Co-occurrence pair mining — items appearing together in the same
 * basket (market-basket affinity, co-click, co-citation), the support-
 * counting kernel of association-rule mining (the candidate-pair pass
 * of Apriori/FP-growth pipelines).
 *
 * Plan: distinct (basket, item) postings, self-equi-join on the basket
 * id, hash-aggregate the unordered pair counts. Shuffles carry only id
 * pairs. Pair expansion is quadratic in BASKET size but linear in
 * basket count, so the cost driver at 100 TB is the largest basket, not
 * the table: `maxBasketSize` drops oversized baskets (one 100k-item
 * basket alone is 5×10⁹ pairs) — the same hot-set guard as
 * `ngramJaccardPairs.maxDocFreq`, and like there the dropped baskets
 * are auditable (`oversizedBaskets`) rather than silent.
 */
object Cooccur {

  /**
   * Unordered item pairs (item_a < item_b) with the number of distinct
   * baskets containing both, for pairs with support ≥ `minSupport`.
   * Baskets larger than `maxBasketSize` distinct items are excluded.
   */
  def pairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2L, maxBasketSize: Long = 1000L): DataFrame = {
    val posts = df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val sized = posts.withColumn("__n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("__b"))))
      .where(col("__n") <= maxBasketSize)
      .select(col("__b"), col("__i"))
    val a = sized.select(col("__b"), col("__i").as("item_a"))
    val b = sized.select(col("__b"), col("__i").as("item_b"))
    a.join(b, "__b").where(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_baskets"))
      .where(col("n_baskets") >= minSupport)
  }

  /** Audit: baskets excluded by `maxBasketSize`, with their sizes. */
  def oversizedBaskets(df: DataFrame, basketCol: String, itemCol: String,
      maxBasketSize: Long): DataFrame =
    df.select(col(basketCol), col(itemCol)).distinct()
      .groupBy(col(basketCol))
      .agg(count(lit(1)).as("n_items"))
      .where(col("n_items") > maxBasketSize)
}
