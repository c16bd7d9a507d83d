package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Shared text normalization for the dedup/text-analysis operators.
 * Everything here is a pure Column expression — whole-stage-codegen'd,
 * no UDFs, no shuffles.
 */
object TextNorm {

  /** Lowercased alphanumeric tokens (unicode letters/digits). */
  def tokens(text: Column): Column =
    filter(
      split(lower(regexp_replace(text, "[^\\p{L}\\p{N}]+", " ")), " "),
      t => t =!= "")

  /**
   * Word k-shingles (distinct): sliding windows of `k` tokens joined by a
   * single space; documents shorter than `k` tokens yield one whole-text
   * shingle. Built with higher-order functions over the token array —
   * no explode, so shingling adds zero shuffle.
   */
  def shingles(tokens: Column, k: Int): Column = {
    val windows = transform(
      sequence(lit(1), greatest(size(tokens) - (k - 1), lit(1))),
      i => concat_ws(" ", slice(tokens, i, lit(k))))
    array_distinct(windows)
  }
}
