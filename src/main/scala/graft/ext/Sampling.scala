package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for corpus curation. Both ops are pure row-local
 * predicates on a content/id hash: embarrassingly parallel (zero
 * shuffle), reproducible across runs, engines and backfills (`rand()` is
 * none of those), and composable with any downstream pipeline stage.
 */
object Sampling {

  /**
   * Stratified downsampling with per-group keep rates — the language/
   * source rebalancing step of a training-data pipeline (e.g. keep 25 %
   * of English, 100 % of everything else). A row is kept iff the first
   * 16 bits of md5(id) — compared as the lowercase hex prefix, which
   * orders identically to the integer in every engine — fall under its
   * group's rate. Rate granularity is 1/65536.
   *
   * Membership depends only on (id, own group rate): re-sampling after
   * new data arrives keeps exactly the previously-kept rows (append-only
   * stability), and tightening one group's rate never changes another's
   * sample.
   */
  def stratifiedByHash(df: DataFrame, groupCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    // "g" sorts above every hex digit → keep-all without a 5-char
    // threshold (lexicographic "ffff" < "10000" is false, so the
    // integer 65536 cannot be expressed as a comparable hex string)
    def hex(f: Double) = {
      require(f >= 0.0 && f <= 1.0, s"rate $f outside [0, 1]")
      if (f >= 1.0) "g" else f"${(f * 65536).toInt}%04x"
    }
    val threshold = rates.foldLeft(lit(hex(defaultRate)): Column) {
      case (acc, (group, f)) =>
        when(col(groupCol) === group, lit(hex(f))).otherwise(acc)
    }
    df.where(substring(md5(col(idCol).cast("string")), 1, 4) < threshold)
  }
}
