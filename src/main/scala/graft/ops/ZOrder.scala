package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) clustering key — multi-column data layout for scan
 * pruning. Sorting a table by the interleaved-bit key before writing
 * gives every output file a tight min/max range on EVERY participating
 * column at once, so parquet row-group stats (and partition-level
 * min/max indexes) prune selective filters on any of them — the layout
 * trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`, here as a plain
 * deterministic Column expression usable with
 * `repartitionByRange(zkey).sortWithinPartitions(zkey)` + write.
 *
 * The key is pure integer arithmetic (shift / mask / add over disjoint
 * bits), stays inside whole-stage codegen, and is reproducible in any
 * engine with `>>` and `&` — the oracle replays it symbolically in SQL
 * (`zkeySql` emits the identical formula).
 *
 * At 100 TB the layout job is one range-shuffle on the key (the same
 * cost as any global sort-for-layout) and is amortized over every later
 * pruned scan; the key itself adds no shuffle.
 */
object ZOrder {

  /**
   * Interleave the low `bits` bits of each column: bit j of column i
   * lands at output bit `j * n + i` (n = number of columns), so the
   * resulting order recursively tiles the space into quadrants/octants.
   * Inputs must be non-null integers in [0, 2^bits) — out-of-range
   * values raise (silent masking would scatter the layout, defeating
   * the pruning the caller paid the sort for). Map raw columns into
   * range first (e.g. `floor(col/step)`, dictionary codes, or a
   * monotone bucketing).
   */
  def zkey(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1, "zkey needs at least one column")
    require(bits >= 1 && n * bits <= 63, s"n*bits must be in [1, 63], got ${n * bits}")
    val terms = for {
      (c, i) <- cols.zipWithIndex
      cl = checked(c, bits)
      j <- 0 until bits
    } yield shiftright(cl, j).bitwiseAND(lit(1L)) * lit(1L << (j * n + i))
    terms.reduce(_ + _)
  }

  /** The same interleave as SQL text over `cols` (column names or
    * integer expressions) — for engines replaying the layout key. */
  def zkeySql(cols: Seq[String], bits: Int): String = {
    val n = cols.size
    (for {
      (c, i) <- cols.zipWithIndex
      j <- 0 until bits
    } yield s"((($c) >> $j) & 1) * ${1L << (j * n + i)}").mkString(" + ")
  }

  private def checked(c: Column, bits: Int): Column =
    when(c.isNull || c < 0 || c >= lit(1L << bits),
        raise_error(concat(
          lit(s"zkey: value out of [0, 2^$bits): "), c.cast("string"))))
      .otherwise(c.cast("long"))
}
