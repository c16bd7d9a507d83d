package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Parallel-array top-k buffer: scores descending, ids ascending within
  * a tied score. Arrays, not Seq — Encoders.product round-trips them
  * without per-element boxing. */
case class TopKBuf(scores: Array[Double], ids: Array[Long])

/**
 * Typed custom aggregation (`Aggregator[IN, BUF, OUT]`, SURVEY.md §2.12):
 * exact top-k (value, id) per group with k-BOUNDED state.
 *
 * Why a custom aggregator when `row_number() OVER (...) <= k` exists:
 * the window form must shuffle EVERY input row to its group's partition
 * before ranking (WindowGroupLimit prunes per-task, but each task still
 * sorts its slice), and `collect_list`-then-slice holds an unbounded
 * per-group buffer. This aggregator's state never exceeds k entries, it
 * combines map-side (partial top-k per input partition → merge), and
 * what crosses the network per partition per group is ≤ k (score, id)
 * pairs — at 100 TB with a million rows per hot group, the shuffle
 * carries k rows where the window carries a million.
 *
 * Deterministic: ordering is (score DESC, id ASC); merge is associative
 * and commutative, so the result is partitioning-independent
 * (spec-asserted under forced repartition).
 */
class TopKAgg(k: Int) extends Aggregator[(Double, Long), TopKBuf, Array[Long]] {
  require(k >= 1, "k must be >= 1")

  private def before(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  override def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)

  override def reduce(b: TopKBuf, a: (Double, Long)): TopKBuf = {
    val n = b.scores.length
    if (n == k && !before(a._1, a._2, b.scores(n - 1), b.ids(n - 1))) b
    else {
      // insertion position by binary-search-free scan: k is small by
      // contract (top-k, not top-million), so linear is the fast path
      var pos = 0
      while (pos < n && before(b.scores(pos), b.ids(pos), a._1, a._2)) pos += 1
      val m = math.min(n + 1, k)
      val s = new Array[Double](m)
      val ids = new Array[Long](m)
      System.arraycopy(b.scores, 0, s, 0, pos)
      System.arraycopy(b.ids, 0, ids, 0, pos)
      s(pos) = a._1
      ids(pos) = a._2
      val tail = m - pos - 1
      if (tail > 0) {
        System.arraycopy(b.scores, pos, s, pos + 1, tail)
        System.arraycopy(b.ids, pos, ids, pos + 1, tail)
      }
      TopKBuf(s, ids)
    }
  }

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
    val m = math.min(b1.scores.length + b2.scores.length, k)
    val s = new Array[Double](m)
    val ids = new Array[Long](m)
    var i = 0; var j = 0; var o = 0
    while (o < m) {
      val takeLeft = j >= b2.scores.length || (i < b1.scores.length &&
        before(b1.scores(i), b1.ids(i), b2.scores(j), b2.ids(j)))
      if (takeLeft) { s(o) = b1.scores(i); ids(o) = b1.ids(i); i += 1 }
      else { s(o) = b2.scores(j); ids(o) = b2.ids(j); j += 1 }
      o += 1
    }
    TopKBuf(s, ids)
  }

  override def finish(b: TopKBuf): Array[Long] = b.ids

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
