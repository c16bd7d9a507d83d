package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Multi-table transactions over the file-based commit logs — the
 * Iceberg REST-catalog transaction shape (one commit spanning several
 * tables) re-derived without a catalog server. The reference pipeline's
 * natural use is its promote+cumulate pair (`dags/dag.py:292-311` then
 * `:322-354`): production and cumulative must move TOGETHER or a
 * consumer between the two sees a day's bars without its rolling
 * metrics.
 *
 * A transaction publishes its tables in a FIXED order, each commit
 * tagged `txn:<id>:<k>of<n>` (the tag rides the table's own commit
 * log — vacuum-safe, restart-proof, zero extra files). Because the
 * pointers are per-table files, the inter-publish window is the one
 * non-atomic moment, and both sides of it are closed:
 *
 *  - CRASH in the window: a prefix of the tables carries an id the
 *    suffix never completed. [[recover]] detects exactly that — an id
 *    whose position set does not cover 1..n — and rolls the prefix
 *    heads back (restore-forward commits, so the audit trail keeps the
 *    aborted attempt, Iceberg-rollback style). Run it before new
 *    writes, the same discipline as every WAL recovery.
 *  - CONCURRENT READERS: [[readAll]] resolves the newest transaction
 *    id COMPLETE on every requested table and time-travels each table
 *    to ITS version under that id — a snapshot-consistent cross-table
 *    view even while a transaction (or its recovery) is mid-flight.
 *    Tables never written transactionally fall back to head reads.
 *
 * Scale shape: everything here is commit-log metadata — tag parsing is
 * O(#versions) small file reads per table; no data I/O beyond the
 * promotes themselves and the final pinned reads.
 */
object Txn {

  val TagPrefix = "txn:"

  /** One table's write inside a transaction. */
  final case class Write(df: DataFrame, root: String, partitionCol: String)

  private val TagRe = """txn:([0-9a-f-]+):(\d+)of(\d+)""".r

  /**
   * Publish all writes under one transaction id, in order. Returns the
   * committed version per table. All-or-nothing modulo the crash
   * window `recover` closes; readers using `readAll` never observe a
   * partial transaction either way.
   */
  def commit(writes: Seq[Write]): Seq[Long] = {
    require(writes.nonEmpty, "empty transaction")
    val id = java.util.UUID.randomUUID().toString
    val n = writes.size
    writes.zipWithIndex.map { case (w, i) =>
      VersionedPartitioned.promote(w.df, w.root, w.partitionCol,
        tag = Some(s"$TagPrefix$id:${i + 1}of$n"))
    }
  }

  /** (version, txnId, position, size) for every txn-tagged commit on a
    * root — commit-log metadata only. */
  private def txnTags(spark: SparkSession, root: String)
      : Seq[(Long, String, Int, Int)] =
    if (VersionedPartitioned.currentVersion(spark, root).isEmpty) Nil
    else VersionedPartitioned.historyDf(spark, root)
      .select("version", "tag").collect().toSeq.flatMap { r =>
        Option(r.getAs[String]("tag")).collect {
          case TagRe(id, k, n) => (r.getAs[Long]("version"), id, k.toInt, n.toInt)
        }
      }

  /** Transaction ids whose tagged positions cover 1..n across `roots`
    * (complete), and the rest (incomplete). */
  private def partition(spark: SparkSession, roots: Seq[String])
      : (Map[String, Seq[(String, Long)]], Set[String]) = {
    val all = roots.flatMap(r => txnTags(spark, r).map {
      case (v, id, k, n) => (id, r, v, k, n) })
    val byId = all.groupBy(_._1)
    val complete = byId.filter { case (_, rows) =>
      rows.map(_._4).toSet == (1 to rows.head._5).toSet }
    (complete.map { case (id, rows) =>
      id -> rows.map(r => (r._2, r._3)) }, (byId.keySet -- complete.keySet))
  }

  /**
   * Roll back any table whose HEAD commits carry an INCOMPLETE
   * transaction id — the crash-window cleanup. A transaction may have
   * written one table SEVERAL times (several positions — the door's
   * DELETE-day-then-INSERT pair), and a crash during a previous
   * recovery can stack runs, so the rollback walks past the table's
   * whole head RUN of incomplete-transaction commits, not just one. A
   * table whose entire history is aborted-transaction commits closes
   * with one clean empty commit. Heads that have since been committed
   * over are left alone: the partial write is already part of
   * acknowledged history, and destroying newer commits would be worse
   * than the anomaly — run recover before new writes, like any WAL.
   *
   * Cost when idle (the common case — e.g. every SQL-door open): one
   * driver-side head-manifest read per root, zero jobs — rollback only
   * ever touches heads, so an untagged head proves there is nothing to
   * do on that root, and no txn-tagged head anywhere skips the full
   * history scan entirely.
   */
  def recover(spark: SparkSession, roots: Seq[String]): Seq[String] = {
    if (!roots.exists(r => VersionedPartitioned.headTag(spark, r)
        .exists(_.startsWith(TagPrefix)))) return Nil
    val (_, incomplete) = partition(spark, roots)
    if (incomplete.isEmpty) return Nil
    roots.flatMap { r =>
      VersionedPartitioned.currentVersion(spark, r).flatMap { head =>
        val aborted = txnTags(spark, r).filter(t => incomplete(t._2))
          .map(_._1).toSet
        if (!aborted(head)) None
        else {
          var target = head
          while (aborted(target)) target -= 1
          if (target >= 1L) {
            VersionedPartitioned.rollbackTo(spark, r, target)
            ()
          } else {
            // partitionCol is read from the existing manifest (a head
            // exists here), so the placeholder is never used
            VersionedPartitioned.emptyCommit(spark, r, "",
              Some(s"rollback-$TagPrefix$head"), dropAll = true)
            ()
          }
          Some(r)
        }
      }
    }
  }

  /**
   * Snapshot-consistent cross-table read: every root pinned to its
   * version under the NEWEST transaction id complete on ALL of them
   * (newest by the first root's version — commits are ordered, so any
   * root's order agrees). Roots with no common complete transaction
   * read at head (not under transaction discipline). One frame per
   * root, in input order.
   */
  def readAll(spark: SparkSession, roots: Seq[String]): Seq[DataFrame] = {
    val (complete, _) = partition(spark, roots)
    val common = complete.filter { case (_, rows) =>
      roots.forall(r => rows.exists(_._1 == r)) }
    if (common.isEmpty)
      roots.map(r => VersionedPartitioned.read(spark, r))
    else {
      // a transaction may write one table at several positions (the
      // door's DELETE+INSERT pair): the table's version under the id
      // is its LATEST tagged commit, and "newest transaction" orders
      // by that same maximum
      val (_, rows) = common.maxBy { case (_, rs) =>
        rs.filter(_._1 == roots.head).map(_._2).maxOption.getOrElse(0L) }
      roots.map { r =>
        VersionedPartitioned.readAt(spark, r,
          rows.filter(_._1 == r).map(_._2).max)
      }
    }
  }
}
