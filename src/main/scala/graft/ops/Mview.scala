package graft.ops

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/**
 * Materialized views with INCREMENTAL, exactly-once refresh — the
 * door-level face of `IncrementalAgg` + `VersionedPartitioned.
 * changedSides` (delta-rule view maintenance; see IncrementalAgg's
 * header for the provenance and exactness argument).
 *
 * A view is `SELECT <group cols>, count(*)/sum(c) AS … FROM <versioned
 * partitioned table> [WHERE <pred>] GROUP BY <group cols>`. State is
 * stored in the IncrementalAgg shape (group cols + `n_rows` +
 * `sum_<c>`) as one atomically-swapped parquet dir whose `_mv_cursor`
 * marker — written INTO the swap — records the source version the
 * state equals. REFRESH reads only the partitions the source touched
 * since the cursor (`changedSides` — O(changed), never O(table)),
 * folds the delta, and swaps state + new cursor in one rename:
 *   - crash before the swap: nothing moved, re-REFRESH re-does the
 *     same window;
 *   - crash inside the swap: `Exchange.recoverSwap` restores the
 *     previous state+cursor pair;
 *   - the cursor can never disagree with the state it rode in with —
 *     a delta can neither double-apply nor be lost.
 * The WHERE predicate commutes with the delta rule (filter before
 * aggregate on both sides), so any deterministic row predicate is
 * legal. `n_rows` is always maintained even when the view does not
 * expose a count — group death (a group's last row deleted) is decided
 * by the maintained count reaching 0, exactly as a recompute would
 * drop the group.
 *
 * At 100 TB this is the difference between re-scanning the fact table
 * on every dashboard refresh and folding one day's partitions.
 */
object Mview {

  val CursorMarker = "_mv_cursor"
  val DefFile = "_graft_mview.def"

  /** One output column of the view: `kind` ∈ {group, count, sum},
    * `src` the source column ("*" for count), `out` the visible name. */
  final case class OutCol(kind: String, src: String, out: String)

  /** `dim`/`keys` present = a two-relation JOIN view (fact ⋈ dim on
    * same-named equi-keys) maintained by `IncrementalAgg.maintainJoin`
    * with a composite fact-version,dim-version cursor. */
  final case class Def(source: String, groups: Seq[String],
      sums: Seq[String], where: Option[String], out: Seq[OutCol],
      dim: Option[String] = None, keys: Seq[String] = Nil) {
    def render: String =
      s"source=$source\ngroups=${groups.mkString(",")}\n" +
        s"sums=${sums.mkString(",")}\n" +
        s"where=${where.getOrElse("-")}\n" +
        s"out=${out.map(o => s"${o.kind}:${o.src}:${o.out}").mkString(",")}\n" +
        s"dim=${dim.getOrElse("-")}\nkeys=${keys.mkString(",")}\n"
  }

  object Def {
    def parse(s: String): Def = {
      val kv = s.linesIterator.filter(_.contains("="))
        .map { l => val i = l.indexOf('='); (l.take(i), l.drop(i + 1)) }
        .toMap
      Def(kv("source"),
        kv("groups").split(",").filter(_.nonEmpty).toSeq,
        kv("sums").split(",").filter(_.nonEmpty).toSeq,
        Some(kv("where")).filter(_ != "-"),
        kv("out").split(",").filter(_.nonEmpty).toSeq.map { t =>
          val Array(k, src, outName) = t.split(":", 3)
          OutCol(k, src, outName)
        },
        kv.get("dim").filter(_ != "-"),
        kv.get("keys").toSeq.flatMap(_.split(",")).filter(_.nonEmpty))
    }
  }

  /** The IncrementalAgg-shaped state of `rows` per `d`. */
  private def stateOf(d: Def, rows: DataFrame): DataFrame =
    IncrementalAgg.aggregate(
      d.where.map(w => rows.where(expr(w))).getOrElse(rows),
      d.groups, d.sums)

  /** The visible projection of a raw state frame. */
  def project(d: Def, state: DataFrame): DataFrame =
    state.select(d.out.map {
      case OutCol("group", src, outName) => col(s"`$src`").as(outName)
      case OutCol("count", _, outName) => col("n_rows").as(outName)
      case OutCol("sum", src, outName) => col(s"`sum_$src`").as(outName)
      case other => throw new IllegalStateException(s"bad out col $other")
    }: _*)

  /** Build the initial state pinned at the source's CURRENT version
    * and swap it in with its cursor. Returns the cursor version. An
    * empty source table (zero live partitions) still works — the
    * aggregate over its typed empty read is a typed empty state — but
    * a source with NO commit log at all is refused at the call site
    * (there is no version to pin a cursor to). */
  def initialize(spark: SparkSession, d: Def, sourceRoot: String,
      stateDir: String, dimRoot: Option[String] = None): Long = {
    def pin(root: String): Long =
      VersionedPartitioned.currentVersion(spark, root)
        .getOrElse(throw new IllegalArgumentException(
          s"materialized view over $root: the source has no " +
            "committed version to pin the cursor to — insert first"))
    val v0 = pin(sourceRoot)
    dimRoot match {
      case None =>
        writeState(spark, d, stateDir,
          stateOf(d, VersionedPartitioned.readAt(spark, sourceRoot, v0)),
          v0.toString)
      case Some(dr) =>
        val vd = pin(dr)
        val state = IncrementalAgg.joinAggregate(
          VersionedPartitioned.readAt(spark, sourceRoot, v0),
          VersionedPartitioned.readAt(spark, dr, vd),
          d.keys, d.groups, d.sums)
        writeState(spark, d, stateDir, state, s"$v0,$vd")
    }
    v0
  }

  /** Incremental refresh: fold the source's changes since the cursor
    * into the state; no-op when the source has not advanced. With
    * `full = true`, recompute from scratch at the current version (the
    * escape hatch for a definition the delta rule cannot carry, e.g.
    * after destructive source surgery). Returns the new cursor. */
  def refresh(spark: SparkSession, d: Def, sourceRoot: String,
      stateDir: String, full: Boolean = false,
      dimRoot: Option[String] = None): Long = {
    Exchange.recoverSwap(spark, stateDir)
    val cur = VersionedPartitioned.currentVersion(spark, sourceRoot)
      .getOrElse(0L)
    val cursors = readCursors(spark, stateDir)
    val cursor = cursors.head
    dimRoot match {
      case None =>
        if (full) {
          require(cur > 0L, s"REFRESH FULL: $sourceRoot has no commits")
          writeState(spark, d, stateDir,
            stateOf(d,
              VersionedPartitioned.readAt(spark, sourceRoot, cur)),
            cur.toString)
          return cur
        }
        if (cur == cursor) return cursor
        require(cur > cursor,
          s"materialized-view cursor $cursor is AHEAD of source version " +
            s"$cur — the source history was rewritten under the view; " +
            "REFRESH ... FULL to rebuild")
        val (oldSide, newSide) =
          VersionedPartitioned.changedSides(spark, sourceRoot, cursor,
            Some(cur))
        val pred = (df: DataFrame) =>
          d.where.map(w => df.where(expr(w))).getOrElse(df)
        val maintained = IncrementalAgg.maintain(rawState(spark, stateDir),
          pred(oldSide), pred(newSide), d.groups, d.sums)
        writeState(spark, d, stateDir, maintained, cur.toString)
        cur
      case Some(dr) =>
        // two-relation delta rule: ΔF ⋈ D_new + F_old ⋈ ΔD, composite
        // (factVersion, dimVersion) cursor riding the same atomic swap
        val dimCursor = cursors.lift(1).getOrElse(
          throw new IllegalStateException(
            s"join-view cursor under $stateDir lacks its dim component"))
        val curD = VersionedPartitioned.currentVersion(spark, dr)
          .getOrElse(0L)
        if (full) {
          require(cur > 0L && curD > 0L,
            s"REFRESH FULL: a join-view source has no commits")
          writeState(spark, d, stateDir, IncrementalAgg.joinAggregate(
            VersionedPartitioned.readAt(spark, sourceRoot, cur),
            VersionedPartitioned.readAt(spark, dr, curD),
            d.keys, d.groups, d.sums), s"$cur,$curD")
          return cur
        }
        if (cur == cursor && curD == dimCursor) return cursor
        require(cur >= cursor && curD >= dimCursor,
          s"join-view cursor ($cursor,$dimCursor) is AHEAD of sources " +
            s"($cur,$curD) — history rewritten; REFRESH ... FULL")
        val (oldF, newF) = VersionedPartitioned.changedSides(spark,
          sourceRoot, cursor, Some(cur))
        val (oldD, newD) = VersionedPartitioned.changedSides(spark,
          dr, dimCursor, Some(curD))
        val maintained = IncrementalAgg.maintainJoin(
          rawState(spark, stateDir),
          oldFact = VersionedPartitioned.readAt(spark, sourceRoot, cursor),
          oldFactChanged = oldF, newFactChanged = newF,
          newDim = VersionedPartitioned.readAt(spark, dr, curD),
          oldDimChanged = oldD, newDimChanged = newD,
          d.keys, d.groups, d.sums)
        writeState(spark, d, stateDir, maintained, s"$cur,$curD")
        cur
    }
  }

  /** The raw (IncrementalAgg-shaped) state. */
  def rawState(spark: SparkSession, stateDir: String): DataFrame = {
    Exchange.recoverSwap(spark, stateDir)
    spark.read.parquet(stateDir)
  }

  def readCursor(spark: SparkSession, stateDir: String): Long =
    readCursors(spark, stateDir).head

  /** The cursor components (one for a single-table view; fact,dim for
    * a join view). */
  def readCursors(spark: SparkSession, stateDir: String): Seq[Long] = {
    Exchange.recoverSwap(spark, stateDir)
    val (fs, p) = Versioned.fsOf(spark, stateDir)
    val m = new HPath(p, CursorMarker)
    require(fs.exists(m), s"no $CursorMarker under $stateDir — not a " +
      "materialized-view state dir")
    val in = fs.open(m)
    try {
      val buf = new Array[Byte](fs.getFileStatus(m).getLen.toInt)
      in.readFully(0, buf)
      new String(buf, java.nio.charset.StandardCharsets.UTF_8).trim
        .split(",").toSeq.map(_.trim.toLong)
    } finally in.close()
  }

  private def writeState(spark: SparkSession, d: Def, stateDir: String,
      state: DataFrame, cursor: String): Unit =
    Exchange.swapTableWith(state, stateDir,
      Map(CursorMarker -> cursor))
}
