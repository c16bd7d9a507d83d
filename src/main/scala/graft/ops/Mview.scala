package graft.ops

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Materialized views with INCREMENTAL, exactly-once refresh — the
 * door-level face of `IncrementalAgg` + `VersionedPartitioned.
 * changedSides` (delta-rule view maintenance; see IncrementalAgg's
 * header for the provenance and exactness argument).
 *
 * A view is `SELECT <group cols>, count(*)/sum(c)/min(c)/max(c)/avg(c)
 * AS … FROM <versioned partitioned table> [WHERE <pred>] GROUP BY
 * <group cols>`. State is stored in the IncrementalAgg shape (group
 * cols + `n_rows` + `sum_<c>`) — extended with `cnt_<c>` (non-null
 * counts, for NULL-exact sums and exact averages) and `min_/max_<c>`
 * when the def carries min/max/avg — as one atomically-swapped parquet
 * dir whose `_mv_cursor` marker — written INTO the swap — records the
 * source version the state equals. REFRESH reads only the partitions
 * the source touched since the cursor (`changedSides` — O(changed),
 * never O(table)) plus, for min/max views only, the rows of groups a
 * delete MIGHT have de-extremed ([[maintainExtended]]), folds the
 * delta, and swaps state + new cursor in one rename:
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

  /** One output column of the view: `kind` ∈ {group, count, sum, min,
    * max, avg}, `src` the source column ("*" for count), `out` the
    * visible name. */
  final case class OutCol(kind: String, src: String, out: String)

  /** `dim`/`keys` present = a two-relation JOIN view (fact ⋈ dim on
    * same-named equi-keys) maintained by `IncrementalAgg.maintainJoin`
    * with a composite fact-version,dim-version cursor.
    *
    * `mins`/`maxs`/`avgs` present = the EXTENDED state shape: the
    * state additionally carries `min_`/`max_` per extreme column and
    * a non-null count `cnt_` per sum/avg column, maintained by the
    * split rule [[Mview.maintainExtended]] documents. An extended
    * JOIN view maintains the same rule over the JOINED relation's
    * true changed row sets (see `refresh`'s join branch). */
  final case class Def(source: String, groups: Seq[String],
      sums: Seq[String], where: Option[String], out: Seq[OutCol],
      dim: Option[String] = None, keys: Seq[String] = Nil,
      mins: Seq[String] = Nil, maxs: Seq[String] = Nil,
      avgs: Seq[String] = Nil) {

    /** min/max/avg present → the extended state shape. */
    def extended: Boolean =
      mins.nonEmpty || maxs.nonEmpty || avgs.nonEmpty

    /** Columns needing `sum_`/`cnt_` state (sum ∪ avg). */
    def sumCnt: Seq[String] = (sums ++ avgs).distinct

    /** Columns needing `min_`/`max_` state (min ∪ max — both kept:
      * an extra aggregate-sized column is cheaper than two shapes). */
    def minMax: Seq[String] = (mins ++ maxs).distinct

    def render: String =
      s"source=$source\ngroups=${groups.mkString(",")}\n" +
        s"sums=${sums.mkString(",")}\n" +
        // the WHERE predicate is the one free-text field: a multi-line
        // statement (MvBodyRe is (?is)) must round-trip through the
        // line-oriented def file, so newlines/backslashes are escaped —
        // an unescaped render truncated the predicate to its first line
        // and every later REFRESH folded with a DIFFERENT filter
        s"where=${where.map(Def.enc).getOrElse("-")}\n" +
        s"out=${out.map(o => s"${o.kind}:${o.src}:${o.out}").mkString(",")}\n" +
        s"dim=${dim.getOrElse("-")}\nkeys=${keys.mkString(",")}\n" +
        s"mins=${mins.mkString(",")}\nmaxs=${maxs.mkString(",")}\n" +
        s"avgs=${avgs.mkString(",")}\n"
  }

  object Def {
    private[Mview] def enc(s: String): String =
      s.replace("\\", "\\\\").replace("\r", "\\r").replace("\n", "\\n")

    private def dec(s: String): String = {
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case _ => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }

    private val Known = Set("source", "groups", "sums", "where", "out",
      "dim", "keys", "mins", "maxs", "avgs")

    def parse(s: String): Def = {
      // every line must attribute to a known key — silently dropping a
      // line would refresh the view under a truncated definition
      val kv = s.linesIterator.filter(_.nonEmpty).map { l =>
        val i = l.indexOf('=')
        require(i > 0 && Known.contains(l.take(i)),
          s"materialized-view def: unattributable line '$l' — " +
            "the def file is corrupt; DROP and re-CREATE the view")
        (l.take(i), l.drop(i + 1))
      }.toMap
      Def(kv("source"),
        kv("groups").split(",").filter(_.nonEmpty).toSeq,
        kv("sums").split(",").filter(_.nonEmpty).toSeq,
        Some(kv("where")).filter(_ != "-").map(dec),
        kv("out").split(",").filter(_.nonEmpty).toSeq.map { t =>
          val Array(k, src, outName) = t.split(":", 3)
          OutCol(k, src, outName)
        },
        kv.get("dim").filter(_ != "-"),
        kv.get("keys").toSeq.flatMap(_.split(",")).filter(_.nonEmpty),
        kv.get("mins").toSeq.flatMap(_.split(",")).filter(_.nonEmpty),
        kv.get("maxs").toSeq.flatMap(_.split(",")).filter(_.nonEmpty),
        kv.get("avgs").toSeq.flatMap(_.split(",")).filter(_.nonEmpty))
    }
  }

  /** The state of `rows` per `d`: the IncrementalAgg shape for plain
    * count/sum views, the extended shape when min/max/avg are carried. */
  private def stateOf(d: Def, rows: DataFrame): DataFrame = {
    val filtered = d.where.map(w => rows.where(expr(w))).getOrElse(rows)
    if (d.extended) extendedShape(d, filtered)
    else IncrementalAgg.aggregate(filtered, d.groups, d.sums)
  }

  /** The typed state shape over an arbitrary (possibly empty) frame —
    * the door derives the view's visible schema from it at CREATE. */
  def stateShape(d: Def, rows: DataFrame,
      dimRows: Option[DataFrame] = None): DataFrame = dimRows match {
    case None => stateOf(d, rows)
    case Some(dr) if d.extended => extendedShape(d, rows.join(dr, d.keys))
    case Some(dr) =>
      IncrementalAgg.joinAggregate(rows, dr, d.keys, d.groups, d.sums)
  }

  /** The extended state aggregate of pre-filtered rows: groups,
    * `n_rows`, `sum_`/`cnt_` per sum∪avg column, `min_`/`max_` per
    * min∪max column. The non-null count `cnt_` is what keeps sum/avg
    * NULL-exact under maintenance: a group whose maintained non-null
    * count reaches zero projects NULL, exactly as a recompute would. */
  private def extendedShape(d: Def, rows: DataFrame): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      (d.sumCnt.flatMap(c => Seq(sum(col(s"`$c`")).as(s"sum_$c"),
          count(col(s"`$c`")).as(s"cnt_$c"))) ++
        d.minMax.flatMap(c => Seq(min(col(s"`$c`")).as(s"min_$c"),
          max(col(s"`$c`")).as(s"max_$c"))))
    rows.groupBy(d.groups.map(c => col(s"`$c`")): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** The visible projection of a raw state frame. */
  def project(d: Def, state: DataFrame): DataFrame =
    state.select(d.out.map {
      case OutCol("group", src, outName) => col(s"`$src`").as(outName)
      case OutCol("count", _, outName) => col("n_rows").as(outName)
      case OutCol("sum", src, outName) =>
        // extended state stores a maintained 0 where a direct
        // aggregate stores NULL; cnt_ decides which the scan would say
        if (d.extended)
          when(col(s"`cnt_$src`") > 0, col(s"`sum_$src`")).as(outName)
        else col(s"`sum_$src`").as(outName)
      case OutCol("min", src, outName) => col(s"`min_$src`").as(outName)
      case OutCol("max", src, outName) => col(s"`max_$src`").as(outName)
      case OutCol("avg", src, outName) =>
        // exact mean from the exact maintained pair — one division,
        // Spark's own sum/count division semantics per input type
        when(col(s"`cnt_$src`") > 0,
          col(s"`sum_$src`") / col(s"`cnt_$src`")).as(outName)
      case other => throw new IllegalStateException(s"bad out col $other")
    }: _*)

  /**
   * Maintain the EXTENDED state under one partition-replacement window
   * — the split rule:
   *
   *  - `n_rows` / `cnt_<c>` / `sum_<c>` are subtractable: state − old
   *    + new per group, exact (`cnt_` decides NULL-vs-0 for the
   *    projected sum, so a window deleting a group's last non-null
   *    value still projects NULL exactly as a recompute);
   *  - `min_`/`max_` are NOT subtractable: inserts merge for free
   *    (least/greatest skip nulls), and only groups whose deletes
   *    MIGHT have de-extremed a candidate — a deleted value tying or
   *    bounding the merged extreme, or any comparison undecidable from
   *    nulls — are RESCANNED from `sourceAtTo` (the source at the
   *    window's own end version), restricted to exactly those groups
   *    by a broadcast semi-join. The rescan recomputes the WHOLE cell
   *    (counts and sums too), so both halves stay one frame.
   *
   * This is `Streaming.maintainMinMax`'s affected-group rule re-hosted
   * on `changedSides` windows and widened to carry sums/counts, with
   * one structural change: the three inputs merge by UNION + hash
   * aggregation (each side contributes ≤1 row per group, so `max`
   * collapses them losslessly) instead of full-outer joins — one
   * shuffle instead of two, and NULL group keys merge correctly
   * (groupBy treats NULL as a group; a join would tear them apart).
   *
   * Steady state: O(changed partitions) + O(affected groups' rows),
   * never O(table); a window with no affected groups leaves the
   * semi-join's build side empty and AQE's empty-relation propagation
   * collapses the rescan branch, so the source scan never runs.
   */
  private def maintainExtended(d: Def, state: DataFrame,
      oldChanged: DataFrame, newChanged: DataFrame,
      sourceAtTo: DataFrame): DataFrame = {
    val gcols = d.groups.map(c => col(s"`$c`"))
    def side(df: DataFrame, p: String): DataFrame = {
      val aggs = count(lit(1)).as(s"${p}n") +:
        (d.sumCnt.flatMap(c => Seq(sum(col(s"`$c`")).as(s"${p}sum_$c"),
            count(col(s"`$c`")).as(s"${p}cnt_$c"))) ++
          d.minMax.flatMap(c => Seq(min(col(s"`$c`")).as(s"${p}min_$c"),
            max(col(s"`$c`")).as(s"${p}max_$c"))))
      df.groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)
    }
    val sState = state.select(gcols ++ (col("n_rows").as("__s_n") +:
      (d.sumCnt.flatMap(c => Seq(col(s"`sum_$c`").as(s"__s_sum_$c"),
          col(s"`cnt_$c`").as(s"__s_cnt_$c"))) ++
        d.minMax.flatMap(c => Seq(col(s"`min_$c`").as(s"__s_min_$c"),
          col(s"`max_$c`").as(s"__s_max_$c"))))): _*)
    val merged = sState
      .unionByName(side(newChanged, "__i_"), allowMissingColumns = true)
      .unionByName(side(oldChanged, "__d_"), allowMissingColumns = true)
      .groupBy(gcols: _*)
      .agg(max(col("__s_n")).as("__s_n"),
        (Seq(max(col("__i_n")).as("__i_n"), max(col("__d_n")).as("__d_n")) ++
          d.sumCnt.flatMap(c => Seq("__s_", "__i_", "__d_").flatMap(p =>
            Seq(max(col(s"`${p}sum_$c`")).as(s"${p}sum_$c"),
              max(col(s"`${p}cnt_$c`")).as(s"${p}cnt_$c")))) ++
          d.minMax.flatMap(c => Seq("__s_", "__i_", "__d_").flatMap(p =>
            Seq(max(col(s"`${p}min_$c`")).as(s"${p}min_$c"),
              max(col(s"`${p}max_$c`")).as(s"${p}max_$c"))))): _*)
    val types = state.schema.fields.map(f => f.name -> f.dataType).toMap
    def nz(c: org.apache.spark.sql.Column) = coalesce(c, lit(0))
    val nNext = nz(col("__s_n")) + nz(col("__i_n")) - nz(col("__d_n"))
    def cntNext(c: String) = nz(col(s"`__s_cnt_$c`")) +
      nz(col(s"`__i_cnt_$c`")) - nz(col(s"`__d_cnt_$c`"))
    def sumNext(c: String) =
      (nz(col(s"`__s_sum_$c`")) + nz(col(s"`__i_sum_$c`")) -
        nz(col(s"`__d_sum_$c`"))).cast(types(s"sum_$c"))
    def candMin(c: String) =
      least(col(s"`__s_min_$c`"), col(s"`__i_min_$c`"))
    def candMax(c: String) =
      greatest(col(s"`__s_max_$c`"), col(s"`__i_max_$c`"))
    // rescan-on-doubt: exactly Streaming.maintainMinMax's rule — the
    // outer coalesce makes an undecidable comparison rescan, never drop
    val rescan =
      if (d.minMax.isEmpty) lit(false)
      else nz(col("__d_n")) > 0 &&
        coalesce(col("__s_n").isNull || d.minMax.map(c =>
          col(s"`__d_min_$c`") <= candMin(c) ||
            col(s"`__d_max_$c`") >= candMax(c)).reduce(_ || _), lit(true))
    val keepCols = gcols ++ (nNext.cast("long").as("n_rows") +:
      (d.sumCnt.flatMap(c => Seq(sumNext(c).as(s"sum_$c"),
          cntNext(c).cast("long").as(s"cnt_$c"))) ++
        d.minMax.flatMap(c => Seq(candMin(c).as(s"min_$c"),
          candMax(c).as(s"max_$c")))))
    val kept = merged.where(!rescan && nNext > 0).select(keepCols: _*)
    val affected = merged.where(rescan).select(gcols: _*)
    // null-safe semi-join: a NULL group key is a group too — a plain
    // equi-join would never match it and its rescan would drop it
    val rescanned = extendedShape(d,
      sourceAtTo.join(broadcast(affected),
        d.groups.map(g => sourceAtTo(g) <=> affected(g)).reduce(_ && _),
        "left_semi"))
    kept.unionByName(rescanned)
  }

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
        val state = stateShape(d,
          VersionedPartitioned.readAt(spark, sourceRoot, v0),
          Some(VersionedPartitioned.readAt(spark, dr, vd)))
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
          // a fully-retracted source (zero live partitions) recomputes
          // to an empty view; the format read refuses an empty
          // manifest, so reuse the state's own (stable) schema
          val next =
            if (VersionedPartitioned
                .partitions(spark, sourceRoot, Some(cur)).isEmpty)
              rawState(spark, stateDir).where(lit(false))
            else stateOf(d,
              VersionedPartitioned.readAt(spark, sourceRoot, cur))
          writeState(spark, d, stateDir, next, cur.toString)
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
        val maintained =
          if (d.extended) {
            // min/max need the affected-group rescan at the window's
            // own end version; counts/sums ride the same pass. A
            // source with ZERO live partitions at `cur` (everything
            // retracted) has nothing to rescan — the format read
            // refuses an empty manifest, so hand it an empty frame
            val srcAtTo =
              if (VersionedPartitioned
                  .partitions(spark, sourceRoot, Some(cur)).isEmpty)
                newSide.where(lit(false))
              else VersionedPartitioned.readAt(spark, sourceRoot, cur)
            maintainExtended(d, rawState(spark, stateDir),
              pred(oldSide), pred(newSide), pred(srcAtTo))
          }
          else IncrementalAgg.maintain(rawState(spark, stateDir),
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
          // a fully-retracted side recomputes to an empty view; the
          // format read refuses an empty manifest, so reuse the
          // state's own (stable) schema
          val next =
            if (VersionedPartitioned
                  .partitions(spark, sourceRoot, Some(cur)).isEmpty ||
                VersionedPartitioned.partitions(spark, dr, Some(curD))
                  .isEmpty)
              rawState(spark, stateDir).where(lit(false))
            else stateShape(d,
              VersionedPartitioned.readAt(spark, sourceRoot, cur),
              Some(VersionedPartitioned.readAt(spark, dr, curD)))
          writeState(spark, d, stateDir, next, s"$cur,$curD")
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
        val maintained =
          if (d.extended) {
            // extended (min/max/avg) join views maintain the
            // single-table split rule over the JOINED relation's TRUE
            // changed row sets — NOT maintainJoin's signed terms:
            //   ΔJ_old = ΔF_old ⋈ D_old  ∪  F_unch ⋈ ΔD_old
            //   ΔJ_new = ΔF_new ⋈ D_new  ∪  F_unch ⋈ ΔD_new
            // F_unch (fact partitions untouched in the window) is
            // identical at both versions, so each union is a disjoint
            // partition split and J_old ∖ ΔJ_old = J_new ∖ ΔJ_new —
            // exactly maintainExtended's contract. The signed
            // cancellation counts/sums ride on would feed least/
            // greatest values that are NOT in the final join (a
            // deleted fact row joined to the new dim rides
            // maintainJoin's plus term F_old ⋈ ΔD_new), so min/max
            // maintenance needs membership precision. Cost shape is
            // maintainJoin's: the F_unch ⋈ ΔD terms restrict the
            // unchanged fact to changed dim keys (broadcast-sized dim
            // deltas at scale), and the rescan-on-doubt branch over
            // J_new collapses via AQE when no group is affected.
            def orEmpty(root: String, v: Long, proto: DataFrame)
                : DataFrame =
              if (v <= 0L || VersionedPartitioned
                    .partitions(spark, root, Some(v)).isEmpty)
                proto.where(lit(false))
              else VersionedPartitioned.readAt(spark, root, v)
            val dimOld = orEmpty(dr, dimCursor, newD)
            val dimNew = orEmpty(dr, curD, newD)
            val factUnch = VersionedPartitioned
              .unchangedSide(spark, sourceRoot, cursor, Some(cur))
              .getOrElse(newF.where(lit(false)))
            val jOld = oldF.join(dimOld, d.keys)
              .unionByName(factUnch.join(oldD, d.keys))
            val jNew = newF.join(dimNew, d.keys)
              .unionByName(factUnch.join(newD, d.keys))
            val srcAtTo = orEmpty(sourceRoot, cur, newF)
              .join(dimNew, d.keys)
            maintainExtended(d, rawState(spark, stateDir),
              jOld, jNew, srcAtTo)
          }
          else IncrementalAgg.maintainJoin(
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
