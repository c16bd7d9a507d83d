package graft.ops

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/**
 * Snapshot-isolated PARTITIONED promote — the unification of
 * `Exchange.promoteAtomic` (per-partition replacement for big
 * date-partitioned fact tables, reference `dags/dag.py:292-311`,
 * `PARTITIONED BY (date)` at `dags/dag.py:141,146,352`) with
 * `Versioned`'s commit-pointer machinery. `promoteAtomic` replaces a
 * partition with a rename pair, so a reader listing the table mid-swap
 * can see a partition momentarily absent, and a multi-partition
 * backfill is visible partition-by-partition. Here nothing visible is
 * ever renamed:
 *
 *  - Each promote writes ONLY the incoming partitions into a fresh,
 *    immutable `snap-<uuid>/<partCol>=<value>/` tree.
 *  - A commit file carries a PARTITION MANIFEST: one line per live
 *    partition naming the snapshot dir that holds it. The new commit's
 *    manifest = previous manifest ++ (incoming partitions → new snap).
 *    Untouched partitions keep pointing at their existing snapshot
 *    dirs — per-partition snapshot REUSE, the manifest idea at the
 *    heart of Iceberg's HadoopTableOperations, at its smallest useful
 *    size (a 100-commit table re-lists old data zero times; promote
 *    cost is O(changed partitions) regardless of table size).
 *  - Readers resolve the manifest ONCE, then scan immutable dirs: a
 *    multi-partition backfill is all-or-nothing — a concurrent reader
 *    sees entirely-old or entirely-new partitions, never a mix.
 *
 * Concurrency: the commit create is the same optimistic claim as
 * `Versioned` — but because a manifest MERGES with its predecessor, a
 * loser must re-read the latest manifest before retrying (its merge
 * base moved), or it would silently drop the winner's partitions
 * (lost update). The claim loop below re-merges per attempt.
 *
 * Format note: this object and `Versioned` use the same `_v*.commit`
 * claim protocol but different content formats (a `graft-manifest v1`
 * header marks this one); a root belongs to exactly one of the two.
 */
object VersionedPartitioned {

  private val Marker = "graft-manifest v1"
  private val TagPrefix = "tag:"

  /** partition-dir-name (e.g. "date=2024-01-01") → snapshot dir name. */
  final case class Manifest(partitionCol: String,
      entries: Map[String, String], tag: Option[String])

  private def render(m: Manifest): String = {
    require(!m.partitionCol.exists(c => c == '\n' || c == '\t'),
      "partition column name must not contain tab/newline")
    m.tag.foreach(t => require(t.nonEmpty && !t.contains('\n'),
      "tag must be non-empty and single-line"))
    val header = s"$Marker\t${m.partitionCol}"
    val tagLine = m.tag.map(TagPrefix + _).toSeq
    val rows = m.entries.toSeq.sorted.map { case (p, s) => s"$p\t$s" }
    (header +: tagLine ++: rows).mkString("\n")
  }

  private def parse(content: String): Manifest = {
    val lines = content.linesIterator.toSeq
    val head = lines.headOption.getOrElse("")
    require(head.startsWith(Marker + "\t"),
      s"not a $Marker commit (is this a plain Versioned root?): $head")
    val partitionCol = head.stripPrefix(Marker + "\t")
    val tag = lines.drop(1).headOption.filter(_.startsWith(TagPrefix))
      .map(_.stripPrefix(TagPrefix))
    val rows = lines.drop(1).dropWhile(_.startsWith(TagPrefix))
    val entries = rows.filter(_.nonEmpty).map { l =>
      val i = l.indexOf('\t')
      require(i > 0, s"bad manifest row: $l")
      l.substring(0, i) -> l.substring(i + 1)
    }.toMap
    Manifest(partitionCol, entries, tag)
  }

  /** (version, manifest) for every parseable commit, ascending. */
  def history(spark: SparkSession, root: String): Seq[(Long, Manifest)] = {
    val (fs, rootPath) = Versioned.fsOf(spark, root)
    Versioned.rawHistory(fs, rootPath).map { case (v, c) => (v, parse(c)) }
  }

  def currentVersion(spark: SparkSession, root: String): Option[Long] =
    history(spark, root).lastOption.map(_._1)

  /** Every tag any commit carries (exactly-once replay detection, same
    * contract as `Versioned.committedTags`). */
  def committedTags(spark: SparkSession, root: String): Set[String] =
    history(spark, root).flatMap(_._2.tag).toSet

  /**
   * Replace exactly the partitions of `partitionCol` present in `df`
   * (the reference's per-ds DELETE+INSERT exchange, SURVEY §2.2 D6)
   * and return the committed version. Untouched partitions are
   * inherited from the previous manifest by reference; readers holding
   * an older version are unaffected (snapshot isolation).
   *
   * Like `Exchange.promote`, the frame is re-clustered on the
   * partition column so each partition dir gets one file per owning
   * task instead of the N-tasks × M-dates small-file explosion.
   */
  def promote(df: DataFrame, root: String, partitionCol: String = "date",
      tag: Option[String] = None, cluster: Boolean = true): Long = {
    val spark = df.sparkSession
    val (fs, rootPath) = Versioned.fsOf(spark, root)
    if (!fs.exists(rootPath)) fs.mkdirs(rootPath)
    val snapName = Versioned.SnapPrefix + UUID.randomUUID().toString
    val snapPath = new HPath(rootPath, snapName)
    val out = if (cluster) df.repartition(col(partitionCol)) else df
    out.write.mode("overwrite").partitionBy(partitionCol)
      .parquet(snapPath.toString)
    // The partitions actually written, read back from the snapshot's
    // own directory names — no re-implementation of Spark's partition
    // path escaping, and an empty frame promotes to a no-op manifest.
    val written = fs.listStatus(snapPath)
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith(partitionCol + "="))
      .map(_.getPath.getName -> snapName).toMap
    // Claim loop with per-attempt re-merge: a lost claim means the
    // merge base advanced — re-read it or drop the winner's partitions.
    var committed = -1L
    while (committed < 0) {
      val h = history(spark, root)
      h.lastOption.foreach { case (_, m) =>
        require(m.partitionCol == partitionCol,
          s"table is partitioned by ${m.partitionCol}, not $partitionCol")
      }
      val base = h.lastOption.map(_._2.entries).getOrElse(Map.empty)
      val v = h.lastOption.map(_._1).getOrElse(0L) + 1
      val content =
        render(Manifest(partitionCol, base ++ written, tag))
      val target = new HPath(rootPath,
        f"${Versioned.CommitPrefix}$v%020d${Versioned.CommitSuffix}")
      try {
        val os = fs.create(target, false)
        try os.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally os.close()
        committed = v
      } catch {
        case _: java.io.IOException if fs.exists(target) => // re-merge
      }
    }
    committed
  }

  /** Read the latest committed state: one immutable-parquet scan per
    * referenced snapshot dir (partition values recovered from dir
    * names via basePath), unioned by name. A frame resolved here is
    * pinned — later promotes do not change what it scans. */
  def read(spark: SparkSession, root: String): DataFrame =
    readManifest(spark, root, manifestAt(spark, root, None))

  /** Time travel: read the table exactly as of `version`. */
  def readAt(spark: SparkSession, root: String, version: Long): DataFrame =
    readManifest(spark, root, manifestAt(spark, root, Some(version)))

  private def manifestAt(spark: SparkSession, root: String,
      version: Option[Long]): Manifest = {
    val h = history(spark, root)
    require(h.nonEmpty, s"no committed version under $root")
    version match {
      case None => h.last._2
      case Some(n) => h.find(_._1 == n).map(_._2).getOrElse(
        throw new IllegalArgumentException(
          s"version $n not found under $root (have ${h.map(_._1).mkString(",")})"))
    }
  }

  private def readManifest(spark: SparkSession, root: String,
      m: Manifest): DataFrame = {
    require(m.entries.nonEmpty,
      s"manifest under $root has no live partitions (schema unknowable)")
    val rootPath = new HPath(root)
    val frames = m.entries.groupBy(_._2).toSeq.sortBy(_._1).map {
      case (snap, parts) =>
        val base = new HPath(rootPath, snap).toString
        spark.read.option("basePath", base)
          .parquet(parts.keys.toSeq.sorted.map(p => s"$base/$p"): _*)
    }
    frames.reduce(_.unionByName(_))
  }

  /** Rewrite the whole live state as ONE fresh snapshot (all manifest
    * entries point at it) — bounds the snapshot-dir sprawl an
    * append-only promote history accumulates, after which `vacuum`
    * reclaims every predecessor. */
  def compact(spark: SparkSession, root: String): Long = {
    val m = manifestAt(spark, root, None)
    promote(read(spark, root), root, m.partitionCol, tag = None)
  }

  /**
   * Schema evolution: add `name` (with `default`, cast to the column's
   * eventual type by the caller's expression) to every live partition
   * and commit the evolved state as one fresh snapshot — the
   * `Schemas.evolve` add-column-with-default grain, at table-format
   * level. One whole-table rewrite with a single atomic pointer flip:
   * readers resolve either the entirely-old or entirely-new schema,
   * never a per-partition mix (the failure mode of evolving a plain
   * partitioned dir in place). Older versions keep their original
   * schema — time travel replays history as it was.
   */
  def evolveAddColumn(spark: SparkSession, root: String, name: String,
      default: org.apache.spark.sql.Column): Long = {
    val m = manifestAt(spark, root, None)
    val live = read(spark, root)
    require(!live.columns.contains(name),
      s"column '$name' already exists under $root")
    promote(live.withColumn(name, default), root, m.partitionCol)
  }

  /** Retention with the same rules as `Versioned.vacuum`: keep the
    * newest `keepLast` manifests and every snapshot dir any of them
    * references; reclaim snapshots only superseded manifests used;
    * age-gate true orphans (a concurrent promote's snapshot exists
    * before its commit does). Returns snapshot dirs deleted. */
  def vacuum(spark: SparkSession, root: String, keepLast: Int,
      orphanMinAgeMs: Long = 3600000L): Int = {
    require(keepLast >= 1, s"need keepLast >= 1, got $keepLast")
    val (fs, rootPath) = Versioned.fsOf(spark, root)
    if (!fs.exists(rootPath)) return 0
    val h = history(spark, root)
    val committedDirs = h.flatMap(_._2.entries.values).toSet
    val keep = h.takeRight(keepLast)
    val keepDirs = keep.flatMap(_._2.entries.values).toSet
    val keepMin = keep.headOption.map(_._1).getOrElse(Long.MaxValue)
    fs.listStatus(rootPath).foreach { s =>
      val n = s.getPath.getName
      if (s.isFile && n.startsWith(Versioned.CommitPrefix)
          && n.endsWith(Versioned.CommitSuffix)) {
        val v = try n.stripPrefix(Versioned.CommitPrefix)
          .stripSuffix(Versioned.CommitSuffix).toLong
          catch { case _: NumberFormatException => Long.MinValue }
        if (v < keepMin) fs.delete(s.getPath, false)
      }
    }
    val now = System.currentTimeMillis()
    val snaps = fs.listStatus(rootPath)
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith(Versioned.SnapPrefix))
    val doomed = snaps.filterNot(s => keepDirs.contains(s.getPath.getName))
      .filter { s =>
        committedDirs.contains(s.getPath.getName) ||
          now - s.getModificationTime >= orphanMinAgeMs
      }
    doomed.foreach(s => fs.delete(s.getPath, true))
    doomed.length
  }
}
