package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Iceberg-style HIDDEN partitioning for the manifest table format
 * (reference: Iceberg is the reference pipeline's table format —
 * `/root/reference/README.md:76`; its partition-transform model is
 * `days(ts)` / `bucket(n, col)` / `truncate(w, col)` specs the reader
 * never has to know about). The user writes and queries the SOURCE
 * column; the engine derives a physical partition column from the
 * transform, partitions the snapshot by it, and maps source-column
 * predicates onto partition-value predicates for pruning. Mistyped
 * manual partition keys ("one partition per timestamp" — the classic
 * identity-partition-on-a-timestamp accident) are impossible by
 * construction.
 *
 * The transform spec round-trips through the PHYSICAL COLUMN NAME
 * (`hp__days__ts`, `hp__bucket16__user_id`, …), so the manifest format
 * is untouched — every existing capability (time travel, branches,
 * WAP, rollback, vacuum, stats pruning) applies to hidden-partitioned
 * tables verbatim because a hidden-partitioned table IS a plain
 * partitioned table with a derived key.
 *
 * Scale: pruning happens at the MANIFEST level (driver-side set filter
 * over partition dirs — `VersionedPartitioned.readPartitionsWhere`),
 * so a day-range read of a year-deep 100 TB table plans only the
 * in-range partitions; the residual source-column predicate still
 * pushes into the parquet scan for row-level filtering inside boundary
 * partitions.
 */
sealed trait PartitionTransform {
  def sourceCol: String

  /** Deterministic physical partition column name; `PartitionTransform
    * .parse` recovers the spec from it. Must not start with '_' or '.'
    * (Spark's file index hides such directories). */
  def physCol: String

  /** The transform applied to an arbitrary expression — the DATA path
    * (`expr`) and the driver-side literal mapping (`HiddenPartition
    * .partitionValueOf`) share this one definition, so they cannot
    * drift. */
  def exprOf(c: Column): Column

  /** The physical partition-value expression (MultiOf overrides — it
    * spans several source columns). */
  def expr: Column = exprOf(col(sourceCol))

  /** True iff the transform preserves order in partition-value STRING
    * space (ISO dates, string prefixes) — the precondition for range
    * pruning. Bucket supports equality pruning only. */
  def monotone: Boolean
}

/** Day granularity over a timestamp/date column; partition values are
  * ISO `yyyy-MM-dd` strings (order-comparable as strings). */
final case class DaysOf(sourceCol: String) extends PartitionTransform {
  val physCol = s"hp__days__$sourceCol"
  def exprOf(c: Column): Column = date_format(c, "yyyy-MM-dd")
  val monotone = true
}

/** Month granularity (`yyyy-MM`). */
final case class MonthsOf(sourceCol: String) extends PartitionTransform {
  val physCol = s"hp__months__$sourceCol"
  def exprOf(c: Column): Column = date_format(c, "yyyy-MM")
  val monotone = true
}

/** Hash bucketing: `pmod(xxhash64(col), n)` — the point-lookup layout
  * for high-cardinality keys. */
final case class BucketOf(n: Int, sourceCol: String)
    extends PartitionTransform {
  require(n > 0, s"bucket count $n must be positive")
  val physCol = s"hp__bucket${n}__$sourceCol"
  def exprOf(c: Column): Column = pmod(xxhash64(c), lit(n.toLong)).cast("int")
  val monotone = false
}

/** String prefix truncation to `w` chars. */
final case class TruncateOf(w: Int, sourceCol: String)
    extends PartitionTransform {
  require(w > 0, s"truncate width $w must be positive")
  val physCol = s"hp__trunc${w}__$sourceCol"
  def exprOf(c: Column): Column = substring(c, 1, w)
  val monotone = true
}

/**
 * MULTI-FIELD hidden partition spec (Iceberg specs hold several
 * transform fields — `days(ts), bucket(16, user)` — so a table can
 * prune on time AND key): the physical partition value is the
 * members' values joined with `MultiOf.Sep`. Range pruning applies
 * member-wise through `HiddenPartition.readMultiWhere`; member values
 * are guarded against containing the separator (raise, not corrupt —
 * only TruncateOf over pathological strings can hit it).
 */
final case class MultiOf(members: Seq[PartitionTransform])
    extends PartitionTransform {
  require(members.size >= 2, "MultiOf needs at least two members")
  require(members.forall(!_.isInstanceOf[MultiOf]), "MultiOf cannot nest")
  val sourceCol: String = members.map(_.sourceCol).mkString(",")
  val physCol: String = "hp__multi__" +
    members.map(_.physCol.stripPrefix("hp__")).mkString("__AND__")
  def exprOf(c: Column): Column =
    throw new UnsupportedOperationException(
      "MultiOf spans several source columns — use .expr")
  override def expr: Column =
    concat_ws(MultiOf.Sep, members.map { m =>
      val v = m.expr.cast("string")
      // A null member value MUST be encoded explicitly: concat_ws
      // silently drops nulls, which would shift every later member one
      // slot left and make readMultiWhere's parts.length invariant
      // silently exclude the row. The sentinel is reserved — a data
      // value equal to it raises, like the separator guard.
      coalesce(
        when(v.contains(MultiOf.Sep), raise_error(concat(
            lit(s"hidden-partition member ${m.physCol}: value contains " +
              s"the '${MultiOf.Sep}' separator: "), v)))
          .when(v === MultiOf.NullValue, raise_error(
            lit(s"hidden-partition member ${m.physCol}: value collides " +
              s"with the reserved null sentinel '${MultiOf.NullValue}'")))
          .otherwise(v),
        lit(MultiOf.NullValue))
    }: _*)
  val monotone = false // range-prune member-wise via readMultiWhere
}

object MultiOf {
  val Sep = "|"

  /** Reserved encoding of a NULL member value inside the composite
    * partition value — every written value has exactly `members.size`
    * '|'-separated parts by construction. */
  val NullValue = "__null__"
}

object PartitionTransform {
  private val Days = "hp__days__(.+)".r
  private val Months = "hp__months__(.+)".r
  private val Bucket = "hp__bucket([0-9]+)__(.+)".r
  private val Trunc = "hp__trunc([0-9]+)__(.+)".r
  private val Multi = "hp__multi__(.+)".r

  def parse(physCol: String): PartitionTransform = physCol match {
    case Multi(body) =>
      MultiOf(body.split("__AND__").toSeq.map(m => parse("hp__" + m)))
    case Days(c) => DaysOf(c)
    case Months(c) => MonthsOf(c)
    case Bucket(n, c) => BucketOf(n.toInt, c)
    case Trunc(w, c) => TruncateOf(w.toInt, c)
    case other => throw new IllegalArgumentException(
      s"'$other' is not a hidden-partition column — the table was " +
        "written with an explicit partition column, read it via " +
        "VersionedPartitioned directly")
  }
}

/** One member's constraint in a `HiddenPartition.readMultiWhere` call. */
sealed trait MemberPred
/** No constraint on this member. */
case object AnyValue extends MemberPred
/** Inclusive source-column range (member transform must be monotone). */
final case class MemberRange(lo: Column, hi: Column) extends MemberPred
/** Source-column equality (any member transform, incl. bucket). */
final case class MemberEquals(v: Column) extends MemberPred

object HiddenPartition {

  /** Promote under a transform: derives the physical key and delegates
    * — everything downstream (snapshot isolation, idempotent exchange,
    * stats sidecars) is the plain promote path. */
  def promote(df: DataFrame, root: String, t: PartitionTransform,
      tag: Option[String] = None, statsCols: Seq[String] = Nil): Long =
    VersionedPartitioned.promote(df.withColumn(t.physCol, t.expr), root,
      t.physCol, tag, statsCols = statsCols)

  /** Recover the table's transform from its manifest partition column. */
  def transformOf(spark: SparkSession, root: String): PartitionTransform =
    PartitionTransform.parse(
      VersionedPartitioned.partitionColumn(spark, root))

  /** Read with the physical key dropped — the "hidden" in hidden
    * partitioning: consumers see exactly the columns they wrote. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val t = transformOf(spark, root)
    VersionedPartitioned.read(spark, root).drop(t.physCol)
  }

  /** Map source-column literals to their partition values, by
    * evaluating THE SAME expressions the write path used (ONE 1-row
    * local project for the whole batch — metadata-priced, and immune
    * to Scala/SQL semantic drift, e.g. session-timezone handling in
    * date_format or xxhash64 seeding). Batched: a multi-member range ×
    * equality read needs several mappings, and each `head` is a full
    * job round-trip — one job for all of them, not one each. Each
    * literal is first CAST to the table's stored source-column type:
    * xxhash64 is type-sensitive (int vs long, date vs timestamp hash
    * differently), so an uncast literal of the wrong width would prune
    * a bucket table to the WRONG partition and silently return zero
    * rows instead of erroring. */
  private def partitionValuesOf(spark: SparkSession,
      lookups: Seq[(PartitionTransform, Column)],
      schema: org.apache.spark.sql.types.StructType): Seq[String] = {
    if (lookups.isEmpty) return Nil
    val exprs = lookups.map { case (t, v) =>
      t.exprOf(v.cast(schema(t.sourceCol).dataType)).cast("string")
    }
    val row = spark.range(1).select(exprs: _*).head
    lookups.indices.map(row.getString)
  }

  /** Range read on the SOURCE column (inclusive bounds): manifest-level
    * pruning to the transformed bound range + the residual row filter
    * for boundary partitions. Requires a monotone transform. */
  def readRange(spark: SparkSession, root: String, lo: Column,
      hi: Column): DataFrame = {
    val t = transformOf(spark, root)
    require(!t.isInstanceOf[MultiOf],
      s"${t.physCol}: multi-member tables read via readMultiWhere")
    require(t.monotone,
      s"${t.physCol}: range pruning needs an order-preserving transform " +
        "(days/months/truncate) — bucket tables support readEquals only")
    val schema = VersionedPartitioned.tableSchema(spark, root)
    val Seq(loP, hiP) =
      partitionValuesOf(spark, Seq(t -> lo, t -> hi), schema)
    VersionedPartitioned.readPartitionsWhere(spark, root,
        v => v >= loP && v <= hiP)
      .where(col(t.sourceCol).between(lo, hi))
      .drop(t.physCol)
  }

  /** Point lookup on the SOURCE column: prunes to the single partition
    * the transform maps the value to (any transform, including
    * bucket), plus the residual equality for hash collisions /
    * coarser-than-value granularities. */
  def readEquals(spark: SparkSession, root: String, v: Column): DataFrame = {
    val t = transformOf(spark, root)
    require(!t.isInstanceOf[MultiOf],
      s"${t.physCol}: multi-member tables read via readMultiWhere")
    val Seq(p) = partitionValuesOf(spark, Seq(t -> v),
      VersionedPartitioned.tableSchema(spark, root))
    VersionedPartitioned.readPartitionsWhere(spark, root, _ == p)
      .where(col(t.sourceCol) === v)
      .drop(t.physCol)
  }

  /** Partition-value keep for plan-extracted per-member bounds — the
    * SQL front door's entry into hidden pruning (`SqlLifecycle.query`
    * routes statement WHERE conjuncts here via `ScanPrune`). `bounds`
    * lines up positionally with the spec's members (a single-transform
    * table is a 1-member spec); None = unconstrained member. Equality
    * literals map through the write path's own transform expression
    * (one batched job for everything); range bounds map only on
    * MONOTONE members — on a bucket member they degrade to
    * unconstrained, never to a wrong prune. Bound inclusiveness is
    * intentionally ignored: every transform is a COARSENING (day,
    * month, prefix), so `src > lo` still admits later rows of `lo`'s
    * own partition — the partition-level bound is always inclusive.
    * Returns None when nothing maps (caller skips pruning). */
  def keepForBounds(spark: SparkSession, root: String,
      bounds: Seq[Option[ScanPrune.Bounds]]): Option[String => Boolean] = {
    val t = transformOf(spark, root)
    val members = t match {
      case m: MultiOf => m.members
      case single => Seq(single)
    }
    require(bounds.size == members.size,
      s"expected ${members.size} member bounds, got ${bounds.size}")
    val schema = VersionedPartitioned.tableSchema(spark, root)
    // assemble one batched lookup: per member, its usable literals
    val lookups = members.zip(bounds).flatMap {
      case (_, None) => Nil
      case (m, Some(b)) =>
        val eqs = b.eqs.toSeq.flatten.map(l => m -> ScanPrune.literalColumn(l))
        val lo = b.lo.filter(_ => m.monotone)
          .map(l => m -> ScanPrune.literalColumn(l._1))
        val hi = b.hi.filter(_ => m.monotone)
          .map(l => m -> ScanPrune.literalColumn(l._1))
        eqs ++ lo ++ hi
    }
    if (lookups.isEmpty) return None
    val mapped = Iterator(partitionValuesOf(spark, lookups, schema): _*)
    var usable = false
    val checks: Seq[String => Boolean] = members.zip(bounds).map {
      case (_, None) => (_: String) => true
      case (m, Some(b)) =>
        val eqSet = b.eqs.map(es => es.map(_ => mapped.next()).toSet)
        val loP = b.lo.filter(_ => m.monotone).map(_ => mapped.next())
        val hiP = b.hi.filter(_ => m.monotone).map(_ => mapped.next())
        if (eqSet.isDefined || loP.isDefined || hiP.isDefined) usable = true
        (v: String) =>
          // a constrained member is null-intolerant: the sentinel (and
          // the writer-level null dir) can never satisfy it
          v != MultiOf.NullValue && v != "__HIVE_DEFAULT_PARTITION__" &&
            eqSet.forall(_.contains(v)) &&
            loP.forall(v >= _) && hiP.forall(v <= _)
    }
    if (!usable) None
    else Some { value =>
      if (members.size == 1) checks.head(value)
      else {
        val parts =
          value.split(java.util.regex.Pattern.quote(MultiOf.Sep), -1)
        parts.length == checks.size &&
          checks.zip(parts).forall { case (c, v) => c(v) }
      }
    }
  }

  /** Member-wise pruned read on a `MultiOf` table: one `MemberPred`
    * per spec member, positionally. Each constrained member prunes
    * independently on its slice of the partition value (time range ×
    * key bucket composes multiplicatively), and the matching residual
    * source-column predicates apply on top. Ranges require the member
    * transform to be monotone; equality works on any member. */
  def readMultiWhere(spark: SparkSession, root: String,
      preds: Seq[MemberPred]): DataFrame = {
    val t = transformOf(spark, root) match {
      case m: MultiOf => m
      case other => throw new IllegalArgumentException(
        s"${other.physCol} is a single-transform table — use " +
          "readRange/readEquals")
    }
    require(preds.size == t.members.size,
      s"expected ${t.members.size} member predicates, got ${preds.size}")
    val schema = VersionedPartitioned.tableSchema(spark, root)
    // per-member partition-value constraints, resolved driver-side in
    // ONE batched literal-mapping job (partitionValuesOf).
    // Null member values are stored as the MultiOf.NullValue sentinel,
    // so every value splits into exactly members.size parts and an
    // unconstrained (AnyValue) member never excludes null-source rows.
    val lookups = t.members.zip(preds).flatMap {
      case (_, AnyValue) => Nil
      case (m, MemberRange(lo, hi)) =>
        require(m.monotone,
          s"${m.physCol}: range pruning needs a monotone member")
        Seq(m -> lo, m -> hi)
      case (m, MemberEquals(eq)) => Seq(m -> eq)
    }
    val mapped = Iterator(partitionValuesOf(spark, lookups, schema): _*)
    val checks: Seq[String => Boolean] =
      t.members.zip(preds).map {
        case (_, AnyValue) => (_: String) => true
        case (_, MemberRange(_, _)) =>
          val (lp, hp) = (mapped.next(), mapped.next())
          (v: String) => v != MultiOf.NullValue && v >= lp && v <= hp
        case (_, MemberEquals(_)) =>
          val p = mapped.next()
          (v: String) => v == p
      }
    val pruned = VersionedPartitioned.readPartitionsWhere(spark, root,
      value => {
        val parts = value.split(java.util.regex.Pattern.quote(MultiOf.Sep), -1)
        parts.length == checks.size &&
          checks.zip(parts).forall { case (c, v) => c(v) }
      })
    // residual row-level predicates on the source columns
    val residual = t.members.zip(preds).flatMap {
      case (_, AnyValue) => None
      case (m, MemberRange(lo, hi)) => Some(col(m.sourceCol).between(lo, hi))
      case (m, MemberEquals(eq)) => Some(col(m.sourceCol) === eq)
    }
    residual.foldLeft(pruned)(_ where _).drop(t.physCol)
  }
}
