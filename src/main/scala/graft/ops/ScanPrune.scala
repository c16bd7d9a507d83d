package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/**
 * Statement-to-manifest predicate bridge for the SQL front door
 * (`SqlLifecycle.query`). The reference pipeline's core access pattern
 * is a partition-targeted SELECT — `WHERE date = DATE '{{ ds }}'`
 * (reference `dags/dag.py:211,294,436`) — and through the Scala API
 * those reads prune at the MANIFEST level (`readPartitionsWhere`,
 * `HiddenPartition.readMultiWhere`). A routed statement used to
 * resolve its table views over the FULL current manifest: correct,
 * but at 100 TB every routed SELECT would plan (and for
 * hidden-partitioned tables, SCAN) the whole table.
 *
 * This object extracts, from an analyzed-and-OPTIMIZED Catalyst plan,
 * the filter conjuncts that sit directly above each table's scan
 * leaves. Working on the optimized plan is the safety argument: by
 * the time we look, Catalyst's own pushdown rules have already moved
 * every conjunct as close to its scan as is semantically legal
 * (outer-join null traps, nondeterminism, correlation — all handled
 * by the optimizer, not re-derived here). A conjunct directly above a
 * leaf is therefore a NECESSARY condition on that leaf's rows, and
 * any partition that provably cannot satisfy it can drop out of the
 * manifest read. Pruning is always a SUPERSET operation — the
 * statement's own WHERE still executes on top — so an unmappable
 * conjunct degrades to "no pruning", never to a wrong answer.
 */
object ScanPrune {

  /** One scan of a table inside a plan: the leaf's output attributes
    * and the filter conjuncts directly above it (empty = unfiltered). */
  final case class Leaf(output: Seq[Attribute], conjuncts: Seq[Expression])

  /** All parquet-scan leaves under `plan` whose file-index roots live
    * under `dir` (an absolute table directory), each with the
    * conjuncts of the Filter/Project chain directly above it.
    * Conjuncts crossing a Project are rewritten through pass-through
    * aliases; a conjunct referencing a COMPUTED projection is dropped
    * (it constrains a derived value, not a stored column). Only
    * deterministic conjuncts referencing the leaf's own attributes
    * survive. */
  def leavesUnder(plan: LogicalPlan, dir: String): Seq[Leaf] = {
    val prefix = new java.io.File(dir).getAbsolutePath + "/"
    val acc = scala.collection.mutable.ArrayBuffer.empty[Leaf]
    def ownedBy(rel: LogicalRelation): Boolean = rel.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.nonEmpty &&
        fs.location.rootPaths.forall { p =>
          val up = p.toUri.getPath
          up == prefix.dropRight(1) || up.startsWith(prefix)
        }
      case _ => false
    }
    def descend(p: LogicalPlan, conj: Seq[Expression]): Unit = p match {
      case f: Filter =>
        descend(f.child, conj ++ split(f.condition))
      case pr: Project =>
        // rewrite conjuncts through pass-through aliases; drop any
        // conjunct that reaches a computed column
        val subst: Map[ExprId, Expression] = pr.projectList.collect {
          case a @ Alias(child, _) => a.exprId -> child
          case a: AttributeReference => a.exprId -> a
        }.toMap
        val mapped = conj.flatMap { c =>
          val rewritten = c.transformUp {
            case a: AttributeReference if subst.contains(a.exprId) =>
              subst(a.exprId)
          }
          val stillComputed = rewritten.exists {
            case _: Alias => true
            case _ => false
          }
          if (stillComputed) None
          else rewritten match {
            case r if r.references.forall(_.isInstanceOf[AttributeReference]) =>
              Some(r)
            case _ => None
          }
        }
        descend(pr.child, mapped)
      case rel: LogicalRelation if ownedBy(rel) =>
        val outIds = rel.output.map(_.exprId).toSet
        acc += Leaf(rel.output, conj.filter(c =>
          c.deterministic && c.references.nonEmpty &&
            c.references.forall(a => outIds.contains(a.exprId))))
      case other =>
        // any other node breaks the direct chain: restart with no
        // carried conjuncts (the optimizer already pushed what's safe)
        other.children.foreach(descend(_, Nil))
        other.subqueries.foreach(descend(_, Nil))
    }
    descend(plan, Nil)
    acc.toSeq
  }

  private def split(e: Expression): Seq[Expression] = e match {
    case And(l, r) => split(l) ++ split(r)
    case other => Seq(other)
  }

  /** Typed bounds a leaf's conjuncts impose on column `name`:
    * equality literals (None = unconstrained), lower and upper bounds
    * with inclusiveness. Literals are Catalyst `Literal`s — they carry
    * their own type, which after optimization matches the column's
    * (Catalyst inserts the cast on the literal side). Returns None
    * when no conjunct constrains the column. */
  final case class Bounds(eqs: Option[Seq[Literal]],
      lo: Option[(Literal, Boolean)], hi: Option[(Literal, Boolean)])

  def boundsFor(conjuncts: Seq[Expression], name: String): Option[Bounds] = {
    def isCol(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name.equalsIgnoreCase(name)
      case _ => false
    }
    var eqs: Option[Seq[Literal]] = None
    var lo: Option[(Literal, Boolean)] = None
    var hi: Option[(Literal, Boolean)] = None
    def addEq(vs: Seq[Literal]): Unit =
      eqs = Some(eqs.map(_.filter(e => vs.exists(_.semanticEquals(e))))
        .getOrElse(vs))
    // first bound wins; further ANDed bounds only narrow, so keeping
    // the first is still a superset — pruning may only ever widen
    def tightenLo(v: Literal, incl: Boolean): Unit =
      if (lo.isEmpty) lo = Some((v, incl))
    def tightenHi(v: Literal, incl: Boolean): Unit =
      if (hi.isEmpty) hi = Some((v, incl))
    conjuncts.foreach {
      case EqualTo(c, l: Literal) if isCol(c) && l.value != null =>
        addEq(Seq(l))
      case EqualTo(l: Literal, c) if isCol(c) && l.value != null =>
        addEq(Seq(l))
      case EqualNullSafe(c, l: Literal) if isCol(c) && l.value != null =>
        addEq(Seq(l))
      case In(c, vs) if isCol(c) && vs.forall {
          case l: Literal => l.value != null; case _ => false } =>
        addEq(vs.collect { case l: Literal => l })
      case InSet(c, vs) if isCol(c) && !vs.contains(null) =>
        addEq(vs.toSeq.map(v => Literal(v, c.dataType)))
      case GreaterThan(c, l: Literal) if isCol(c) && l.value != null =>
        tightenLo(l, incl = false)
      case GreaterThanOrEqual(c, l: Literal) if isCol(c) && l.value != null =>
        tightenLo(l, incl = true)
      case LessThan(c, l: Literal) if isCol(c) && l.value != null =>
        tightenHi(l, incl = false)
      case LessThanOrEqual(c, l: Literal) if isCol(c) && l.value != null =>
        tightenHi(l, incl = true)
      case GreaterThan(l: Literal, c) if isCol(c) && l.value != null =>
        tightenHi(l, incl = false)
      case GreaterThanOrEqual(l: Literal, c) if isCol(c) && l.value != null =>
        tightenHi(l, incl = true)
      case LessThan(l: Literal, c) if isCol(c) && l.value != null =>
        tightenLo(l, incl = false)
      case LessThanOrEqual(l: Literal, c) if isCol(c) && l.value != null =>
        tightenLo(l, incl = true)
      case _ => ()
    }
    if (eqs.isEmpty && lo.isEmpty && hi.isEmpty) None
    else Some(Bounds(eqs, lo, hi))
  }

  /** A Catalyst-internal literal as a Column (external value form), so
    * plan-extracted bounds can flow into DataFrame-side expressions
    * (the hidden-transform literal mapping). */
  def literalColumn(l: Literal): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions
      .lit(org.apache.spark.sql.catalyst.CatalystTypeConverters
        .convertToScala(l.value, l.dataType))
      .cast(l.dataType)

  /** Partition keep for a PLAIN partitioned table (the manifest
    * partition column is a declared column): parse each partition
    * value string back to the literal's type with Catalyst's own Cast
    * — the inverse of how the writer rendered it — and compare TYPED,
    * so numeric partitions don't fall into the "9" > "10" string
    * trap. An unparseable partition value is kept, conservatively. */
  def plainKeep(bounds: Bounds): String => Boolean = {
    def parse(s: String,
        dt: org.apache.spark.sql.types.DataType): Option[Any] = Option(Cast(
      Literal.create(org.apache.spark.unsafe.types.UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType), dt,
      Some(java.time.ZoneOffset.UTC.getId)).eval())
    def cmp(s: String, l: Literal): Option[Int] = parse(s, l.dataType).map {
      pv => org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(l.dataType).compare(pv, l.value)
    }
    (v: String) =>
      if (v == "__HIVE_DEFAULT_PARTITION__") false // null partition: every constraint here is null-intolerant
      else {
        bounds.eqs.forall(_.exists(e => cmp(v, e).forall(_ == 0))) &&
          bounds.lo.forall { case (b, incl) =>
            cmp(v, b).forall(c => if (incl) c >= 0 else c > 0) } &&
          bounds.hi.forall { case (b, incl) =>
            cmp(v, b).forall(c => if (incl) c <= 0 else c < 0) }
      }
  }

  /** OR-combine per-leaf keeps: a partition survives if ANY scan of
    * the table needs it (self-joins read one shared view). */
  def anyOf(keeps: Seq[String => Boolean]): String => Boolean =
    v => keeps.exists(_(v))
}
