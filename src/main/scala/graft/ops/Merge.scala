package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * MERGE INTO — the general upsert primitive behind the reference's
 * idempotence pattern. The reference approximates "merge this day's rows
 * into production" with a DELETE + INSERT pair over a whole partition
 * (reference `dags/dag.py:292-311`); an Iceberg/Delta engine expresses
 * the same intent as `MERGE INTO target USING source ON key WHEN MATCHED
 * THEN UPDATE WHEN NOT MATCHED THEN INSERT`. This operator provides that
 * row-level semantics natively.
 *
 * Scale shape: `upsert` is a single hash shuffle on the merge key (union
 * + windowed precedence — no outer join, no null-key ambiguity);
 * `merge` (column-level updates / conditional delete) is one sort-merge
 * full-outer join on the key. Both shuffle rows exactly once and never
 * collect; combined with `Exchange.promote` the rewritten rows land as a
 * dynamic partition overwrite, so only the touched partitions of a
 * 100 TB table are rewritten.
 */
object Merge {

  /** An internal column name guaranteed absent from every schema in
    * `frames`: withColumn silently REPLACES a same-named user column,
    * which here would corrupt matched/in-target classification (and the
    * helper columns are dropped before output, so the corruption would
    * be silent). */
  private def freshName(base: String, frames: DataFrame*): String = {
    val taken = frames.flatMap(_.columns).toSet
    Iterator.from(0)
      .map(i => if (i == 0) base else s"$base$i")
      .find(!taken.contains(_)).get
  }

  /**
   * Full-row upsert: for every key present in `source` the source row
   * wins; keys only in `target` keep their target row. Schemas must
   * match by name (the frames are aligned with `unionByName`).
   *
   * Implemented as union + first-row-per-key precedence rather than an
   * outer join: one shuffle. A key appearing multiple times in `source`
   * resolves via `sourceOrder` (pass e.g. an event-time column to keep
   * the latest); with `sourceOrder` empty, duplicate source keys resolve
   * to an ARBITRARY source row (row_number over a tie — the pick can
   * change with partitioning), so callers with possibly-duplicate
   * sources must pass a total order or dedup first.
   */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String],
      sourceOrder: Seq[String] = Nil): DataFrame = {
    val precedence = freshName("__merge_precedence", target, source)
    val tagged = source.withColumn(precedence, lit(0))
      .unionByName(target.select(source.columns.map(col): _*)
        .withColumn(precedence, lit(1)))
    Ingest.firstPerKey(tagged, keys, precedence +: sourceOrder)
      .drop(precedence)
  }

  /**
   * Column-level merge: full-outer join on `keys`, then per output row
   *  - matched (key in both): `updates` columns take the source value,
   *    all other columns keep the target value;
   *  - source-only: inserted as-is (columns outside `source` are null);
   *  - target-only: kept, unless `deleteWhen` (evaluated over the
   *    target row) says to drop it — the WHEN NOT MATCHED BY SOURCE
   *    THEN DELETE clause.
   *
   * `updates` defaults to every non-key source column.
   */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String],
      updates: Seq[String] = Nil, deleteWhen: Option[Column] = None): DataFrame = {
    // Literal presence flags, not key-null tests: the join condition is
    // null-safe (<=>), so a key that is NULL on both sides MATCHES — a
    // key-nullness test would misclassify that row as neither matched
    // nor target-only (skipping its update and exposing it to delete).
    val tFlag = freshName("__t_present", target, source)
    val sFlag = freshName("__s_present", target, source)
    val t = target.withColumn(tFlag, lit(true)).alias("t")
    val s = source.withColumn(sFlag, lit(true)).alias("s")
    val updateCols =
      if (updates.nonEmpty) updates
      else source.columns.filterNot(keys.contains).toSeq
    val matched = col(s"s.$sFlag").isNotNull
    val inTarget = col(s"t.$tFlag").isNotNull
    val outCols = target.columns.toSeq.map { c =>
      if (keys.contains(c))
        coalesce(col(s"t.$c"), col(s"s.$c")).as(c)
      else if (source.columns.contains(c)) {
        // updates apply on match; inserts (no target row) always take
        // every source-present column, whether or not it is an update col
        val takeSource =
          if (updateCols.contains(c)) matched || !inTarget else !inTarget
        when(takeSource, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)
      } else col(s"t.$c").as(c)
    }
    val joined = t.join(s,
      keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _),
      "full_outer")
    // SQL MERGE's WHEN NOT MATCHED BY SOURCE AND cond THEN DELETE drops a
    // row only when cond IS TRUE. Under three-valued logic a NULL cond
    // would make `!cond` NULL and the WHERE silently drop the row, so the
    // condition is collapsed to definite-true first.
    val kept = deleteWhen match {
      case Some(cond) =>
        joined.where(matched || !inTarget || !coalesce(cond, lit(false)))
      case None => joined
    }
    kept.select(outCols: _*)
  }

  /**
   * Expression-level MERGE — the clause shapes `merge` cannot carry:
   *  - `assigns`: (target column → value Column over the aliased join,
   *    `t.col` / `s.col`) — SQL's `SET c = t.total + s.total`; every
   *    assignment reads the PRE-update target row (standard UPDATE
   *    semantics — assignment order cannot matter).
   *  - `matchedWhen`: SQL's `WHEN MATCHED AND <cond>` — a matched row
   *    failing the condition (or evaluating it to NULL, three-valued
   *    logic) keeps EVERY target value; it still blocks the insert arm
   *    (it matched).
   *  - `deleteWhen`: as in `merge`, over the target side (`t.col`),
   *    optionally conditional (`WHEN NOT MATCHED BY SOURCE AND cond`).
   *  - `insertWhen`: SQL's `WHEN NOT MATCHED AND <cond> THEN INSERT` —
   *    a source-only row failing the condition (or evaluating it NULL)
   *    is simply not inserted.
   *
   * Same scale shape as `merge`: one full-outer join on the key, rows
   * shuffle exactly once, no collect.
   */
  def mergeExpr(target: DataFrame, source: DataFrame, keys: Seq[String],
      assigns: Seq[(String, Column)], matchedWhen: Option[Column] = None,
      deleteWhen: Option[Column] = None,
      insertWhen: Option[Column] = None): DataFrame = {
    val tFlag = freshName("__t_present", target, source)
    val sFlag = freshName("__s_present", target, source)
    val t = target.withColumn(tFlag, lit(true)).alias("t")
    val s = source.withColumn(sFlag, lit(true)).alias("s")
    val matched = col(s"s.$sFlag").isNotNull && col(s"t.$tFlag").isNotNull
    val inTarget = col(s"t.$tFlag").isNotNull
    val applyUpdate = matchedWhen
      .map(c => matched && coalesce(c, lit(false))).getOrElse(matched)
    val assignOf = assigns.toMap
    require(assigns.forall { case (c, _) => target.columns.contains(c) },
      s"mergeExpr: assignment to unknown target column in " +
        s"${assigns.map(_._1).mkString(", ")}")
    require(keys.forall(k => !assignOf.contains(k)),
      "mergeExpr: merge keys cannot be assigned")
    val outCols = target.columns.toSeq.map { c =>
      if (keys.contains(c)) coalesce(col(s"t.$c"), col(s"s.$c")).as(c)
      else {
        val onUpdate = assignOf.get(c) match {
          case Some(v) => when(applyUpdate, v).otherwise(col(s"t.$c"))
          case None => col(s"t.$c")
        }
        if (source.columns.contains(c))
          when(!inTarget, col(s"s.$c")).otherwise(onUpdate).as(c)
        else onUpdate.as(c)
      }
    }
    val joined = t.join(s,
      keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _),
      "full_outer")
    val afterDelete = deleteWhen match {
      case Some(cond) =>
        joined.where(matched || !inTarget || !coalesce(cond, lit(false)))
      case None => joined
    }
    val kept = insertWhen match {
      case Some(cond) =>
        afterDelete.where(inTarget || coalesce(cond, lit(false)))
      case None => afterDelete
    }
    kept.select(outCols: _*)
  }
}
