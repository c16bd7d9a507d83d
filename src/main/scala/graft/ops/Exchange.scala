package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Idempotent partition promotion — the reference's DELETE-then-INSERT
 * exchange (reference `dags/dag.py:292-311` production,
 * `dags/dag.py:367-371` cumulative) collapsed into one dynamic-partition
 * overwrite.
 *
 * The reference deletes `WHERE date = ds` and re-inserts the staging rows
 * so any re-run (backfill) replaces exactly one date partition. With
 * `partitionOverwriteMode=dynamic`, `mode("overwrite")` rewrites only the
 * partitions present in the incoming frame — same idempotence, one atomic
 * job, no read-modify-write of unrelated partitions. At 100 TB this
 * touches a single date directory regardless of table size, and the
 * date-partitioned layout gives downstream range scans partition pruning
 * for free (reference `PARTITIONED BY (date)` at `dags/dag.py:146,352`).
 */
object Exchange {

  /**
   * Overwrite exactly the partitions of `partitionCol` present in `df`
   * (the reference's per-ds DELETE + INSERT pair, SURVEY.md §2.2 D6).
   *
   * The frame is re-clustered on the partition column first: without
   * it, every one of N upstream tasks writes a file into every date dir
   * it touches — N×#dates small files per promote, the classic
   * partitioned-write explosion (measured 2× of exchange_idempotent's
   * bench cost at sf0.1). Clustered, each date dir gets one file per
   * owning task. A pathologically hot single date serializes onto one
   * task; callers with that shape pass `cluster = false` and manage
   * file counts themselves.
   */
  def promote(df: DataFrame, path: String, partitionCol: String = "date",
      cluster: Boolean = true): Unit = {
    val spark = df.sparkSession
    val out = if (cluster) df.repartition(col(partitionCol)) else df
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try out.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  // Schema-checked promotion lives in Schemas.conform + promote — the
  // resolution of reference bug #6 (positional SELECT *, SURVEY.md §2.14)
  // aligns columns by name AND casts to the declared types in one place.

  /** Read the promoted table back (partition-pruned scans on `date`). */
  def table(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /**
   * Small-file compaction — the table-maintenance companion to
   * `promote`: rewrite one partition's files into
   * ceil(bytes / targetFileBytes) files (min 1). Long-lived
   * incrementally-promoted tables accumulate a file per promote per
   * partition; scan cost grows with file count (task scheduling, footer
   * reads), not bytes. Compaction reads ONE partition and dynamically
   * overwrites the same partition — other partitions are untouched,
   * exactly how Iceberg/Delta rewrite-data-files actions scope their
   * work.
   *
   * Because source and destination are the same directory, the slice is
   * MATERIALIZED (localCheckpoint) before the overwrite commits: a lazy
   * plan would race the scan against the commit's delete of the old
   * files. Non-atomicity caveat: on a plain filesystem the overwrite
   * commit itself (delete old files, move new in) is not atomic — a
   * crash mid-commit can leave the partition partial. A table format
   * with a metadata pointer (Iceberg/Delta) is the real fix; see
   * SCALE.md's Iceberg-semantics section.
   */
  def compact(spark: SparkSession, path: String, partitionCol: String,
      partitionValue: Any, targetFileBytes: Long = 128L << 20): Unit = {
    val slice = table(spark, path)
      .where(col(partitionCol) === lit(partitionValue))
    val bytes = slice.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFiles = math.max(1L,
      ((bytes + targetFileBytes - 1) / BigInt(targetFileBytes)).toLong)
    val materialized = slice.repartition(nFiles.toInt).localCheckpoint()
    promote(materialized, path, partitionCol, cluster = false)
  }
}
