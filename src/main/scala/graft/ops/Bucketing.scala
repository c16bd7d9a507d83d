package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed (pre-shuffled) tables — the co-located-join technique for
 * fact-fact joins that repeat on the same key: both tables are written
 * hash-bucketed (and bucket-sorted) on the join key, so every later
 * join between them is exchange-free — the scan's bucketing already
 * satisfies the join's required distribution and only a local sort (or
 * none, when each bucket is a single sorted file) remains.
 *
 * At 100 TB this converts the dominant shuffle of every downstream
 * join/aggregation on that key into a one-time write-side cost — the
 * same trade Spark's own bucketed Hive tables and Iceberg's
 * bucket-partition transforms make. Choose bucket counts so a single
 * bucket fits an executor's memory (≈ table size / buckets), and keep
 * bucket counts equal (or integer multiples, with
 * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`) across tables
 * joined together.
 */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted EXTERNAL parquet table
    * (absolute `path`, so nothing depends on the working directory).
    * Overwrites both data and catalog entry — idempotent re-runs. */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
      key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(tableName)

  /** Exchange-free equi-join of two tables bucketed on their join keys
    * with equal bucket counts. The merge hint pins the sort-merge
    * strategy — bucketing is the scale story being exercised here, and
    * without the hint the planner would broadcast a small-SF side and
    * plan the scans unbucketed (at 100 TB neither side broadcasts). */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).hint("merge").join(spark.table(rightTable),
      org.apache.spark.sql.functions.col(leftKey) ===
        org.apache.spark.sql.functions.col(rightKey))
}
