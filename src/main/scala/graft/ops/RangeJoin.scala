package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Range (interval-containment) join — `point BETWEEN lo AND hi`,
 * optionally per key. Spark plans a raw theta join as
 * BroadcastNestedLoop (or a cross product), which dies when neither
 * side broadcasts; this is the bucketized equi-join form:
 *
 *  - points map to bucket `floor(point / width)`;
 *  - each interval EXPLODES to every bucket it overlaps;
 *  - equi-join on (keys…, bucket), then verify exact containment.
 *
 * Scale: shuffle keys are (key, bucket) — intervals replicate by
 * ceil(span/width) + 1, so pick `width` near the median interval span:
 * wide buckets inflate false candidates, narrow ones inflate interval
 * replication. Both sides stay shuffled equi-join inputs (sort-merge at
 * scale); no nested-loop, no broadcast requirement.
 */
object RangeJoin {

  /**
   * Join `points` to the `intervals` containing them. `pointCol`,
   * `loCol`, `hiCol` must be numeric (cast timestamps to epoch millis
   * first); `keys` may be empty for global intervals.
   */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val i = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    p.join(i, keys :+ "__bucket")
      .where(col(pointCol).between(col(loCol), col(hiCol)))
      .drop("__bucket")
  }
}
