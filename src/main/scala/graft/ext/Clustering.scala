package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic Lloyd k-means over an embedding column — the corpus
 * curation primitive behind semantic sharding, diversity sampling, and
 * IVF index training. Everything is a deterministic function of the
 * data, so the whole algorithm (init → assign → update → assign) can be
 * replayed as SQL by the DuckDB oracle, exactly like the IVF/LSH ops:
 *
 *  - init: stride-sampled corpus vectors (every `centroidStride`-th id),
 *    the same scheme `Similarity.ivfTopK` uses;
 *  - assignment: nearest centroid by squared euclidean distance computed
 *    as the literal expression |p|² − 2·p·c + |c|² (identical operation
 *    order in both engines → bit-identical doubles), ties on distance
 *    broken by centroid id;
 *  - update: element-wise mean, summed in DECIMAL(38,20) and divided in
 *    double — a double-ordered sum would differ between engines by ULPs
 *    and flip boundary assignments; the decimal sum is order-independent
 *    and exact. Clusters that lose every point simply drop out (both
 *    engines derive centroids from the same assignment groups).
 *
 * Scale shape: centroids are the ONLY broadcast (k rows); assignment is
 * one broadcast-scored corpus scan + a per-point rank (WindowGroupLimit
 * keeps it partial); the update is posexplode → (cluster, dim) partial
 * aggregation — shuffle rows are (cluster, dim, decimal) triples, k·dim
 * of them per partition after map-side combine, never vectors. Per
 * iteration: one scan, two narrow shuffles — ONE Spark job, because the
 * updated centroids are collected into a driver-local relation between
 * rounds. That collect moves exactly the rows the next round's
 * broadcast would ship to every executor anyway (k centroids — bounded
 * by the broadcast-join threshold, never corpus data), and it is what
 * breaks the iteration lineage: without it each round's broadcast
 * re-executes every previous round's assign+update chain from the raw
 * scan, an O(iters²) recompute that dominated the bench.
 */
object Clustering {

  /**
   * Run `iters` assignment rounds (centroids update between rounds, so
   * `iters = 2` means assign → update → assign). Returns one row per
   * input vector: (idCol, cluster) where cluster is the id of the
   * stride-sample vector that seeded the cell.
   */
  def kmeans(df: DataFrame, idCol: String, vecCol: String,
      centroidStride: Int, iters: Int): DataFrame = {
    require(iters >= 1, "at least one assignment round")
    graft.functions.VectorExprs.register(df.sparkSession)
    val pts = df.select(col(idCol).as("__id"),
      col(vecCol).cast("array<double>").as("__v"))
    // localize() from round 0: the seed scan runs once instead of being
    // re-executed by every subsequent round's broadcast
    var cents = localize(pts.where(col("__id") % centroidStride === 0)
      .select(col("__id").as("__cent_id"), col("__v").as("__cv")))
    var assigned: DataFrame = null
    for (i <- 1 to iters) {
      assigned = assign(pts, cents)
      if (i < iters) cents = localize(update(assigned))
    }
    assigned.select(col("__id").as(idCol), col("__cent_id").as("cluster"))
  }

  /** Collect a (small) centroid frame to the driver and rebuild it as a
    * LocalRelation: cuts the per-round lineage (no O(iters²) recompute)
    * and makes the next round's broadcast driver-side (no extra job).
    * Values round-trip exactly — collect preserves doubles bit-for-bit,
    * so assignments are unchanged vs the distributed frame. The rows
    * moved are the centroids the broadcast ships cluster-wide anyway. */
  private def localize(cents: DataFrame): DataFrame = {
    val rows = cents.collect()
    cents.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), cents.schema)
  }

  /** Nearest-centroid assignment: (id, v, cent_id). */
  private def assign(pts: DataFrame, cents: DataFrame): DataFrame = {
    val dist =
      Similarity.dot(col("__v"), col("__v")) -
        lit(2.0) * Similarity.dot(col("__v"), col("__cv")) +
        Similarity.dot(col("__cv"), col("__cv"))
    val w = Window.partitionBy("__id")
      .orderBy(col("__dist").asc, col("__cent_id").asc)
    pts.crossJoin(broadcast(cents))
      .withColumn("__dist", dist)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("__id"), col("__v"), col("__cent_id"))
  }

  /** Element-wise mean per cluster, decimal-exact sum / double divide. */
  private def update(assigned: DataFrame): DataFrame =
    assigned
      .select(col("__cent_id"), posexplode(col("__v")).as(Seq("__pos", "__x")))
      .groupBy("__cent_id", "__pos")
      .agg((sum(col("__x").cast("decimal(38,20)")).cast("double") /
        count(lit(1))).as("__m"))
      .groupBy("__cent_id")
      .agg(array_sort(collect_list(struct(col("__pos"), col("__m")))).as("__pm"))
      .select(col("__cent_id"),
        expr("transform(__pm, s -> s.__m)").as("__cv"))
}
