package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`ARRAY<FLOAT>`), the
 * north-star extension surface (SURVEY.md §7.5): exact brute-force cosine
 * top-k as the correctness baseline, and a random-hyperplane-LSH bucketed
 * variant as the 100 TB scale path.
 *
 * Scale design:
 *  - All vector math is in-row `zip_with`/`aggregate` Column expressions
 *    over `ARRAY<DOUBLE>` — no UDFs, no driver-side collect; norms are
 *    precomputed once per row so the pairwise step is one fused dot.
 *  - Brute force broadcasts the (small) QUERY side against the corpus, so
 *    the corpus is scanned once with zero shuffle for scoring; the only
 *    shuffle is the per-query top-k, which Spark's rank-limit pushdown
 *    (WindowGroupLimit) turns into partial top-k before the exchange.
 *  - The ANN variant buckets both sides by LSH band signatures and joins
 *    bucket-to-bucket (equi-join, never a cross join), then scores only
 *    candidates — the shape that survives a corpus too big to broadcast
 *    against.
 */
object Similarity {

  /** Sequential-fold dot product of two double arrays (deterministic
    * summation order — matches a single-threaded oracle bit-for-bit at
    * rounding granularity). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in the same form DuckDB's list_cosine_similarity
    * uses: dot / (|a|·|b|). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  private def prep(df: DataFrame, idCol: String, vecCol: String,
      idAs: String, vecAs: String, normAs: String): DataFrame =
    df.select(col(idCol).as(idAs), col(vecCol).cast("array<double>").as(vecAs))
      .withColumn(normAs, l2norm(col(vecAs)))

  /**
   * Exact brute-force cosine top-k: for every row of `queries`, the `k`
   * most-similar rows of `corpus` (self-pairs excluded when ids collide).
   * Deterministic: ties broken by neighbor id.
   *
   * Plan shape: corpus scan × broadcast(queries) → in-row dot → window
   * `row_number <= k` partitioned by query. The window is rank-limited,
   * so each task keeps only its local top-k before the shuffle.
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = prep(corpus, idCol, vecCol, "neighbor_id", "__cv", "__cn")
    val q = prep(queries, idCol, vecCol, "query_id", "__qv", "__qn")
    val scored = c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", dot(col("__cv"), col("__qv")) / (col("__cn") * col("__qn")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
  }

  /**
   * Approximate cosine top-k via LSH: candidates = pairs sharing ≥1 band
   * bucket; exact cosine on candidates only; per-query top-k. Recall is
   * tunable by (nBits, bands) — more bands/fewer bits per band = higher
   * recall, more candidates. Every join here is a bucket equi-join.
   */
  def annTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nBits: Int = 64, bands: Int = 16): DataFrame = {
    require(nBits % bands == 0, "bands must divide nBits")
    val c = prep(corpus, idCol, vecCol, "neighbor_id", "__cv", "__cn")
      .withColumn("__bits", signBitsInline("__cv", nBits))
    val q = prep(queries, idCol, vecCol, "query_id", "__qv", "__qn")
      .withColumn("__bits", signBitsInline("__qv", nBits))
    val cb = c.select(col("neighbor_id"), col("__cv"), col("__cn"),
      explode(bandBucketsInline("__bits", nBits, bands)).as("__bucket"))
    val qb = q.select(col("query_id"), col("__qv"), col("__qn"),
      explode(bandBucketsInline("__bits", nBits, bands)).as("__bucket"))
    val cands = cb.join(qb, "__bucket")
      .where(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id", "__cv", "__cn", "__qv", "__qn")
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cands.withColumn("sim",
      dot(col("__cv"), col("__qv")) / (col("__cn") * col("__qn")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("sim"))
  }

  /**
   * Random-hyperplane sign bits over an existing ARRAY<DOUBLE> column:
   * bit i = [⟨h_i, v⟩ > 0] where hyperplane h_i has ±1 components with
   * sign xxhash64(i, j) & 1 — deterministic across runs/executors,
   * computed entirely in-row.
   */
  def signBitsInline(vecColName: String, nBits: Int): Column = expr(
    s"""transform(sequence(0, ${nBits - 1}), i ->
      CASE WHEN aggregate(
        zip_with(`$vecColName`, sequence(0, size(`$vecColName`) - 1),
                 (x, j) -> CASE WHEN (xxhash64(i, j) & 1) = 1 THEN x ELSE -x END),
        cast(0.0 as double), (acc, x) -> acc + x) > 0 THEN 1 ELSE 0 END)""")

  /** Band buckets from sign bits: `bands` longs, each packing
    * nBits/bands consecutive bits, seeded with the band index so buckets
    * of different bands are disjoint join keys. */
  def bandBucketsInline(bitsColName: String, nBits: Int, bands: Int): Column = {
    val r = nBits / bands
    expr(s"""transform(sequence(0, ${bands - 1}), b ->
      aggregate(slice(`$bitsColName`, b * $r + 1, $r), cast(b as bigint),
                (acc, x) -> acc * 2 + x))""")
  }
}
