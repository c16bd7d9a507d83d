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
      vecCol: String, k: Int, dim: Int, nBits: Int = 64,
      bands: Int = 16): DataFrame = {
    require(nBits % bands == 0, "bands must divide nBits")
    val c = withSignBits(
      prep(corpus, idCol, vecCol, "neighbor_id", "__cv", "__cn"),
      "__cv", "__bits", nBits, dim)
    val q = withSignBits(
      prep(queries, idCol, vecCol, "query_id", "__qv", "__qn"),
      "__qv", "__bits", nBits, dim)
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

  /** Deterministic ±1 hyperplane matrix (nBits × dim), seeded. */
  private def planes(nBits: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(0x9e3779b9L)
    Array.fill(nBits, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /**
   * Add random-hyperplane sign bits for an ARRAY<DOUBLE> column:
   * bit i = [⟨h_i, v⟩ > 0] with ±1 hyperplane components — deterministic
   * across runs/executors. The plane matrix rides as a literal row
   * column so the lambda body only does O(1) element access (a literal
   * array inside a lambda would be rebuilt per evaluation); `dim` must
   * equal the embedding dimensionality.
   */
  def withSignBits(df: DataFrame, vecColName: String, bitsColName: String,
      nBits: Int, dim: Int): DataFrame =
    df.withColumn("__planes", typedLit(planes(nBits, dim)))
      .withColumn(bitsColName, expr(
        s"""transform(__planes, p ->
          CASE WHEN aggregate(zip_with(p, `$vecColName`, (s, x) -> s * x),
            cast(0.0 as double), (acc, x) -> acc + x) > 0
          THEN 1 ELSE 0 END)"""))
      .drop("__planes")

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
