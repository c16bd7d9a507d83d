package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Document deduplication operators for large-scale corpus curation:
 * exact, MinHash+LSH, SimHash, and n-gram-Jaccard set-similarity join.
 *
 * Scale design (the 100 TB shape):
 *  - Signatures (MinHash, SimHash) are explode + CODEGEN'D aggregates
 *    (min over permuted hashes / signed bit sums) with map-side partials
 *    — measured 3× faster than the in-row higher-order-function
 *    formulation, whose per-element lambdas are CodegenFallback
 *    (~20 µs/element; see BASELINE.md perf notes). Tokenize/shingle
 *    kernels are native codegen expressions (functions/TextExprs).
 *  - Candidate generation is always a bucket equi-join (LSH band buckets,
 *    SimHash chunks, shingle postings) — never a cross join. Shuffle keys
 *    are the bucket ids, so co-candidates land on the same partition and
 *    pair expansion happens locally.
 *  - Verification (exact Jaccard / Hamming) runs only on candidate pairs.
 *
 * All hashes are seeded xxhash64 — deterministic across runs/executors.
 *
 * Cache lifecycle: the near-dup joins persist their shared shingle/
 * signature frames (MEMORY_AND_DISK). Every internal persist is
 * TRACKED per session: long-lived sessions issuing many dedup calls
 * release them with `Dedup.releaseCaches(spark)` once the round's
 * results are materialized (unpersisting under a still-lazy result is
 * safe — it recomputes), or `spark.catalog.clearCache()` for the
 * blunt version (the Verify/Bench harnesses isolate per query).
 * `nearDupGraph` returns an explicit handle with `close()` instead.
 */
object Dedup {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Internal persists by session — Spark's CacheManager holds strong
    * references, so an orphaned persist survives until session end;
    * this registry makes release possible without a handle per call.
    * The references here must be STRONG (the internal frames have no
    * other holder — weak entries would be collected before release and
    * the persists would leak unreleasable), so a session that stops
    * without calling releaseCaches would otherwise stay pinned for the
    * JVM lifetime. Instead, every registry touch PURGES entries whose
    * SparkContext has stopped: a stopped context already freed its
    * cached blocks, so dropping the entry is the release. */
  private val liveCaches = new java.util.concurrent.ConcurrentHashMap[
    org.apache.spark.sql.SparkSession,
    java.util.concurrent.ConcurrentLinkedQueue[DataFrame]]()

  private def purgeStopped(): Unit =
    liveCaches.keySet.removeIf(_.sparkContext.isStopped)

  private def cached(df: DataFrame): DataFrame = {
    purgeStopped()
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    liveCaches.computeIfAbsent(p.sparkSession,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()).add(p)
    p
  }

  /** Unpersist every frame the dedup operators cached in `spark` since
    * the last release. Returns the number released. Safe at any time:
    * a not-yet-materialized result simply recomputes its inputs. */
  def releaseCaches(spark: org.apache.spark.sql.SparkSession): Int = {
    purgeStopped()
    val q = liveCaches.remove(spark)
    if (q == null) 0
    else {
      var n = 0
      var d = q.poll()
      while (d != null) { d.unpersist(false); n += 1; d = q.poll() }
      n
    }
  }

  /**
   * Exact dedup: one surviving row per distinct `textCol`, keeping the
   * smallest `idCol` as the canonical representative (deterministic,
   * unlike dropDuplicates' arbitrary winner). Single hash-aggregate
   * shuffled on the text — at scale, swap the raw text for its
   * xxhash64+length key to shrink shuffle width (`exactByHash`).
   */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol), col(textCol))

  /**
   * Exact dedup keyed on (xxhash64(text), length(text)) instead of the
   * full text — the 100 TB variant: the shuffle carries 16 bytes per row
   * rather than the document body. Collision probability at 2^64 with a
   * length guard is negligible for curation purposes.
   */
  def exactByHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keyed = df.select(col(idCol), col(textCol),
      xxhash64(col(textCol)).as("__h"), length(col(textCol)).as("__l"))
    val winners = keyed.groupBy(col("__h"), col("__l"))
      .agg(min(col(idCol)).as(idCol))
    winners.join(keyed.select(col(idCol), col(textCol)), Seq(idCol))
      .select(col(idCol), col(textCol))
  }

  /**
   * MinHash signatures, (idCol, __sig) per row, via the standard
   * one-hash + universal-mixing scheme: each shingle is xxhash64'd ONCE,
   * then the `numHashes` permutations are multiply-add universal hashes
   * h_i(x) = (a_i·x + b_i) mod p with fixed pseudo-random constants —
   * deterministic across runs/executors. Operands are masked to 31 bits
   * so products stay < 2^62 (ANSI-overflow-safe); p = 4294967291.
   *
   * Plan shape matters here: the naive in-row nested higher-order
   * functions are CodegenFallback (measured ~20µs per inner lambda eval
   * — minutes of core time at 5k docs × 128 perms); instead the shingles
   * are exploded and the permutations become `numHashes` codegen'd
   * min-aggregates with map-side partial aggregation — the only shuffle
   * carries numHashes longs per document.
   */
  /**
   * Pick (bands, rows) for a MinHash-LSH run so the S-curve's
   * half-recall point (1/bands)^(1/rows) lands closest to the target
   * Jaccard `threshold` — the standard parameter-tuning rule (Leskovec
   * et al., Mining of Massive Datasets §3.4.3; reference analogue: none
   * — extension surface). Only exact factorizations bands·rows =
   * numPerms are considered, so the chosen pair drops no permutation.
   * Use it to size `minhashSignatures`/`lshCandidatePairs` instead of
   * hand-picking: a threshold far below the curve's knee floods the
   * verifier with false candidates (the d² blow-up at scale), far
   * above it silently loses recall.
   */
  def bandsForThreshold(numPerms: Int, threshold: Double): (Int, Int) = {
    require(numPerms >= 1, s"need numPerms >= 1, got $numPerms")
    require(threshold > 0 && threshold < 1,
      s"need 0 < threshold < 1, got $threshold")
    (1 to numPerms).filter(numPerms % _ == 0)
      .map(r => (numPerms / r, r))
      .minBy { case (b, r) =>
        math.abs(math.pow(1.0 / b, 1.0 / r) - threshold) }
  }

  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, shingleK: Int = 3): DataFrame = {
    graft.functions.TextExprs.register(df.sparkSession)
    sigsFromShingles(
      df.select(col(idCol),
        expr(s"token_shingles(`$textCol`, $shingleK)").as("__shingles")),
      idCol, numHashes)
  }

  /** Signatures from a prepared (idCol, __shingles) frame. */
  private def sigsFromShingles(sets: DataFrame, idCol: String,
      numHashes: Int): DataFrame = {
    val rnd = new scala.util.Random(0x5eed)
    val a = Array.fill(numHashes)((rnd.nextInt(Int.MaxValue - 1) + 1).toLong)
    val b = Array.fill(numHashes)(rnd.nextInt(Int.MaxValue).toLong)
    val posted = sets.select(col(idCol), explode(col("__shingles")).as("__s"))
      .withColumn("__h", expr("xxhash64(__s) & 2147483647"))
    val mins = (0 until numHashes).map(i =>
      min((col("__h") * a(i) + b(i)) % 4294967291L).as(s"__m$i"))
    posted.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
      .withColumn("__sig",
        array((0 until numHashes).map(i => col(s"__m$i")): _*))
      .select(col(idCol), col("__sig"))
  }

  /** Default hot-bucket cap for LSH candidate generation: a band bucket
    * holding more than this many documents is not pair-expanded (d docs
    * → d² pairs — one 10⁶-doc boilerplate bucket would put 10¹² rows in
    * a single join task). Buckets this hot are mass-duplicated
    * boilerplate; route them to `exactByHash` pre-collapse (below) or
    * the star expansion (`lshCandidateEdges`), and audit what a capped
    * run skipped with `droppedLshBuckets`. 1000 bounds any single
    * bucket's expansion at ~5·10⁵ pairs — safely inside one task. */
  val DefaultMaxLshBucket = 1000L

  /**
   * LSH banding: split the signature into `bands` bands of
   * numHashes/bands rows each; docs sharing any band hash become
   * candidate pairs. One explode (×bands), one shuffle on the band
   * bucket, local pair expansion via self-join, distinct pairs out.
   *
   * Hot-bucket guard: a bucket of d docs expands to d² pairs in ONE
   * join task (same key), so buckets above `maxBucketSize` are EXCLUDED
   * from pair generation — enumerate what a cap dropped with
   * `droppedLshBuckets`, and use `lshCandidateEdges` when the consumer
   * is components/clustering (a min-id star preserves the bucket's
   * connectivity at O(d)). Pass `maxBucketSize = None` for the uncapped
   * quadratic plan.
   *
   * Standard pre-pass at scale: collapse EXACT duplicates first
   * (`exactByHash` — 16-byte keys, linear) so byte-identical boilerplate
   * — the dominant source of degenerate buckets — never reaches the
   * sketch join; LSH then only carries the near-miss mass.
   */
  def lshCandidatePairs(sigs: DataFrame, idCol: String, bands: Int,
      maxBucketSize: Option[Long] = Some(DefaultMaxLshBucket)): DataFrame = {
    val banded = cachedSizedBandBuckets(sigs, idCol, bands)
    val small = maxBucketSize match {
      case Some(cap) => banded.where(col("__bsz") <= cap)
      case None => banded
    }
    pairExpand(small, idCol).distinct()
  }

  /** Persisted `sizedBandBuckets` — the banded frame feeds BOTH sides
    * of the pair self-join (and the edges API's star branch), so
    * without a persist the posexplode + window subtree evaluates once
    * per reference. The rows are 5 numeric columns (docs × bands of
    * them) — aggregate-sized, never bodies — so caching them is the
    * cheap side of the trade at any corpus size. */
  private def cachedSizedBandBuckets(sigs: DataFrame, idCol: String,
      bands: Int): DataFrame =
    cached(sizedBandBuckets(sigs, idCol, bands))

  /**
   * LSH candidate EDGES — the components-family variant of
   * `lshCandidatePairs`: sub-cap buckets pair-expand exactly as the
   * pairs API does, but an above-cap bucket contributes a min-id STAR
   * (bucket-min doc → every other member, O(d) rows) instead of being
   * dropped or d²-expanded. A star spans the bucket, so connected
   * components / cluster consumers resolve the same clusters as the
   * full expansion whenever verification keeps the star edges — without
   * ever materializing a hot bucket's quadratic pair set. On corpora
   * with no above-cap bucket this is IDENTICAL to `lshCandidatePairs`.
   */
  def lshCandidateEdges(sigs: DataFrame, idCol: String, bands: Int,
      maxBucketSize: Long = DefaultMaxLshBucket): DataFrame = {
    val banded = cachedSizedBandBuckets(sigs, idCol, bands)
    val pairs = pairExpand(banded.where(col("__bsz") <= maxBucketSize), idCol)
    val stars = banded.where(col("__bsz") > maxBucketSize)
      .select(col("__bmin").as("id_a"), col(idCol).as("id_b"))
      .where(col("id_a") < col("id_b"))
    pairs.unionByName(stars).distinct()
  }

  /** Audit companion to `lshCandidatePairs`' cap: the (band, bucket,
    * bucket_size) rows a given `maxBucketSize` excludes from pair
    * expansion — log or persist this next to any capped run (the
    * `droppedShingles` pattern of the postings joins). */
  def droppedLshBuckets(sigs: DataFrame, idCol: String, bands: Int,
      maxBucketSize: Long = DefaultMaxLshBucket): DataFrame =
    bandBuckets(sigs, idCol, bands)
      .groupBy(col("__band"), col("__bucket"))
      .agg(count(lit(1)).as("bucket_size"))
      .where(col("bucket_size") > maxBucketSize)

  /** Band buckets annotated with per-bucket size and min id — one
    * window pass on the (band, bucket) key, the same shuffle the
    * candidate join needs anyway, so the guard costs no extra
    * exchange. */
  private def sizedBandBuckets(sigs: DataFrame, idCol: String,
      bands: Int): DataFrame = {
    val w = Window.partitionBy(col("__band"), col("__bucket"))
    bandBuckets(sigs, idCol, bands)
      .withColumn("__bsz", count(lit(1)).over(w))
      .withColumn("__bmin", min(col(idCol)).over(w))
  }

  /** Within-bucket pair expansion (id_a < id_b) of a banded frame —
    * shared by the pairs and edges APIs. NOT distinct'd; callers dedup
    * after any union. */
  private def pairExpand(banded: DataFrame, idCol: String): DataFrame = {
    val a = banded.select(col(idCol).as("id_a"), col("__band"), col("__bucket"))
    val b = banded.select(col(idCol).as("id_b"), col("__band"), col("__bucket"))
    a.join(b, Seq("__band", "__bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
  }

  /** The per-row band-bucket array of a `__sig` column: element b is
    * xxhash64 of band b's signature slice, salted by b. ONE definition
    * shared by the in-flight path (`bandBuckets` posexplodes it) and the
    * persistent index (`buildBandIndex` stores it), so stored and
    * recomputed buckets are identical by construction. */
  private def bucketArrayExpr(bands: Int): String =
    s"transform(sequence(0, ${bands - 1}), " +
      s"b -> xxhash64(concat_ws(',', slice(__sig, b * (size(__sig) div $bands) + 1, size(__sig) div $bands)), b))"

  /** (id, __band, __bucket) band-hash keys of a `__sig` signature frame —
    * the join keys of every LSH stage (self-join for corpus×corpus,
    * broadcast for batch×corpus). */
  private def bandBuckets(sigs: DataFrame, idCol: String,
      bands: Int): DataFrame =
    sigs.select(col(idCol), posexplode(expr(bucketArrayExpr(bands))))
      .toDF(idCol, "__band", "__bucket")

  /**
   * End-to-end MinHash near-dup pairs: signature → LSH candidates →
   * exact Jaccard verification on the candidates' shingle sets, keeping
   * pairs with jaccard ≥ threshold. Verification joins the (small)
   * candidate set back to shingle arrays on id — sort-merge on id at
   * scale, never a cross join.
   *
   * Pair ENUMERATION semantics: buckets above `maxBucketSize` are
   * excluded from candidate generation (audit with `droppedLshBuckets`)
   * — a hot bucket's d² pair list identifies nothing a cluster label
   * wouldn't. Consumers that only need the CLUSTERS (components /
   * dedupByPairs / splits) should call `minhashNearDupEdges`, which
   * keeps hot buckets connected through a verified min-id star at O(d).
   * At 100 TB, run `exactByHash` FIRST: byte-identical boilerplate —
   * the dominant hot-bucket source — then never reaches the sketch
   * join, and LSH carries only the near-miss mass.
   */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleK: Int = 3,
      threshold: Double = 0.5,
      maxBucketSize: Option[Long] = Some(DefaultMaxLshBucket)): DataFrame = {
    // shingling (interpreted HOF transform) is the expensive narrow step
    // and three consumers need it (signatures, LSH both join sides,
    // verification) — persist ONE shingle pass instead of recomputing it
    // per plan branch
    val sets = shingleSets(df, idCol, textCol, shingleK)
    val sigs = cached(sigsFromShingles(sets, idCol, numHashes))
    val cands = lshCandidatePairs(sigs, idCol, bands, maxBucketSize)
    verifyJaccard(cands, sets, idCol, threshold)
  }

  /**
   * `minhashNearDups` for components-family consumers: identical
   * signature/banding/verification, but candidate generation goes
   * through `lshCandidateEdges` — hot buckets contribute a verified
   * min-id star (O(d)) instead of being dropped by the pair cap, so
   * cluster connectivity survives boilerplate-heavy corpora without the
   * d² blow-up. On corpora with no above-cap bucket the output is
   * IDENTICAL to `minhashNearDups`.
   */
  def minhashNearDupEdges(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleK: Int = 3,
      threshold: Double = 0.5,
      maxBucketSize: Long = DefaultMaxLshBucket): DataFrame = {
    val sets = shingleSets(df, idCol, textCol, shingleK)
    val sigs = cached(sigsFromShingles(sets, idCol, numHashes))
    val cands = lshCandidateEdges(sigs, idCol, bands, maxBucketSize)
    verifyJaccard(cands, sets, idCol, threshold)
  }

  /** Persisted (idCol, __shingles) frame — the shared input of every
    * shingle-based stage. MEMORY_AND_DISK: spills, never recomputes.
    * Uses the native codegen token_shingles expression (one JIT'd call
    * per row) rather than the interpreted HOF pipeline. */
  private def shingleSets(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int): DataFrame = {
    graft.functions.TextExprs.register(df.sparkSession)
    cached(df.select(col(idCol),
      expr(s"token_shingles(`$textCol`, $shingleK)").as("__shingles")))
  }

  /** Exact-Jaccard verification of candidate (id_a, id_b) pairs against
    * per-id shingle sets — the shared final stage of every sketch-blocked
    * near-dup join. Joins on id (sort-merge at scale), never a cross
    * join; the candidate set is assumed small relative to the corpus. */
  private def verifyJaccard(cands: DataFrame, sets: DataFrame, idCol: String,
      threshold: Double): DataFrame =
    cands
      .join(sets.select(col(idCol).as("id_a"), col("__shingles").as("__sa")), "id_a")
      .join(sets.select(col(idCol).as("id_b"), col("__shingles").as("__sb")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("__sa"), col("__sb"))).cast("double") /
          size(array_union(col("__sa"), col("__sb"))))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))

  /**
   * Incremental near-dup dedup — the daily-ingest shape: admit only the
   * NOVEL documents of a small `batch` against a large existing
   * `corpus`, without ever re-deduping the corpus against itself.
   *
   * A batch document is dropped iff it has a verified near-dup partner
   * (shingle Jaccard ≥ threshold) in the corpus, or an EARLIER
   * (lower-id) partner within the batch — so re-running a backfilled
   * day admits the same set, and two mutual dups arriving together
   * admit exactly the lower id. The rule is deliberately
   * non-transitive within the batch boundary (a doc pairing only with
   * an already-dropped batch doc still drops: its content is
   * duplicated either way).
   *
   * Scale shape: the expensive corpus work is ONE signature +
   * band-bucket build — an explode + aggregate that shuffles (id, hash)
   * postings once. In production that index is precomputed and stored
   * (signatures are content-addressed, so it appends per admitted
   * batch), making the steady-state admit corpus-shuffle-free: the
   * batch's band keys are tiny and BROADCAST against the index scan,
   * and there is never a corpus self-join. Verification joins only
   * candidate ids back to shingle sets.
   */
  def incrementalNearDups(corpus: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, numHashes: Int = 64, bands: Int = 16,
      shingleK: Int = 3, threshold: Double = 0.5): DataFrame = {
    val cSets = shingleSets(corpus, idCol, textCol, shingleK)
    val bSets = shingleSets(batch, idCol, textCol, shingleK)
    val cBands = bandBuckets(sigsFromShingles(cSets, idCol, numHashes),
      idCol, bands)
    // two consumers (vs-corpus join, within-batch self-join) of a small
    // frame — persist instead of re-aggregating the batch signatures
    val bBands = cached(bandBuckets(
      sigsFromShingles(bSets, idCol, numHashes), idCol, bands))
    // id_b is the batch doc in BOTH candidate branches, so the verified
    // losers are exactly the distinct id_b values
    val vsCorpus = cBands.select(col(idCol).as("id_a"),
        col("__band"), col("__bucket"))
      .join(broadcast(bBands.select(col(idCol).as("id_b"),
        col("__band"), col("__bucket"))), Seq("__band", "__bucket"))
      .select("id_a", "id_b").distinct()
    val withinBatch = bBands.select(col(idCol).as("id_a"),
        col("__band"), col("__bucket"))
      .join(bBands.select(col(idCol).as("id_b"),
        col("__band"), col("__bucket")), Seq("__band", "__bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val dupPairs = verifyJaccard(vsCorpus.unionByName(withinBatch),
      cSets.unionByName(bSets), idCol, threshold)
    val losers = dupPairs.select(col("id_b").as(idCol)).distinct()
    batch.join(losers, Seq(idCol), "left_anti")
  }

  /**
   * Embedding near-dup front door — the API a pipeline should call. It
   * dispatches to the ANN-blocked scale path
   * (`Similarity.cosineNearDupsAnn`: LSH band equi-joins, nothing
   * all-pairs, nothing broadcast) so the O(n²) upper-triangle scan
   * cannot be reached by default; the exact baseline
   * (`Similarity.cosineNearDups`) is the recall ground truth only and
   * must be requested with an explicit `exact = true` — it broadcasts a
   * full side and dies at corpus scale. Precision is identical either
   * way (ANN candidates are re-verified with true cosine); ANN recall
   * follows the band collision probability (≈0.96 at the defaults for
   * threshold 0.45).
   */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, nBits: Int = 64, bands: Int = 16,
      exact: Boolean = false): DataFrame =
    if (exact) Similarity.cosineNearDups(df, idCol, vecCol, threshold)
    else Similarity.cosineNearDupsAnn(df, idCol, vecCol, threshold, dim,
      nBits, bands)

  // ------------------------------------------- persistent band index —

  /** Index column names added by `buildBandIndex`. The index is stored
    * WITH the corpus rows (two derived columns on the same table) rather
    * than in a sibling table: one append keeps data and index atomic —
    * a two-table layout can lose a doc (index ahead of corpus: replay
    * drops it as its own dup) or duplicate one (corpus ahead of index:
    * replay re-admits it) on a crash between the writes. */
  val IndexBucketsCol = "minhash_buckets"
  val IndexShinglesCol = "shingle_set"

  /**
   * Attach the persistent signature index to `df`: `minhash_buckets`
   * (array of `bands` LSH band-bucket hashes) and `shingle_set` (the
   * distinct k-shingles, the exact-Jaccard verification input). Both are
   * content-addressed — deterministic functions of the text — so index
   * rows never need rebuilding and APPEND per admitted batch is the only
   * maintenance (`incrementalNearDupsIndexed` returns admitted rows
   * already carrying them).
   *
   * This is the one-time corpus bootstrap / per-batch signature step.
   * Empty text yields the single-empty-shingle signature, exactly like
   * the in-flight path (the tokenizer's shorter-than-k convention); a
   * doc with NO shingle set at all (null text) keeps EMPTY arrays — it
   * blocks with nothing and is always admitted, again matching the
   * in-flight path where such a row produces no band rows.
   *
   * At 100 TB the index columns are a few hundred bytes per doc vs the
   * document body, and column pruning means doc-column readers never
   * touch them; partition or z-order the table by a bucket prefix if
   * the candidate probe itself must prune below a full columnar scan.
   */
  def buildBandIndex(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 128, bands: Int = 32, shingleK: Int = 3): DataFrame = {
    val sets = shingleSets(df, idCol, textCol, shingleK)
    val sigs = sigsFromShingles(sets, idCol, numHashes)
    val buckets = sigs.select(col(idCol),
      expr(bucketArrayExpr(bands)).as(IndexBucketsCol))
    df.join(sets.select(col(idCol),
        coalesce(col("__shingles"), array().cast("array<string>"))
          .as(IndexShinglesCol)), Seq(idCol))
      .join(buckets, Seq(idCol), "left")
      .withColumn(IndexBucketsCol,
        coalesce(col(IndexBucketsCol), array().cast("array<bigint>")))
  }

  /**
   * `incrementalNearDups` against a corpus that already carries the
   * stored index columns — the steady-state daily-admit path: per-batch
   * work is O(batch) signature building plus ONE corpus columnar scan of
   * (id, minhash_buckets, shingle_set). The corpus text is never read,
   * never re-shingled, never re-signed, and never shuffled (batch band
   * keys broadcast against the index scan; verification reads stored
   * shingle sets for candidate ids only) — vs `incrementalNearDups`,
   * which rebuilds the corpus signatures from text on every call.
   *
   * Returns the ADMITTED batch rows with their index columns attached,
   * ready to append to the corpus table (the append IS the index
   * maintenance). Admit rule, hashing, and banding are identical to
   * `incrementalNearDups` by construction (shared expressions), so both
   * paths admit the same set for the same parameters.
   */
  def incrementalNearDupsIndexed(corpusIndexed: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, numHashes: Int = 128, bands: Int = 32,
      shingleK: Int = 3, threshold: Double = 0.5): DataFrame = {
    val batchIdx = cached(buildBandIndex(batch, idCol, textCol, numHashes,
      bands, shingleK))
    def explodeBands(idx: DataFrame, as: String): DataFrame =
      idx.select(col(idCol), posexplode(col(IndexBucketsCol)))
        .toDF(idCol, "__band", "__bucket")
        .select(col(idCol).as(as), col("__band"), col("__bucket"))
    val cBands = explodeBands(corpusIndexed, "id_a")
    val bBands = explodeBands(batchIdx, "id_b")
    val vsCorpus = cBands
      .join(broadcast(bBands), Seq("__band", "__bucket"))
      .select("id_a", "id_b").distinct()
    val withinBatch = bBands.select(col("id_b").as("id_a"),
        col("__band"), col("__bucket"))
      .join(bBands, Seq("__band", "__bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val sets = corpusIndexed
      .select(col(idCol), col(IndexShinglesCol).as("__shingles"))
      .unionByName(batchIdx
        .select(col(idCol), col(IndexShinglesCol).as("__shingles")))
    val dupPairs = verifyJaccard(vsCorpus.unionByName(withinBatch),
      sets, idCol, threshold)
    val losers = dupPairs.select(col("id_b").as(idCol)).distinct()
    batchIdx.join(losers, Seq(idCol), "left_anti")
  }

  /**
   * 64-bit SimHash per document, (idCol, __simhash) rows: bit i is set
   * iff the sum over token occurrences of ±1 (sign of bit i of
   * xxhash64(token)) is positive. Tokens are exploded and the 64 bit
   * sums are codegen'd aggregates with map-side partials (nested in-row
   * higher-order functions are CodegenFallback and orders of magnitude
   * slower) — the shuffle carries 64 longs per document.
   */
  def simhashSignatures(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    graft.functions.TextExprs.register(df.sparkSession)
    val posted = df.select(col(idCol),
        explode(expr(s"norm_tokens(`$textCol`)")).as("__t"))
      .withColumn("__h", xxhash64(col("__t")))
    val sums = (0 until 64).map(i =>
      sum(when(expr(s"((__h >> $i) & 1) = 1"), 1).otherwise(-1)).as(s"__b$i"))
    val agged = posted.groupBy(col(idCol)).agg(sums.head, sums.tail: _*)
      .withColumn("__simhash",
        (0 until 64).map(i => when(col(s"__b$i") > 0, lit(1L << i))
          .otherwise(lit(0L)): Column).reduce(_.bitwiseOR(_)))
      .select(col(idCol), col("__simhash"))
    // token-less docs vanish in the explode — restore them with the
    // all-zeros signature so they can still pair (e.g. two
    // punctuation-only duplicates), like the in-row formulation did
    df.select(col(idCol)).join(agged, Seq(idCol), "left")
      .withColumn("__simhash", coalesce(col("__simhash"), lit(0L)))
  }

  /**
   * SimHash candidate pairs with Hamming distance ≤ maxHamming, via the
   * generalized pigeonhole chunking scheme: split the 64-bit hash into
   * (maxHamming + 1) near-equal chunks — any pair within the Hamming
   * bound must agree on at least one chunk, so a chunk-keyed equi-join
   * finds every such pair. Verification = bit_count(xor) on candidates.
   */
  def simhashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 6): DataFrame = {
    val n = maxHamming + 1
    require(n >= 2 && n <= 64, "need 2..64 chunks")
    // both self-join sides read the signatures — persist the (tiny)
    // (id, simhash) frame instead of re-aggregating the token stream
    val hashed = cached(simhashSignatures(df, idCol, textCol))
    // chunk c covers bits [c*64 div n, (c+1)*64 div n) — widths differ by
    // ≤1 bit when n ∤ 64; the mask strips arithmetic-shift sign fill.
    val chunked = hashed.select(col(idCol), col("__simhash"), posexplode(expr(
        s"""transform(sequence(0, ${n - 1}), c ->
           (__simhash >> cast((c * 64) div $n as int)) &
           (shiftleft(cast(1 as bigint),
                      cast(((c + 1) * 64) div $n - (c * 64) div $n as int)) - 1))""")))
      .toDF(idCol, "__simhash", "__chunk", "__key")
    val a = chunked.select(col(idCol).as("id_a"),
      col("__simhash").as("__ha"), col("__chunk"), col("__key"))
    val b = chunked.select(col(idCol).as("id_b"),
      col("__simhash").as("__hb"), col("__chunk"), col("__key"))
    a.join(b, Seq("__chunk", "__key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(__ha ^ __hb)").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /**
   * SimHash-blocked near-dup join: SimHash/Hamming is the cheap blocking
   * sketch (one 64-bit key per doc), exact shingle-Jaccard on the
   * candidates is the decision. Blocking-only thresholding is NOT
   * reliable on corpora with a shared core vocabulary — unrelated docs
   * land within small Hamming distances — so like the MinHash path this
   * always verifies. `maxHamming` trades candidate volume for recall.
   *
   * Recall caveat: precision is exact (verification), but blocking
   * recall is corpus-dependent — very short documents (≲15 tokens) have
   * unstable bit sums, so a one-token edit can flip more than
   * `maxHamming` bits. Prefer `minhashNearDups` when short docs matter;
   * SimHash wins on sketch size (8 bytes/doc vs numHashes×8).
   */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 6, shingleK: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val cands = simhashCandidatePairs(df, idCol, textCol, maxHamming)
      .select("id_a", "id_b")
    val sets = shingleSets(df, idCol, textCol, shingleK)
    verifyJaccard(cands, sets, idCol, threshold)
  }

  /**
   * N-gram-Jaccard set-similarity join via shingle postings (the classic
   * inverted-index plan): explode distinct shingles, self-join the
   * postings list to count common shingles per pair, then
   * jaccard = common / (|A| + |B| − common).
   *
   * Hot-posting bound: a shingle appearing in d docs contributes d² pair
   * candidates, so one ubiquitous shingle ("of the and" in 1M docs) makes
   * the self-join quadratic. `maxDocFreq` therefore DEFAULTS to a cap:
   * shingles above it are dropped from candidate generation (IDF
   * intuition — a shingle shared by everyone identifies nothing). The
   * result stays exact whenever true near-dup pairs share at least one
   * sub-cap shingle, which holds for any realistic cap/corpus; pass
   * `maxDocFreq = None` for the unconditionally-exact quadratic plan, and
   * audit what a cap drops with `droppedShingles`.
   */
  val DefaultMaxDocFreq = 10000L

  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, threshold: Double = 0.5,
      maxDocFreq: Option[Long] = Some(DefaultMaxDocFreq)): DataFrame = {
    // one persisted shingle pass feeds the doc-freq branch and BOTH
    // sides of the postings self-join (3 consumers)
    val sets = shingleSets(df, idCol, textCol, shingleK)
    val postings0 = sets.select(col(idCol),
      explode(col("__shingles")).as("__shingle"))
    val capped = maxDocFreq match {
      case Some(cap) =>
        val dfreq = postings0.groupBy("__shingle").agg(count(lit(1)).as("__df"))
        postings0.join(dfreq.where(col("__df") <= cap), "__shingle")
      case None => postings0
    }
    // set sizes are computed over the SAME (capped) shingle universe as
    // the intersections — sizing from the uncapped sets would deflate
    // jaccard for any pair sharing a capped shingle (identical docs
    // would score < 1). With a cap, jaccard is exact over the
    // sub-cap-shingle universe.
    val postings = capped.withColumn("__n",
      count(lit(1)).over(Window.partitionBy(col(idCol))))
    val a = postings.select(col(idCol).as("id_a"), col("__n").as("__na"), col("__shingle"))
    val b = postings.select(col(idCol).as("id_b"), col("__n").as("__nb"), col("__shingle"))
    a.join(b, "__shingle").where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "__na", "__nb")
      .agg(count(lit(1)).as("__common"))
      .withColumn("jaccard", col("__common").cast("double") /
        (col("__na") + col("__nb") - col("__common")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /**
   * Winnowing-fingerprint overlap pairs — the MOSS-style plagiarism
   * candidate generator (Schleimer, Wilkerson & Aiken, SIGMOD 2003):
   * two documents pair when they share at least `minShared` winnowing
   * fingerprints (window-min shingle hashes from the native
   * `winnow_fingerprint` kernel). Winnowing guarantees any shared run
   * of ≥ w+k−1 tokens contributes at least one shared fingerprint, at
   * ~1/w the postings volume of full shingle postings — this is the
   * cheap first pass whose survivors feed an exact verifier
   * (`substringDupPairs` / Jaccard), the standard funnel when even the
   * shingle postings are too heavy.
   *
   * Same postings equi-join shape as every candidate generator here:
   * explode distinct fingerprints, self-join on the fingerprint,
   * count shared per pair. `maxDocFreq` caps hot boilerplate
   * fingerprints (d docs sharing one → d² candidates) exactly like the
   * shingle joins; the registered gate runs uncapped so the oracle's
   * full intersection is equivalent by construction.
   */
  def fingerprintPairs(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, window: Int = 4, minShared: Long = 2L,
      maxDocFreq: Option[Long] = Some(DefaultMaxDocFreq)): DataFrame = {
    graft.functions.TextExprs.register(df.sparkSession)
    val posted0 = df.select(col(idCol),
      explode(array_distinct(
        expr(s"winnow_fingerprint(`$textCol`, $shingleK, $window)")))
        .as("__fp"))
    val posted = maxDocFreq match {
      case Some(cap) =>
        val dfreq = posted0.groupBy("__fp").agg(count(lit(1)).as("__df"))
        posted0.join(dfreq.where(col("__df") <= cap), "__fp")
      case None => posted0
    }
    val a = posted.select(col(idCol).as("id_a"), col("__fp"))
    val b = posted.select(col(idCol).as("id_b"), col("__fp"))
    a.join(b, "__fp").where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /**
   * Shingle-set CONTAINMENT pairs — the asymmetric companion to
   * `ngramJaccardPairs`: flag (a, b) when the smaller document's
   * shingle set is mostly inside the other's
   * (max(common/|A|, common/|B|) ≥ threshold). Jaccard misses
   * subset-shaped duplication by construction — a tweet quoted inside a
   * long article pair-scores |tweet|/|article| ≈ 0 — while containment
   * scores it 1.0; this is the quote-expansion / page-plus-boilerplate
   * detector of curation pipelines (the set-level cousin of
   * `substringDupPairs`' contiguous-window criterion: windows catch
   * verbatim spans, containment catches shuffled-but-same-vocabulary
   * inclusion too).
   *
   * Same postings plan as the Jaccard join — one persisted shingle
   * pass, doc-freq cap against hot-posting d² blow-up, candidate pairs
   * only ever from the equi-join — so the 100 TB shape is unchanged;
   * only the final per-pair arithmetic differs. Sizes are over the
   * capped shingle universe, mirroring the Jaccard join's exactness
   * contract.
   */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, threshold: Double = 0.8,
      maxDocFreq: Option[Long] = Some(DefaultMaxDocFreq)): DataFrame = {
    val sets = shingleSets(df, idCol, textCol, shingleK)
    val postings0 = sets.select(col(idCol),
      explode(col("__shingles")).as("__shingle"))
    val capped = maxDocFreq match {
      case Some(cap) =>
        val dfreq = postings0.groupBy("__shingle").agg(count(lit(1)).as("__df"))
        postings0.join(dfreq.where(col("__df") <= cap), "__shingle")
      case None => postings0
    }
    val postings = capped.withColumn("__n",
      count(lit(1)).over(Window.partitionBy(col(idCol))))
    val a = postings.select(col(idCol).as("id_a"), col("__n").as("__na"), col("__shingle"))
    val b = postings.select(col(idCol).as("id_b"), col("__n").as("__nb"), col("__shingle"))
    a.join(b, "__shingle").where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "__na", "__nb")
      .agg(count(lit(1)).as("__common"))
      .withColumn("containment", greatest(
        col("__common").cast("double") / col("__na"),
        col("__common").cast("double") / col("__nb")))
      .where(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("containment"), 6).as("containment"))
  }

  /**
   * Exact-substring dup pairs: two documents are substring duplicates
   * iff they share at least one contiguous window of `windowK` tokens —
   * the shared-long-span criterion of training-data dedup (the n-gram
   * formulation of the suffix-array approach in Lee et al.,
   * "Deduplicating Training Data Makes Language Models Better", ACL
   * 2022; k-token windows instead of a global suffix array because
   * windows shard — a suffix array does not). Unlike `ngramJaccardPairs`
   * this is a CONTAINMENT test, not a whole-document similarity: a 40
   * word boilerplate paragraph embedded in two otherwise-unrelated pages
   * is found even though their Jaccard is ~0.
   *
   * Plan: k-token windows are exactly the k-shingles, so this reuses the
   * shingle postings index — explode distinct windows, self-join on the
   * window, count distinct shared windows per pair. Shuffles carry
   * (id, window-string) postings, never document bodies. `maxDocFreq`
   * bounds the d² pair blow-up of a window shared by d docs, same as the
   * Jaccard join; at `windowK` ≥ 8 a super-cap window is mass-duplicated
   * boilerplate — at scale, route such windows to a dedicated
   * boilerplate-strip pass (their pair lists identify nothing) rather
   * than enumerating quadratically many pairs.
   */
  def substringDupPairs(df: DataFrame, idCol: String, textCol: String,
      windowK: Int = 8,
      maxDocFreq: Option[Long] = Some(DefaultMaxDocFreq)): DataFrame = {
    val sets = shingleSets(df, idCol, textCol, windowK)
    val postings0 = sets.select(col(idCol),
      explode(col("__shingles")).as("__w"))
    val postings = maxDocFreq match {
      case Some(cap) =>
        val dfreq = postings0.groupBy("__w").agg(count(lit(1)).as("__df"))
        postings0.join(dfreq.where(col("__df") <= cap), "__w")
          .select(col(idCol), col("__w"))
      case None => postings0
    }
    val a = postings.select(col(idCol).as("id_a"), col("__w"))
    val b = postings.select(col(idCol).as("id_b"), col("__w"))
    a.join(b, "__w").where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Rounds the last `components` call needed to converge (including
    * the final no-change round) — the adjudication hook for the
    * iterative-components cost: rounds × |labels| is the loop's total
    * materialized I/O. */
  private[graft] val lastComponentsRounds =
    new java.util.concurrent.atomic.AtomicInteger(-1)

  /**
   * Connected components over an undirected pair list (the transitive
   * closure step that turns near-dup PAIRS into dedup CLUSTERS): min-
   * label propagation WITH pointer jumping, iterated to fixpoint.
   * Returns (id, component) with component = the smallest id in the
   * component — the canonical representative.
   *
   * Each round folds two label moves into one materialization:
   * neighbor-min hooking (component := min over adjacent labels — plain
   * propagation) AND a pointer jump (component := component's own
   * label). The jump composes the label function with itself, so the
   * min label's reach roughly DOUBLES per round instead of growing by
   * one hop: chain-shaped duplicate graphs (v1→v2→…→vN of a drifting
   * page) converge in O(log diameter) rounds where plain propagation
   * needs O(diameter) — and each avoided round avoids an eager
   * materialization of the whole label frame, which is exactly the
   * data-dependent cost that made components the bench's scale-killer
   * on deep graphs. Shallow star-shaped graphs still finish in 2-3
   * rounds; the jump join is a no-op for them.
   *
   * Scale notes: each round is two equi-joins + one aggregation
   * shuffled on node id (the jump join keys on the component label —
   * skewed for giant clusters, which AQE's skew-join splitting
   * handles). Lineage is cut every round with localCheckpoint so plans
   * stay O(1) deep; the driver holds only the changed-count per round,
   * never the labels. Each round is ONE Spark job: the checkpoint is
   * LAZY and the moved-label count is the action that materializes it,
   * so convergence detection rides the same pass that writes the
   * checkpoint blocks (an eager checkpoint + separate isEmpty probe —
   * the previous shape — paid a second full scheduling round-trip per
   * iteration, which dominated wall-clock on deep graphs; at cluster
   * scale every extra job per round is a full barrier).
   */
  def components(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", maxRounds: Int = 20): DataFrame = {
    // symmetrize with ONE pass over `pairs` (explode of both directions),
    // not a unionAll of two references — the pair frame is typically an
    // unpersisted LSH-verify join, and two references would execute it
    // twice inside the edges materialization
    val edges = pairs.select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
      .localCheckpoint(false)
    // lazy like `edges`: round 1's convergence count materializes the
    // whole chain (pairs → edges → labels) in its single job
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id")).localCheckpoint(false)
    var round = 0
    var changed = true
    while (changed && round < maxRounds) {
      val neighborMin = edges.join(labels, col("src") === col("id"))
        .groupBy(col("dst")).agg(min(col("component")).as("__nmin"))
      // pointer jump source: the same materialized frame, re-keyed
      val jmp = labels.select(col("id").as("__jid"),
        col("component").as("__jcomp"))
      // carry the previous label through the checkpoint so convergence
      // detection is a filter over the materialized frame — joining back
      // against the old labels would cost one more shuffle per round
      val next = labels
        .join(neighborMin, col("id") === col("dst"), "left")
        .join(jmp, col("component") === col("__jid"), "left")
        .select(col("id"), col("component").as("__old"),
          least(
            least(col("component"),
              coalesce(col("__nmin"), col("component"))),
            coalesce(col("__jcomp"), col("component")))
            .as("component"))
        .localCheckpoint(false)
      // one job per round: the lazy checkpoint above is materialized BY
      // this count (the filter sits on top of the checkpointed RDD, so
      // computing it writes the checkpoint blocks as a side effect) —
      // folding the convergence probe into the materialization instead
      // of running an eager checkpoint job followed by an isEmpty job
      changed = next.where(col("component") =!= col("__old")).count() > 0
      labels = next.select(col("id"), col("component"))
      round += 1
    }
    require(!changed, s"components did not converge in $maxRounds rounds")
    lastComponentsRounds.set(round)
    log.info(s"components converged in $round rounds")
    labels
  }

  /**
   * End-to-end near-dup corpus dedup: pairs → components → keep only the
   * representative (min id) of every cluster plus all unpaired docs.
   */
  def dedupByPairs(df: DataFrame, pairs: DataFrame,
      idCol: String): DataFrame = {
    val comps = components(pairs)
    val losers = comps.where(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /**
   * Quality-aware variant of `dedupByPairs`: the survivor of each
   * near-dup cluster is the member maximizing `preference` (ties break
   * to the smallest id) instead of the arbitrary min-id — the curation
   * policy that keeps the BEST duplicate (longest, highest quality
   * score, most recent crawl) rather than whichever got the lowest id.
   * Unpaired docs are their own singleton cluster and always survive.
   *
   * Scale shape: components over the (tiny) pair graph, then ONE extra
   * hash shuffle of the corpus on the cluster label for the rank-1
   * window; the window state is O(1) per cluster.
   */
  def dedupByPairsBest(df: DataFrame, pairs: DataFrame, idCol: String,
      preference: Column): DataFrame = {
    // rename the label frame's columns before joining: the caller's
    // idCol may itself be named "id"/"component"
    val comps = components(pairs)
      .select(col("id").as("__comp_id"), col("component").as("__comp_label"))
    val labeled = df.join(comps, df(idCol) === col("__comp_id"), "left")
      .withColumn("__comp", coalesce(col("__comp_label"), col(idCol)))
      .drop("__comp_id", "__comp_label")
    val w = Window.partitionBy(col("__comp"))
      .orderBy(preference.desc, col(idCol))
    labeled.withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1)
      .drop("__comp", "__rk")
  }

  /**
   * Exact-substring REMOVAL — the rewrite companion to
   * `substringDupPairs`: cut every duplicated `spanTokens`-token span
   * out of the corpus, keeping exactly one copy (the globally first
   * occurrence by (doc id, span index)), and return the rewritten
   * documents. This is the "remove the duplicate text itself" step of
   * training-data dedup (Lee et al., ACL 2022 §4.1 — their
   * ExactSubstr variant DELETES the repeated span rather than dropping
   * a whole document; reference analogue: none — extension surface),
   * which catches mass boilerplate that document-level dedup cannot:
   * a shared footer in a million otherwise-distinct pages survives
   * every pairwise filter but disappears here.
   *
   * Spans are the NON-overlapping `spanTokens`-token windows of the
   * normalized token stream (last span may be shorter). Keep-first is
   * total and deterministic: one occurrence per distinct span text
   * survives corpus-wide — later repeats inside the SAME document are
   * removed too.
   *
   * Scale shape: span occurrences shuffle once keyed by the 64-bit
   * span hash for the keep-first window (rank state is O(1); a
   * boilerplate span shared by d docs puts d rows — linear, never d²
   * pairs — on one hash partition, AQE-splittable), then survivors
   * shuffle once doc-keyed for the rebuild. Only the rebuild shuffle
   * carries span text; the window shuffle carries (hash, id, idx,
   * text) postings. The keep-first decision keys on xxhash64(span) by
   * default: a 64-bit collision could merge two distinct spans'
   * keep-first groups (same accepted risk as `exactByHash`, ~n²/2⁶⁵ —
   * the DuckDB oracle replays on the span text itself, so the gate
   * also certifies collision-freedom on the test corpus); pass
   * `hashKey = false` for the unconditionally-exact text-keyed window.
   */
  def stripDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
      spanTokens: Int = 8, hashKey: Boolean = true): DataFrame = {
    require(spanTokens >= 1, s"need spanTokens >= 1, got $spanTokens")
    graft.functions.TextExprs.register(df.sparkSession)
    val spans = df
      .select(col(idCol), expr(s"norm_tokens(`$textCol`)").as("__toks"))
      .where(size(col("__toks")) >= 1)
      .select(col(idCol), explode(expr(
        s"""transform(sequence(0L, (size(__toks) + ${spanTokens - 1}) div $spanTokens - 1),
           |  j -> struct(j AS i,
           |    array_join(slice(__toks, cast(j * $spanTokens + 1 as int), $spanTokens), ' ') AS sp))"""
          .stripMargin)).as("__s"))
      .select(col(idCol), col("__s.i").as("__idx"), col("__s.sp").as("__sp"))
    val keyed = spans.withColumn("__k",
      if (hashKey) xxhash64(col("__sp")) else col("__sp"))
    val w = Window.partitionBy(col("__k")).orderBy(col(idCol), col("__idx"))
    val ranked = keyed.withColumn("__rn", row_number().over(w))
    val rebuilt = ranked.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("__rn") > 1, 1L).otherwise(0L)).as("n_removed"),
        array_join(expr("transform(array_sort(" +
          "collect_list(CASE WHEN __rn = 1 THEN struct(__idx, __sp) END))," +
          " s -> s.__sp)"), " ").as("cleaned_text"))
    df.select(col(idCol)).join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }

  /** Audit companion to `ngramJaccardPairs`' cap: the shingles a given
    * `maxDocFreq` would drop, with their document frequencies — log or
    * persist this next to any capped run. */
  def droppedShingles(df: DataFrame, textCol: String, shingleK: Int,
      maxDocFreq: Long): DataFrame =
    df.select(explode(
        TextNorm.shingles(TextNorm.tokens(col(textCol)), shingleK)).as("shingle"))
      .groupBy("shingle").agg(count(lit(1)).as("doc_freq"))
      .where(col("doc_freq") > maxDocFreq)

  /** Build the shared MinHash+LSH pair graph once — see NearDupGraph. */
  def nearDupGraph(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleK: Int = 3,
      threshold: Double = 0.5,
      maxBucketSize: Long = DefaultMaxLshBucket): NearDupGraph =
    new NearDupGraph(df, idCol,
      minhashNearDupEdges(df, idCol, textCol, numHashes, bands, shingleK,
        threshold, maxBucketSize))
}

/**
 * The MinHash+LSH pair graph computed ONCE and served to the whole
 * cluster family. A curation pipeline typically derives SEVERAL
 * products from the same near-dup graph — cluster labels, the
 * cluster-size distribution for observability, a min-id dedup and a
 * keep-the-best dedup — and recomputing signatures + banding +
 * Jaccard verification per product multiplies the dominant cost. Here
 * the verified edges and the component labels are each persisted on
 * first use, so every product after the first costs only its own
 * aggregation: O(1) corpus passes for the family instead of
 * O(products). At 100 TB that is the difference between one
 * signature scan and four.
 *
 * The per-round bench gates intentionally do NOT share — driver
 * isolation clears caches between queries so each gate times the full
 * pass standalone — a production pipeline calls `Dedup.nearDupGraph`
 * and reads the members. `close()` unpersists both frames.
 *
 * Product semantics are pinned (ExtSpec) to equal the standalone
 * functions: `clusters` ≡ `components(minhashNearDupEdges(...))`,
 * `dedupMinId` ≡ `dedupByPairs`, `dedupBest(p)` ≡ `dedupByPairsBest`.
 */
final class NearDupGraph private[ext] (df: DataFrame, idCol: String,
    edges0: DataFrame) {
  import org.apache.spark.storage.StorageLevel

  /** Verified (id_a, id_b, jaccard) near-dup pairs, persisted. */
  val edges: DataFrame = edges0.persist(StorageLevel.MEMORY_AND_DISK)

  /** (id, component) min-label connected components, persisted —
    * computed from the persisted edges, so the signature pass never
    * re-runs for label consumers. */
  lazy val clusters: DataFrame =
    Dedup.components(edges).persist(StorageLevel.MEMORY_AND_DISK)

  /** Cluster-size distribution (singletons excluded) — the dedup
    * observability product. */
  def clusterSizes: DataFrame =
    clusters.groupBy("component").agg(count(lit(1)).as("__sz"))
      .groupBy(col("__sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))

  /** One survivor per cluster, min-id policy (≡ `Dedup.dedupByPairs`). */
  def dedupMinId: DataFrame = {
    val losers = clusters.where(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** One survivor per cluster, best-by-`preference` policy (ties to
    * the smallest id; ≡ `Dedup.dedupByPairsBest`). */
  def dedupBest(preference: Column): DataFrame = {
    val comps = clusters
      .select(col("id").as("__comp_id"), col("component").as("__comp_label"))
    val labeled = df.join(comps, df(idCol) === col("__comp_id"), "left")
      .withColumn("__comp", coalesce(col("__comp_label"), col(idCol)))
      .drop("__comp_id", "__comp_label")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__comp")).orderBy(preference.desc, col(idCol))
    labeled.withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1)
      .drop("__comp", "__rk")
  }

  def close(): Unit = {
    edges.unpersist(false)
    clusters.unpersist(false)
    ()
  }
}
