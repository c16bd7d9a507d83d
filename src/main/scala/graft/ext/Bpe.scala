package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Distributed byte-pair-encoding tokenizer TRAINING (Sennrich et al.,
 * ACL 2016 — the subword vocabulary learner behind GPT-2/LLaMA-style
 * tokenizers; reference analogue: none — LLM-pipeline extension
 * surface). Learns `numMerges` merge rules from a corpus by repeatedly
 * (1) counting adjacent-symbol pairs across the word-frequency dict,
 * weighted by word frequency, and (2) merging the most frequent pair
 * everywhere it occurs.
 *
 * Architecture, 100 TB first:
 *  - ONE pass over the corpus builds the (word, freq) dictionary — the
 *    only shuffle whose width scales with the data, and it carries
 *    WORDS (bounded vocabulary, map-side combined), never document
 *    bodies. This is how production tokenizer training distributes:
 *    the corpus-size-dependent work is word counting; the merge loop
 *    runs on the dictionary, whose size is corpus-vocabulary-bounded
 *    (tens of millions of rows at web scale — still a DataFrame, never
 *    a driver structure).
 *  - Each merge round is ONE Spark job: the round's replace projection
 *    is a LAZY localCheckpoint materialized by the same pair-count
 *    action that selects the round's best pair (the components/kmeans
 *    loop-cut pattern — an eager checkpoint plus a separate count
 *    would double the per-round barriers). The driver receives exactly
 *    one (pair, count) row per round.
 *  - Pair counts shuffle (symbol-pair, long) keys — symbol strings are
 *    short (≤ `maxWordLen`) and the pair space is vocabulary-bounded.
 *
 * Merge-application semantics (shared verbatim by the DuckDB oracle):
 * the word is kept as a space-delimited symbol string (" h e l l o ")
 * and a merge (a, b) applies literal non-overlapping left-to-right
 * `replace(" a b ", " ab ")` iterated `ReplacePasses` times. A single
 * replace pass misses an occurrence whose leading delimiter was
 * consumed as the previous match's trailing delimiter; re-scanning
 * from the start converges to a fixpoint in ≤ 2 passes (pass 1 leaves
 * bare runs of length ≤ 2, which pass 2 clears; 4 passes are run for
 * margin). The fixpoint equals classic greedy leftmost-nonoverlapping
 * BPE merging everywhere EXCEPT interior same-symbol runs of length
 * ≥ 5 (e.g. "aaaaa" under merge (a,a): greedy yields [aa, aa, a],
 * replace-fixpoint [aa, a, aa] — same merge count, different
 * positions; BpeSpec pins both behaviors and proves the two semantics
 * coincide on the test corpus). Both engines run the identical rule,
 * so training is bit-reproducible and fully SQL-replayable — the same
 * verification standard as the ANN pipelines.
 */
object Bpe {

  /** Word pre-tokenization: letter runs, digit runs, single other
    * non-space chars — TextOps.BpeishPattern. */
  val WordPattern: String = TextOps.BpeishPattern

  /** Words longer than this are excluded from training (standard
    * guard: pathological tokens — base64 blobs, DNA strings — would
    * dominate pair counts and blow the symbol-length bound). */
  val MaxWordLen = 32

  /** Replace passes per merge application; fixpoint is reached in ≤ 2
    * (see scaladoc), 4 leaves margin. Shared with the oracle. */
  val ReplacePasses = 4

  /** Distributed (word, freq) dictionary: the single corpus-wide pass.
    * Map-side combined count keyed on the word — the shuffle carries
    * the vocabulary, not the corpus. */
  def wordFreq(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(
        regexp_extract_all(col(textCol), lit(WordPattern), lit(0))).as("w"))
      .where(length(col("w")) <= MaxWordLen)
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** The end-of-word marker of the classic formulation (Sennrich et
    * al. 2016 §3.2): appended as its own symbol so merges can learn
    * suffix tokens ("ing</w>") distinct from word-internal ones. The
    * word pre-tokenizer can never emit it as a data symbol ('<', '/',
    * 'w', '>' tokenize to four separate words), so no collision. */
  val EowMarker = "</w>"

  /** " h e l l o " — every symbol delimited on BOTH sides so a merge
    * pattern " a b " can only match exact symbol boundaries; with
    * `eow`, " h e l l o </w> ". */
  private def spaced(w: Column, eow: Boolean): Column = {
    val chars = concat(lit(" "), regexp_replace(w, "(.)", "$1 "))
    if (eow) concat(chars, lit(EowMarker + " ")) else chars
  }

  /** One merge application: literal replace iterated to fixpoint. */
  private[graft] def applyMerge(sp: Column, a: String, b: String): Column = {
    val pat = lit(s" $a $b ")
    val rep = lit(s" $a$b ")
    (1 to ReplacePasses).foldLeft(sp)((c, _) => replace(c, pat, rep))
  }

  /** Adjacent-symbol pair counts over a (freq, sp) dict frame. */
  private def pairCounts(dict: DataFrame): DataFrame =
    dict.select(col("freq"), split(trim(col("sp")), " ").as("s"))
      .where(size(col("s")) >= 2)
      .select(col("freq"), explode(zip_with(
          slice(col("s"), lit(1), size(col("s")) - 1),
          slice(col("s"), lit(2), size(col("s")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** Spark-job rounds the last `train` call used (each round = one
    * pair-count job) — the scheduling-floor adjudication hook for
    * batched training: merges ÷ rounds is the realized batching
    * factor. */
  private[graft] val lastTrainRounds =
    new java.util.concurrent.atomic.AtomicInteger(-1)

  /**
   * Train `numMerges` merge rules; returns (ordered merges, final dict
   * frame with columns freq/sp in post-merge spaced form). Ties on the
   * pair count break (a, b) ascending binary — deterministic across
   * engines (both compare UTF-8 bytes). Stops early if the dictionary
   * runs out of adjacent pairs.
   *
   * `batchSize` bounds how many merges one round may learn: the round
   * collects a deep top-K pair list and selects, in count order, up to
   * `batchSize` pairwise NON-INTERACTING pairs — no symbol of a later
   * selection equals a symbol (or the merged token) of an earlier one
   * — applying them in one replace chain; interacting pairs are
   * skipped and reconsidered at the next round's fresh counts.
   * Applying merge (a, b) cannot change the count of any pair disjoint
   * from {a, b, ab}, so when the round's top pairs are pairwise
   * non-interacting the batched selection is EXACTLY what sequential
   * greedy recounting would pick (BpeSpec pins this). Outside that
   * domain the learned LIST can differ from m = 1 in order — a skipped
   * interacting pair trains after a lower-count disjoint one, and a
   * merge's newly created pairs (x, ab) only enter at the next round —
   * standard batched-BPE behavior; the result is still a valid,
   * deterministic merge list. batchSize = 1 (the default, and what
   * every oracle-gated query runs) is exactly classic sequential BPE.
   *
   * Why it matters at scale: each round is ONE driver-paced Spark job
   * regardless of data size, so a production 32k-merge vocabulary at
   * m = 1 is 32k sequential job barriers — hours of scheduling floor
   * on an empty cluster. Batching cuts the barrier count toward
   * vocab/batchSize (measured, BpeSpec: 256 merges on a Zipf corpus in
   * 32 rounds at batchSize = 8 — the full 8× round cut).
   */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      eow: Boolean = false,
      batchSize: Int = 1): (Seq[(String, String)], DataFrame) = {
    require(batchSize >= 1, s"need batchSize >= 1, got $batchSize")
    // lazy checkpoint: round 1's pair-count job materializes the whole
    // corpus pass (wordFreq shuffle) together with its own aggregation.
    // `w` rides along untouched so the final dict doubles as the
    // word → segmentation lookup `segment` joins against.
    var dict = wordFreq(df, textCol)
      .select(col("w"), col("freq"), spaced(col("w"), eow).as("sp"))
      .localCheckpoint(false)
    val merges = Seq.newBuilder[(String, String)]
    var n = 0
    var rounds = 0
    var exhausted = false
    while (n < numMerges && !exhausted) {
      val want = math.min(batchSize, numMerges - n)
      // TakeOrderedAndProject — one job; the deep list (4× the batch)
      // gives the skip-scan room to fill the batch past interacting
      // pairs while staying driver-bounded
      val depth = if (want == 1) 1 else math.max(want * 4, 64)
      val top = pairCounts(dict)
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(depth).collect()
      if (top.isEmpty) exhausted = true
      else {
        // top-`want` pairwise non-interacting pairs in count order:
        // skip any pair sharing a symbol (or the merged token) with an
        // earlier selection — it reappears at the next round's counts
        val used = scala.collection.mutable.Set.empty[String]
        val picked = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        top.iterator.takeWhile(_ => picked.size < want).foreach { r =>
          val (a, b) = (r.getString(0), r.getString(1))
          if (picked.isEmpty || (!used(a) && !used(b) && !used(a + b)))
            { picked += ((a, b)); used ++= Seq(a, b, a + b) }
        }
        merges ++= picked
        // lazy again: the NEXT round's pair count (or the caller's
        // first action on the returned dict) materializes this round's
        // replace chain — 1 job per round, lineage cut every round
        dict = dict.withColumn("sp",
            picked.foldLeft(col("sp")) { case (c, (a, b)) =>
              applyMerge(c, a, b) })
          .localCheckpoint(false)
        n += picked.size
      }
      rounds += 1
    }
    lastTrainRounds.set(rounds)
    (merges.result(), dict)
  }

  /** The learned merge table: (rank, lhs, rhs, merged), rank 1-based in
    * learning order — the artifact a tokenizer ships. */
  def mergesDf(spark: SparkSession, merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), i) => (i + 1, a, b, a + b) }
      .toDF("rank", "lhs", "rhs", "merged")
  }

  /** Post-merge token vocabulary with corpus frequencies: every symbol
    * surviving in the final dict, weighted by word frequency. */
  def vocab(dict: DataFrame): DataFrame =
    dict.select(col("freq"),
        explode(split(trim(col("sp")), " ")).as("token"))
      .groupBy("token").agg(sum(col("freq")).as("freq"))

  /**
   * Subword-segment a corpus with a TRAINED dict: per-document word
   * and subword counts. Application is ONE word-keyed join against the
   * dict's final segmentation — cost independent of the merge count
   * (the naive alternative, replaying every merge over every document,
   * multiplies the corpus pass by the vocabulary size). Words outside
   * the dict (longer than `MaxWordLen`) count as one opaque token.
   * Scale: the corpus explodes to (doc, word) once and joins word-
   * keyed (sort-merge; broadcast when the dict is small enough) — the
   * shuffle carries words, never document bodies.
   */
  def segment(df: DataFrame, idCol: String, textCol: String,
      dict: DataFrame): DataFrame = {
    val occ = df.select(col(idCol), explode(
      regexp_extract_all(col(textCol), lit(WordPattern), lit(0))).as("w"))
    val seg = dict.select(col("w"),
      size(split(trim(col("sp")), " ")).cast("long").as("__n_sub"))
    occ.join(seg, Seq("w"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("__n_sub"), lit(1L))).as("n_subwords"))
  }

  /**
   * The full tokenized SEQUENCE per document (space-joined subwords in
   * word order) — what a training-data writer actually emits. Same
   * one-join application shape as `segment`; document order is
   * restored by sorting each doc's (word position, segmentation)
   * pairs inside the aggregate, so per-doc state is the document's own
   * token list and nothing global sorts. Out-of-dict words pass
   * through as one opaque token.
   */
  def segmentTokens(df: DataFrame, idCol: String, textCol: String,
      dict: DataFrame): DataFrame = {
    val occ = df.select(col(idCol), posexplode(
        regexp_extract_all(col(textCol), lit(WordPattern), lit(0)))
      .as(Seq("__pos", "w")))
    val seg = dict.select(col("w"), trim(col("sp")).as("__seg"))
    occ.join(seg, Seq("w"), "left")
      .withColumn("__seg", coalesce(col("__seg"), col("w")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("__pos").as("p"),
              col("__seg").as("s")))),
            x => x.getField("s")), " ").as("tokens"))
  }
}
