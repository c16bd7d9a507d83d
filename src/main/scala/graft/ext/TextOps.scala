package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for corpus curation (SURVEY.md §7.5): per-doc
 * stats, token counting (whitespace + a BPE-ish regex segmentation),
 * stopword-profile language ID, heuristic quality scoring, and winnowing
 * document fingerprints.
 *
 * Everything is a pure Column expression (whole-stage codegen, no UDFs,
 * no shuffles beyond any final aggregate the caller adds), and every
 * formula is chosen to be replicable in ANSI-ish SQL so the DuckDB
 * oracle can verify it exactly.
 */
object TextOps {

  /** Small per-language stopword profiles for the language-ID heuristic.
    * Order = deterministic tie-break priority. (Canonical copy lives in
    * `functions.TextExprs` so the native `token_stats` kernel can bake
    * the sets in statically.) */
  val langProfiles: Seq[(String, Seq[String])] =
    graft.functions.TextExprs.langProfiles

  /** English stopwords used by the quality heuristic. */
  val enStopwords: Seq[String] = langProfiles.head._2

  /** BPE-ish segmentation: letter runs, digit runs, and single
    * non-alnum-non-space symbols — a cheap proxy for subword token count
    * that both Java regex and RE2 interpret identically. */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Count of tokens from `toks` present in `words`. */
  def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

  /**
   * First-global-argmax language pick from per-language hit-count
   * columns (priority = `langProfiles` order): a CASE chain — first
   * language whose hits >= every later language's hits.
   */
  def langIdFromHits(hits: Seq[(String, Column)]): Column =
    hits.init.zipWithIndex.foldRight(lit(hits.last._1): Column) {
      case (((lang, h), i), els) =>
        val later = hits.drop(i + 1).map(_._2)
        when(later.map(h >= _).reduce(_ && _), lit(lang)).otherwise(els)
    }

  /**
   * Stopword-profile language ID over a token array: the language whose
   * profile has the most hits wins; ties resolve in `langProfiles` order.
   */
  def langId(toks: Column): Column =
    langIdFromHits(
      langProfiles.map { case (lang, words) => lang -> hitCount(toks, words) })

  /** Ratio of non-letter/digit/whitespace characters. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[\\p{L}\\p{N}\\s]", "")).cast("double") /
      length(text)

  /**
   * Heuristic quality score in [0,1]: rewards natural stopword density,
   * penalizes symbol soup, rewards non-trivial length. Pure arithmetic so
   * the oracle can recompute it bit-close.
   */
  def qualityScore(stopRatio: Column, punct: Column, nTokens: Column): Column =
    lit(0.4) * least(stopRatio / 0.4, lit(1.0)) +
      lit(0.3) * (lit(1.0) - least(punct / 0.2, lit(1.0))) +
      lit(0.3) * least(nTokens.cast("double") / 100.0, lit(1.0))

  /**
   * Per-document stats frame: char/token/type counts, BPE-ish token
   * estimate, mean token length, stopword & punctuation ratios, quality
   * score, language guess. One narrow projection — no shuffle; all
   * token-derived scalars come from ONE native `token_stats` call per
   * row (the HOF formulation was 6+ interpreted passes — the difference
   * between 0.5 s and 50 s on the sf0.1 corpus). Catalyst's
   * CollapseProject keeps the struct a single evaluation because it is
   * referenced more than once and is not cheap.
   */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.TextExprs.register(df.sparkSession)
    val text = col(textCol)
    val nToks = col("__ts.n_tokens")
    val stopRaw = when(nToks > 0,
      col("__ts.h_en").cast("double") / nToks).otherwise(0.0)
    df.withColumn("__ts", expr(s"token_stats(`$textCol`)"))
      .withColumn("__punct", punctRatio(text))
      .select(
        col(idCol),
        length(text).as("n_chars"),
        nToks.as("n_tokens"),
        col("__ts.n_distinct").as("n_distinct_tokens"),
        size(regexp_extract_all(text, lit(BpeishPattern), lit(0))).as("n_bpeish"),
        round(when(nToks > 0,
          col("__ts.sum_token_len").cast("double") / nToks).otherwise(0.0), 4)
          .as("avg_token_len"),
        round(stopRaw, 4).as("stopword_ratio"),
        round(col("__punct"), 4).as("punct_ratio"),
        round(qualityScore(stopRaw, col("__punct"), nToks), 4)
          .as("quality_score"),
        langIdFromHits(langProfiles.map { case (lang, _) =>
          lang -> col(s"__ts.h_$lang")
        }).as("lang_guess"))
  }

  /**
   * Gopher-rule document filter (Rae et al. 2021, appendix A1.1 — the
   * public quality heuristics most LLM data pipelines start from): one
   * pass per document over whitespace tokens and trimmed non-blank
   * lines, every measure an EXACT integer (centichars / basis points /
   * counts) so a keep decision can never flip on cross-engine float
   * division. Rules, in the paper's order:
   *   - word count in [50, 100 000]
   *   - mean word length in [3, 10] chars (centichars 300..1000)
   *   - symbol-to-word ratio ('#' or '…') ≤ 0.1
   *   - ≤ 90% of lines starting with a bullet ('•', '- ', '* ')
   *   - ≤ 30% of lines ending with an ellipsis ('…' or '...')
   *   - ≥ 80% of words containing an alphabetic character
   *   - ≥ 2 distinct hits from the 8-word English stop list
   * Scale: pure per-row expressions (split / higher-order functions /
   * translate) — no shuffle, no UDF; the filter runs where the text
   * already is and composes with any downstream keep/drop policy.
   */
  def gopherRules(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    val toks = filter(split(text, "\\s+"), t => length(t) > 0)
    val lines = filter(transform(split(text, "\n"), l => trim(l)),
      l => length(l) > 0)
    val stops = array(Seq("the", "be", "to", "of", "and", "that", "have",
      "with").map(lit): _*)
    def bps(x: Column, n: Column): Column =
      floor(x.cast("double") * 10000d / greatest(n, lit(1))).cast("long")
    df.select(
        col(idCol),
        size(toks).cast("long").as("n_words"),
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("__sumlen"),
        (length(text) - length(translate(text, "#…", ""))).cast("long")
          .as("__nsym"),
        size(lines).cast("long").as("__nlines"),
        size(filter(lines, l => l.startsWith("•") || l.startsWith("- ") ||
          l.startsWith("* "))).cast("long").as("__nbullet"),
        size(filter(lines, l => l.endsWith("…") || l.endsWith("...")))
          .cast("long").as("__nell"),
        size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
          .as("__nalpha"),
        size(array_intersect(array_distinct(transform(toks, lower(_))),
          stops)).cast("long").as("stop_hits"))
      .select(col(idCol), col("n_words"),
        floor(col("__sumlen").cast("double") * 100d /
          greatest(col("n_words"), lit(1))).cast("long").as("mean_len_centi"),
        bps(col("__nsym"), col("n_words")).as("symbol_bps"),
        bps(col("__nbullet"), col("__nlines")).as("bullet_bps"),
        bps(col("__nell"), col("__nlines")).as("ellipsis_bps"),
        bps(col("__nalpha"), col("n_words")).as("alpha_bps"),
        col("stop_hits"))
      .withColumn("rules_passed",
        // the per-rule tally makes EVERY threshold visible in the
        // verified output even on a corpus where one rule (here the
        // stop list, on synthetic text) rejects everything
        Seq(col("n_words").between(50L, 100000L),
          col("mean_len_centi").between(300L, 1000L),
          col("symbol_bps") <= 1000L, col("bullet_bps") <= 9000L,
          col("ellipsis_bps") <= 3000L, col("alpha_bps") >= 8000L,
          col("stop_hits") >= 2L).map(_.cast("long")).reduce(_ + _))
      .withColumn("kept", (col("rules_passed") === 7L).cast("long"))
  }

  /**
   * C4 line-level cleaning (Raffel et al. 2020 §2.2 — the other
   * canonical public filter, complementing the doc-level
   * [[gopherRules]]): per document, keep only trimmed lines that end
   * in a terminal punctuation mark ('.', '!', '?', '"'), carry at
   * least 3 whitespace words, and do not mention "javascript"
   * (case-insensitive); then drop the whole document when it contains
   * "lorem ipsum" (any casing) or a curly brace, or when the cleaned
   * text holds fewer than 5 sentences (terminal-mark count — the
   * cross-engine-countable stand-in for C4's sentence splitter).
   * Output is integer-exact per doc: line/sentence censuses, the drop
   * flags, the kept bit, and the cleaned text's length — enough for a
   * downstream pipeline to act on without re-deriving anything. One
   * shuffle-free per-row pass, no UDF.
   */
  def c4Clean(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    val lines = filter(transform(split(text, "\n"), l => trim(l)),
      l => length(l) > 0)
    def lineKept(l: Column): Column =
      (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") ||
        l.endsWith("\"")) &&
        size(filter(split(l, "\\s+"), w => length(w) > 0)) >= 3 &&
        !lower(l).contains("javascript")
    val kept = filter(lines, lineKept(_))
    val cleaned = array_join(kept, "\n")
    df.select(
        col(idCol),
        size(lines).cast("long").as("n_lines"),
        size(kept).cast("long").as("n_kept_lines"),
        (length(cleaned) -
          length(translate(cleaned, ".!?", ""))).cast("long")
          .as("n_sentences"),
        lower(text).contains("lorem ipsum").cast("long").as("has_lorem"),
        text.contains("{").cast("long").as("has_brace"),
        length(cleaned).cast("long").as("cleaned_chars"))
      .withColumn("kept",
        (col("has_lorem") === 0L && col("has_brace") === 0L &&
          col("n_sentences") >= 5L).cast("long"))
  }

  /**
   * HTML/boilerplate stripping — the step C4's published recipe runs
   * BEFORE any line or document filter (Raffel et al. 2020 §2.2 start
   * from extracted text): raw markup in, clean text out. One ordered
   * chain of codegen'd regex/replace passes per row — no UDF, no
   * shuffle:
   *   1. comments `<!-- … -->` drop;
   *   2. `<script>`/`<style>` blocks drop WITH their contents (the
   *      braces and code inside must never reach the text filters);
   *   3. every remaining tag drops, replaced by a space so adjacent
   *      words don't fuse;
   *   4. the six named entities real extractors decode
   *      (&nbsp; &lt; &gt; &quot; &#39;/&apos;, then &amp; LAST so
   *      double-encoded text decodes one level, not two);
   *   5. horizontal whitespace collapses, lines trim, blank lines drop
   *      (newlines survive — [[c4Clean]] downstream is line-based).
   * All patterns are RE2-compatible (lazy quantifiers + inline flags
   * only), so an external SQL engine replays the chain byte-for-byte —
   * the `html_strip` gate hash-compares the cleaned TEXT itself.
   * Output: id, `text` (cleaned), and integer censuses.
   */
  /** The strip chain as a pure Column — composable ahead of any text
    * pipeline stage (curateCorpus runs it first, C4-order). */
  def stripHtml(raw: Column): Column = {
    val noComment = regexp_replace(raw, "(?s)<!--.*?-->", " ")
    val noScript = regexp_replace(noComment,
      "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noTags = regexp_replace(noStyle, "(?s)<[^>]*>", " ")
    val decoded = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    val squeezed = regexp_replace(decoded, "[ \\t\\r]+", " ")
    val lines = filter(transform(split(squeezed, "\n"), l => trim(l)),
      l => length(l) > 0)
    array_join(lines, "\n")
  }

  def htmlStrip(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val raw = col(htmlCol)
    val cleaned = stripHtml(raw)
    df.select(
      col(idCol),
      cleaned.as("text"),
      length(raw).cast("long").as("raw_chars"),
      length(cleaned).cast("long").as("clean_chars"),
      size(filter(split(cleaned, "\\s+"), t => length(t) > 0)).cast("long")
        .as("n_words"))
  }

  /**
   * Bad-words blocklist gate (the Gopher/C4-style public recipe: C4
   * drops any page containing a word from the open blocklist). The
   * list ships as a PLAN LITERAL — the broadcast shape: it rides to
   * executors inside the serialized plan once, the membership test is
   * a codegen'd hash probe per token, and the pass stays shuffle-free
   * where the text lives. Counts are exact integers; `kept` is C4's
   * any-hit-drops rule. A list too large for a literal (millions of
   * entries) should instead broadcast-anti-join exploded tokens —
   * same result, still no fact-side shuffle.
   */
  def blocklistFilter(df: DataFrame, idCol: String, textCol: String,
      blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty, "empty blocklist")
    val toks = TextNorm.tokens(col(textCol))
    val blockArr = array(blocked.map(w => lit(w.toLowerCase)): _*)
    df.select(
        col(idCol),
        size(toks).cast("long").as("n_words"),
        size(filter(toks, t => array_contains(blockArr, t))).cast("long")
          .as("n_bad"),
        size(array_intersect(array_distinct(toks), blockArr)).cast("long")
          .as("n_bad_distinct"))
      .withColumn("kept", (col("n_bad") === 0L).cast("long"))
  }

  /** Ordered (non-distinct) k-shingles — winnowing needs positional
    * k-grams, unlike the set-shaped `TextNorm.shingles`. */
  def orderedShingles(toks: Column, k: Int): Column =
    transform(
      sequence(lit(1), greatest(size(toks) - (k - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(k))))

  /**
   * Winnowing fingerprint (the classic local-min document fingerprint):
   * hash every positional k-shingle (first 8 hex chars of md5 — ASCII
   * lexicographic min == numeric min), take the min hash of every
   * w-window of consecutive shingle hashes, dedupe, sort. Robust to small
   * edits; two docs sharing content share fingerprint entries.
   */
  def fingerprint(toks: Column, k: Int = 3, w: Int = 4): Column = {
    val hashes = transform(orderedShingles(toks, k), s => substring(md5(s), 1, 8))
    val mins = transform(
      sequence(lit(1), greatest(size(hashes) - (w - 1), lit(1))),
      i => array_min(slice(hashes, i, lit(w))))
    array_sort(array_distinct(mins))
  }

  /** Per-doc fingerprint frame — native one-pass kernel (the Column
    * `fingerprint` formulation is semantically identical but interpreted
    * per shingle; a parity spec keeps the two in lockstep). */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4): DataFrame = {
    graft.functions.TextExprs.register(df.sparkSession)
    df.select(col(idCol),
      expr(s"winnow_fingerprint(`$textCol`, $k, $w)").as("fingerprint"))
  }

  /**
   * Pattern scrubbing (the PII-redaction shape): replace every match of
   * `pattern` in `textCol` with `replacement` and report how many spans
   * were masked — the audit column a compliance pipeline logs. Pure
   * per-row projection: zero shuffle, codegen'd regex (use RE2-compatible
   * patterns so an external SQL engine replays it identically).
   */
  /** Opt-in REAL-subword token count (greedy longest-match wordpiece
    * over `graft.functions.Subword`'s vocabulary — register the kernel
    * first): the count a trainer's token budget actually means, vs
    * `token_stats(text).n_tokens`' whitespace-word count. Swap this in
    * as the `tokensCol` input of `Shards.packByBudget` / length
    * bucketing when shard capacities are denominated in model tokens;
    * the whitespace count remains the default for relative quality
    * signals, and every existing oracle keeps using it. */
  def subwordCount(textColName: String): Column =
    expr(s"size(subword_tokens(`$textColName`))").cast("long")

  def maskPattern(df: DataFrame, textCol: String, pattern: String,
      replacement: String, outCol: String = "scrubbed",
      countCol: String = "n_masked"): DataFrame =
    df.withColumn(outCol,
        regexp_replace(col(textCol), pattern, replacement))
      .withColumn(countCol,
        size(regexp_extract_all(col(textCol), lit(pattern), lit(0))))

  /**
   * Corpus vocabulary profile per group: token count, vocabulary size
   * (types), hapax count (types seen exactly once in the group), and
   * type–token ratio — the quick Zipf health check run before training.
   *
   * Scale shape: explode → two chained hash aggregates. The first
   * groupBy (group, token) partial-aggregates map-side, so the shuffle
   * carries one row per distinct (group, token), not per occurrence; the
   * second collapses to one row per group. No windows, no driver work.
   */
  def vocabStats(df: DataFrame, textCol: String,
      groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    df.select(g :+ explode(TextNorm.tokens(col(textCol))).as("__tok"): _*)
      .groupBy(g :+ col("__tok"): _*)
      .agg(count(lit(1)).as("__occ"))
      .groupBy(g: _*)
      .agg(sum(col("__occ")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        count(when(col("__occ") === 1, lit(1))).as("n_hapax"),
        round(count(lit(1)).cast("double") / sum(col("__occ")), 4)
          .as("type_token_ratio"))
  }

  /**
   * Benchmark decontamination — flag training documents that share
   * `shingleK`-gram overlap with an evaluation set (the data-prep step
   * that keeps eval answers out of the training corpus; production
   * pipelines use 8–13-grams on long documents). Returns one row per
   * CONTAMINATED corpus doc: the distinct overlapping shingle count and
   * how many eval docs it hits; clean docs are absent (filter the
   * corpus with a left_anti join on the result to scrub).
   *
   * Scale shape: the eval set is small by definition, so its exploded
   * shingle set is BROADCAST against the corpus shingle stream — the
   * 100 TB corpus is never shuffled; the only aggregation runs on the
   * (tiny) matched candidates.
   */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, shingleK: Int = 5): DataFrame = {
    graft.functions.TextExprs.register(corpus.sparkSession)
    val c = corpus.select(col(idCol),
      explode(expr(s"token_shingles(`$textCol`, $shingleK)")).as("__s"))
    val e = evalSet.select(col(idCol).as("__eval_id"),
      explode(expr(s"token_shingles(`$textCol`, $shingleK)")).as("__s"))
    c.join(broadcast(e), "__s")
      .groupBy(col(idCol))
      .agg(countDistinct(col("__s")).as("n_overlap_shingles"),
        countDistinct(col("__eval_id")).as("n_eval_docs"))
  }

  /**
   * Graded decontamination (the GPT-3 Appendix-C "dirtiness" shape):
   * for EVERY corpus doc, the fraction of its distinct k-shingles that
   * also occur anywhere in the eval set — `decontaminate` gives only
   * the contaminated front line; curation policies that keep / trim /
   * drop by degree need the full score. Reported in exact integer bps
   * (overlap·10000 DIV total), so the keep threshold can never flip on
   * cross-engine float division.
   *
   * Scale: the eval shingle set broadcasts (eval sets are KB-to-MB vs
   * a 100 TB corpus); the corpus shuffles (id, shingle) pairs once for
   * the per-doc aggregate — document text never shuffles, exactly the
   * `decontaminate` plan with a left join in place of the inner.
   *
   * "EVERY corpus doc" is total: docs shorter than `shingleK` tokens
   * carry one whole-doc shingle (the kernel's sub-k contract), and
   * docs with NO shingles at all (NULL text) come back as exact-zero
   * rows (n_shingles = 0, contamination_bps = 0) via the id left-join
   * below — without it the explode would silently drop them and a
   * keep/trim/drop policy keyed on this output would treat them as
   * missing rather than clean.
   */
  def contaminationScore(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, shingleK: Int = 5): DataFrame = {
    graft.functions.TextExprs.register(corpus.sparkSession)
    // token_shingles is set-shaped per doc; the eval union still needs a
    // cross-doc distinct before the broadcast
    val ids = corpus.select(col(idCol))
    val c = corpus.select(col(idCol),
      explode(expr(s"token_shingles(`$textCol`, $shingleK)")).as("__s"))
    val e = evalSet
      .select(explode(expr(s"token_shingles(`$textCol`, $shingleK)")).as("__s"))
      .distinct().withColumn("__hit", lit(1L))
    val agg = c.join(broadcast(e), Seq("__s"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_overlap"))
    ids.join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      // ANSI DIV raises on a zero divisor — the shingle-less rows take
      // the explicit zero branch (0 overlap of 0 shingles = 0 bps)
      .withColumn("contamination_bps",
        when(col("n_shingles") === 0L, lit(0L))
          .otherwise(expr("n_overlap * 10000 DIV n_shingles")))
  }

  /**
   * Unigram LM quality score — the mean log-probability of a document's
   * tokens under the corpus's own unigram distribution, the cheap
   * perplexity proxy of corpus-quality filters (gibberish, boilerplate
   * and wrong-language docs score far below the corpus mode; cf. the
   * KenLM-perplexity feature of CCNet-style pipelines, reduced to its
   * order-0 term).
   *
   * Determinism: the per-doc sum folds over a SORTED token/log-prob
   * list (`sort_array` fixes the order; equal tokens carry equal
   * log-probs, so the fold is a function of the multiset, not of
   * partitioning), leaving only libm `ln` rounding (≤ 1 ulp per term,
   * ~1e-14 absolute over a document) under the 1e-4 display rounding.
   *
   * Scale: token occurrences shuffle once into map-combined counts; the
   * frequency table joins back on the token (sort-merge — a 100 TB
   * corpus vocabulary does not broadcast); the only whole-corpus scalar
   * is the total token count (broadcast). Per-doc state is its own
   * token list, bounded by document length.
   */
  def unigramLogProb(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    graft.functions.TextExprs.register(df.sparkSession)
    val occ = df.select(col(idCol),
      explode(expr(s"norm_tokens(`$textCol`)")).as("__tok"))
    val freq = occ.groupBy(col("__tok")).agg(count(lit(1)).as("__c"))
    val total = freq.agg(sum(col("__c")).as("__total"))
    val scored = occ.join(freq, "__tok").join(broadcast(total))
      .withColumn("__lp",
        log(col("__c").cast("double") / col("__total").cast("double")))
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sort_array(collect_list(struct(col("__tok"), col("__lp"))))
          .as("__sorted"))
      .withColumn("avg_logprob", round(
        expr("aggregate(transform(__sorted, s -> s.__lp), 0D, (a, v) -> a + v)")
          / col("n_tokens"), 4))
      .select(col(idCol), col("n_tokens"), col("avg_logprob"))
  }

  /**
   * Data-selection importance weights (the DSIR recipe — Xie et al.
   * 2023, "Data Selection for Language Models via Importance
   * Resampling" — at its n-gram core): score every document by the
   * average per-token log-ratio between a TARGET-domain unigram LM and
   * the general-corpus unigram LM, both estimated from the corpus
   * itself. `isTarget` marks the rows whose distribution we want more
   * of (a trusted source, a language, a quality tier); a positive
   * `logratio` means the doc's tokens look more target-like than
   * corpus-typical, and `keep` selects exactly those — importance
   * resampling reduced to its deterministic top-of-distribution cut.
   *
   * Both LMs are Laplace-smoothed over the SHARED corpus vocabulary
   * (`(c + α) / (total + α·V)`), so target-unseen tokens stay finite
   * and the two log terms are computed in the identical structure the
   * oracle replays. Determinism: the per-doc sum folds over a SORTED
   * token/ratio list exactly like `unigramLogProb`; the smoothed
   * probabilities are exact integer-valued doubles combined in the
   * same +, /, ln order on both engines, and `keep` compares the
   * ROUNDED ratio so both engines decide the boundary on the same
   * value.
   *
   * Scale: token occurrences shuffle once into map-combined counts per
   * LM (the target table is the same shuffle, pre-filtered); both
   * frequency tables join back token-keyed (sort-merge — no vocabulary
   * broadcast); the only broadcast is the 1-row scalar frame (V, two
   * totals). Nothing is quadratic; per-doc state is its own token
   * list.
   */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, s"need alpha > 0 for finite smoothing, got $alpha")
    graft.functions.TextExprs.register(df.sparkSession)
    val occ = df.select(col(idCol), isTarget.as("__tgt"),
      explode(expr(s"norm_tokens(`$textCol`)")).as("__tok"))
    val freqAll = occ.groupBy(col("__tok")).agg(count(lit(1)).as("__ca"))
    val freqTgt = occ.where(col("__tgt"))
      .groupBy(col("__tok")).agg(count(lit(1)).as("__ct"))
    val scalars = freqAll.join(freqTgt, Seq("__tok"), "left")
      .agg(count(lit(1)).as("__v"), sum(col("__ca")).as("__ta"),
        sum(coalesce(col("__ct"), lit(0L))).as("__tt"))
    val lp = log((coalesce(col("__ct"), lit(0L)).cast("double") + lit(alpha)) /
        (col("__tt").cast("double") + lit(alpha) * col("__v").cast("double"))) -
      log((col("__ca").cast("double") + lit(alpha)) /
        (col("__ta").cast("double") + lit(alpha) * col("__v").cast("double")))
    val scored = occ.join(freqAll, "__tok")
      .join(freqTgt, Seq("__tok"), "left")
      .join(broadcast(scalars))
      .withColumn("__lp", lp)
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sort_array(collect_list(struct(col("__tok"), col("__lp"))))
          .as("__sorted"))
      .withColumn("logratio", round(
        expr("aggregate(transform(__sorted, s -> s.__lp), 0D, (a, v) -> a + v)")
          / col("n_tokens"), 4) + lit(0.0)) // + 0.0: IEEE -0.0 → +0.0, so a
      // tiny-negative ratio that rounds to zero renders identically in
      // every engine (the oracle applies the same normalization)
      .select(col(idCol), col("n_tokens"), col("logratio"),
        (col("logratio") > 0.0).as("keep"))
  }

  /**
   * Linear quality-classifier inference — the model-scoring stage of a
   * curation pipeline (the fastText/logistic-regression quality filters
   * of C4/CCNet-style corpora), reduced to its Spark-shaped core:
   * features from the one-pass native `token_stats` kernel, a
   * fixed weight vector folded into the plan as literals (a real
   * deployment swaps in trained weights — same plan), and a sigmoid.
   * `keep` is decided on the PRE-sigmoid margin (z ≥ 0 ⟺ score ≥ ½):
   * exact integer-free algebra both engines agree on, no exp() at the
   * decision boundary.
   *
   * Features (all from one tokenize): tokens/100 (length), distinct/n
   * (lexical diversity), Σlen/n (mean token length), h_en/n (stopword
   * density). Zero-token docs take 0 for every ratio.
   *
   * Scale: zero shuffle — one codegen'd kernel call + scalar arithmetic
   * per row; the "model" travels inside the serialized plan, so scoring
   * 100 TB is exactly one scan. The summation order of the z terms is
   * fixed left-to-right and replayed identically by the oracle.
   */
  def qualityScoreLinear(df: DataFrame, idCol: String, textCol: String,
      bias: Double = -3.0, wLen: Double = 1.0, wDistinct: Double = 1.5,
      wMeanLen: Double = 0.1, wStop: Double = 8.0): DataFrame = {
    graft.functions.TextExprs.register(df.sparkSession)
    val d = df.withColumn("__ts", expr(s"token_stats(`$textCol`)"))
    val n = col("__ts.n_tokens")
    def ratio(num: Column): Column =
      when(n > 0, num.cast("double") / n).otherwise(0.0)
    val z = lit(bias) +
      lit(wLen) * (n.cast("double") / 100.0) +
      lit(wDistinct) * ratio(col("__ts.n_distinct")) +
      lit(wMeanLen) * ratio(col("__ts.sum_token_len")) +
      lit(wStop) * ratio(col("__ts.h_en"))
    d.select(col(idCol), n.cast("long").as("n_tokens"),
      round(lit(1.0) / (lit(1.0) + exp(-z)), 4).as("lr_score"),
      (z >= 0).as("keep"))
  }

  /**
   * Interpolated bigram LM quality score — the order-1 refinement of
   * `unigramLogProb`: every token after the first scores
   * `ln(0.75·P(w|prev) + 0.25·P(w))` under the corpus's own bigram and
   * unigram tables (Jelinek–Mercer interpolation; the unigram floor
   * keeps unseen-in-context tokens finite), the document's first token
   * scores under the unigram alone. Word-salad and boilerplate
   * separate much harder here than under the order-0 score: their
   * unigram profile can be corpus-typical while their transitions are
   * not.
   *
   * Determinism: the per-doc sum folds over a SORTED (prev, cur, lp)
   * list — equal (prev, cur) pairs carry equal lp, so the fold is a
   * function of the multiset; both engines sort the same ASCII keys
   * binary-wise. The interpolation argument is two exact-rounded IEEE
   * divisions, two multiplies and one add in the identical structure on
   * both sides, so the doubles agree before the 1e-4 display rounding.
   *
   * Scale: bigram occurrences shuffle once into map-combined (prev,
   * cur) counts and once into (prev) context counts; the count tables
   * join back token-keyed (sort-merge — a 100 TB corpus bigram table
   * does not broadcast); the only broadcast scalar is the total token
   * count. Nothing is quadratic; per-doc state is its own token list.
   */
  def bigramLogProb(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    graft.functions.TextExprs.register(df.sparkSession)
    val toks = df.select(col(idCol),
      expr(s"norm_tokens(`$textCol`)").as("__toks"))
    val occ1 = toks.select(col(idCol), explode(col("__toks")).as("__cur"))
    val uni = occ1.groupBy("__cur").agg(count(lit(1)).as("__c1"))
    val total = uni.agg(sum(col("__c1")).as("__n"))
    val occ2 = toks.where(size(col("__toks")) >= 2)
      .select(col(idCol), explode(expr(
        """transform(sequence(1, size(__toks) - 1),
          |  i -> struct(__toks[i - 1] AS p, __toks[i] AS c))""".stripMargin))
        .as("__b"))
      .select(col(idCol), col("__b.p").as("__prev"), col("__b.c").as("__cur"))
    val big = occ2.groupBy("__prev", "__cur").agg(count(lit(1)).as("__c2"))
    val ctx = occ2.groupBy("__prev").agg(count(lit(1)).as("__cctx"))
    val scored2 = occ2.join(big, Seq("__prev", "__cur")).join(ctx, Seq("__prev"))
      .join(uni, Seq("__cur")).join(broadcast(total))
      .withColumn("__lp", log(
        lit(0.75) * col("__c2").cast("double") / col("__cctx").cast("double")
          + lit(0.25) * col("__c1").cast("double") / col("__n").cast("double")))
      .select(col(idCol), col("__prev"), col("__cur"), col("__lp"))
    // the document's first token has no context — unigram term only
    val first = toks.where(size(col("__toks")) >= 1)
      .select(col(idCol), col("__toks")(0).as("__cur"))
      .join(uni, Seq("__cur")).join(broadcast(total))
      .withColumn("__lp",
        log(col("__c1").cast("double") / col("__n").cast("double")))
      .withColumn("__prev", lit(""))
      .select(col(idCol), col("__prev"), col("__cur"), col("__lp"))
    first.unionByName(scored2)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sort_array(collect_list(
          struct(col("__prev"), col("__cur"), col("__lp")))).as("__s"))
      .withColumn("avg_logprob", round(
        expr("aggregate(transform(__s, s -> s.__lp), 0D, (a, v) -> a + v)")
          / col("n_tokens"), 4))
      .select(col(idCol), col("n_tokens"), col("avg_logprob"))
  }

  /**
   * N-gram novelty — the fraction (integer basis points) of a
   * document's distinct k-shingles that appear in NO other document:
   * the cheap data-selection signal for "how much of this doc is new
   * text vs corpus-recycled" (high novelty → informative long tail;
   * near-zero novelty → template/mirror content even when no single
   * pair-wise near-dup exists). The complement of the doc-frequency
   * postings that drive the Jaccard dedup join, reused as a per-doc
   * score.
   *
   * A shingle is "unique" iff its corpus document-frequency is exactly
   * 1 (shingle lists are distinct per doc, so df counts documents).
   * `novelty_bps = n_unique · 10000 div n_shingles` — integer
   * arithmetic, exact on any engine. Short docs (< k tokens) collapse
   * to their single whole-text shingle, empty docs to the empty
   * shingle, so every document scores.
   *
   * Scale: one postings shuffle into map-combined doc-freq counts, one
   * shingle-keyed join back, one doc-keyed aggregate — shuffles carry
   * (id, shingle) postings, never document bodies; nothing quadratic,
   * no broadcast of anything data-sized.
   */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3): DataFrame = {
    graft.functions.TextExprs.register(df.sparkSession)
    val posted = df.select(col(idCol),
      explode(expr(s"token_shingles(`$textCol`, $shingleK)")).as("__sh"))
    val dfreq = posted.groupBy("__sh").agg(count(lit(1)).as("__df"))
    posted.join(dfreq, "__sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__df") === 1L, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty_bps",
        expr("(n_unique * 10000) div n_shingles"))
  }

  /**
   * Collocation mining by document-frequency PMI: bigrams that co-occur
   * in documents far more often than their parts' document frequencies
   * predict — the phrase-mining signal behind tokenizer merge rules and
   * multi-word-entity vocabularies. PMI here is over DOCUMENT
   * frequencies (in how many docs does "machine learning" appear vs
   * "machine" and "learning" separately), not token occurrences: the
   * distinct-per-doc counts come straight from the native codegen
   * `token_shingles` kernels (k=2 / k=1), so the whole op is two
   * map-combined aggregates and two token-keyed joins — the
   * occurrence-count variant would need a non-distinct bigram stream
   * through an interpreted higher-order lambda, the exact
   * CodegenFallback hazard BASELINE.md documents.
   *
   * PMI = ln( (df_ab/N) / ((df_a/N)·(df_b/N)) ), computed with the
   * identical expression structure in the oracle so the doubles match
   * before the display rounding.
   */
  def collocations(df: DataFrame, idCol: String, textCol: String,
      minDf: Long = 5L): DataFrame = {
    graft.functions.TextExprs.register(df.sparkSession)
    val n = df.select(count(lit(1)).as("__n"))
    val uni = df.select(
        explode(expr(s"token_shingles(`$textCol`, 1)")).as("__t"))
      .where(length(col("__t")) > 0)
      .groupBy("__t").agg(count(lit(1)).as("__df_t"))
    val bi = df.select(
        explode(expr(s"token_shingles(`$textCol`, 2)")).as("bigram"))
      .where(size(split(col("bigram"), " ")) === 2)
      .groupBy("bigram").agg(count(lit(1)).as("df_pair"))
      .where(col("df_pair") >= minDf)
    bi
      .withColumn("__a", split(col("bigram"), " ")(0))
      .withColumn("__b", split(col("bigram"), " ")(1))
      .join(uni.select(col("__t").as("__a"), col("__df_t").as("__df_a")), "__a")
      .join(uni.select(col("__t").as("__b"), col("__df_t").as("__df_b")), "__b")
      .join(broadcast(n))
      .select(col("bigram"), col("df_pair"),
        round(log(
          (col("df_pair").cast("double") / col("__n")) /
            ((col("__df_a").cast("double") / col("__n")) *
             (col("__df_b").cast("double") / col("__n")))), 4).as("pmi"))
  }

  /**
   * Fixed-size token chunking with overlap — the context-window prep of
   * embedding/RAG/training pipelines: split each document into windows
   * of `size` tokens starting every `size − overlap` tokens, so
   * consecutive chunks share `overlap` tokens and every token is
   * covered. Chunk count is `ceil(max(n − overlap, 1) / stride)` —
   * every document yields ≥ 1 chunk (an empty doc yields one empty
   * chunk), so doc-level joins against the chunk table never lose rows.
   *
   * Zero shuffle: one native tokenize per row, then a generate from the
   * per-row chunk index sequence — output size is input tokens ×
   * (1 + overlap/stride), linear. All index math is integer, so any
   * engine replays the layout exactly.
   */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int): DataFrame = {
    require(size >= 1 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    graft.functions.TextExprs.register(df.sparkSession)
    val stride = size - overlap
    df
      .withColumn("__toks", expr(s"norm_tokens(`$textCol`)"))
      .withColumn("__n",
        org.apache.spark.sql.functions.size(col("__toks")).cast("long"))
      .withColumn("__chunks",
        expr(s"""transform(
                |  sequence(0L, (greatest(__n - $overlap, 1L) + ${stride - 1}) div $stride - 1),
                |  j -> struct(j AS chunk_id,
                |              array_join(slice(__toks, cast(j * $stride + 1 as int), $size), ' ') AS chunk_text,
                |              size(slice(__toks, cast(j * $stride + 1 as int), $size)) AS n_tokens))""".stripMargin))
      .select(col(idCol), explode(col("__chunks")).as("__c"))
      .select(col(idCol), col("__c.chunk_id"), col("__c.chunk_text"),
        col("__c.n_tokens").cast("long").as("n_tokens"))
  }
}
