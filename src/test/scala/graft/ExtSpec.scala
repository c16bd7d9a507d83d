package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, Multimodal, Similarity, TextNorm, TextOps}

class ExtSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("id", "text")

  // ----------------------------------------------------------- dedup —

  test("Dedup.exact and exactByHash keep the min-id representative") {
    val in = docs((1L, "aa bb"), (5L, "aa bb"), (3L, "cc dd"), (2L, "aa bb"))
    for (out <- Seq(Dedup.exact(in, "id", "text"),
                    Dedup.exactByHash(in, "id", "text"))) {
      val got = out.orderBy("id").as[(Long, String)].collect().toSeq
      assert(got == Seq((1L, "aa bb"), (3L, "cc dd")))
    }
  }

  test("ngramJaccardPairs finds a planted near-dup pair and nothing else") {
    val base = (1 to 30).map(i => s"token$i").mkString(" ")
    val nearDup = (1 to 29).map(i => s"token$i").mkString(" ") + " tokenX"
    val other = (100 to 130).map(i => s"word$i").mkString(" ")
    val in = docs((1L, base), (2L, nearDup), (3L, other))
    val got = Dedup.ngramJaccardPairs(in, "id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L)))
  }

  test("substringDupPairs: containment pairs Jaccard misses, none invented") {
    // docs 1/2 share one 8-token boilerplate span inside otherwise
    // disjoint text (whole-doc Jaccard ~0.1 — below any near-dup
    // threshold); doc 3 shares nothing; docs 4/5 are short (< 8 tokens)
    // identical, matching via the whole-doc degenerate window
    val span = (1 to 8).map(i => s"legal$i").mkString(" ")
    val a = s"alpha1 alpha2 alpha3 $span alpha4 alpha5 alpha6 alpha7"
    val b = s"beta1 beta2 beta3 beta4 $span beta5 beta6 beta7"
    val c = (1 to 20).map(i => s"gamma$i").mkString(" ")
    val in = docs((1L, a), (2L, b), (3L, c), (4L, "tiny doc"), (5L, "tiny doc"))
    val got = Dedup.substringDupPairs(in, "id", "text", windowK = 8)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Long)].collect().toSeq
    // 1-2 share exactly the one distinct 8-window wholly inside the span
    assert(got == Seq((1L, 2L, 1L), (4L, 5L, 1L)))
    // the same pair is invisible to whole-document Jaccard at 0.5
    val j = Dedup.ngramJaccardPairs(in, "id", "text", shingleK = 3,
      threshold = 0.5).where($"id_a" === 1 && $"id_b" === 2)
    assert(j.isEmpty)
    // doc-freq cap drops a window shared by > cap docs (boilerplate in
    // every doc identifies nothing and costs d² pairs)
    val many = docs((1 to 12).map(i => (i.toLong, s"$span suffix$i")): _*)
    assert(Dedup.substringDupPairs(many, "id", "text", windowK = 8,
      maxDocFreq = Some(5L)).isEmpty)
  }

  test("near-dup sketch family agrees with exact pairs on real documents") {
    // the sketch-blocked variants (MinHash-LSH, SimHash-pigeonhole) must
    // recover exactly the exact-Jaccard pair set on the testdata corpus
    val d = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def pairSet(p: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      p.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = pairSet(
      Dedup.ngramJaccardPairs(d, "doc_id", "text", maxDocFreq = None))
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    assert(pairSet(Dedup.minhashNearDups(d, "doc_id", "text",
      numHashes = 128, bands = 32)) == exact)
    // SimHash is a blocker with corpus-dependent recall: tiny documents
    // (~10 tokens) have unstable bit sums, so a one-token diff can exceed
    // the Hamming budget. Verification guarantees precision == 1; recall
    // is asserted, not exactness.
    val sim = pairSet(Dedup.simhashNearDups(d, "doc_id", "text", maxHamming = 6))
    assert(sim.subsetOf(exact), "verified simhash pairs must be true pairs")
    val recall = sim.size.toDouble / exact.size
    assert(recall >= 0.9, s"simhash blocking recall $recall too low")
  }

  test("LSH hot-bucket guard: capped pairs drop + audit, edges star at O(d)") {
    // 1000 byte-identical docs — every band bucket holds all 1000 ids,
    // the boilerplate-corpus shape whose naive expansion is d² = 499500
    // pairs in ONE join task. Two extra docs are an ordinary sub-cap
    // near-dup pair that must keep working alongside the hot bucket.
    val boiler = "the same boilerplate footer text repeated on every page"
    val hot = docs(((1 to 1000).map(i => (i.toLong, boiler)) ++ Seq(
      (2001L, "rare alpha beta gamma delta epsilon zeta eta theta"),
      (2002L, "rare alpha beta gamma delta epsilon zeta eta iota"))): _*)
    val sigs = Dedup.minhashSignatures(hot, "id", "text", numHashes = 8)
      .persist()
    // pairs API with the cap: the hot bucket is EXCLUDED, the sub-cap
    // pair survives, and the audit enumerates exactly the hot buckets
    val pairs = Dedup.lshCandidatePairs(sigs, "id", bands = 4,
        maxBucketSize = Some(100L))
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((2001L, 2002L)))
    val dropped = Dedup.droppedLshBuckets(sigs, "id", bands = 4,
        maxBucketSize = 100L)
      .select("bucket_size").as[Long].collect().toSeq
    assert(dropped.length == 4 && dropped.forall(_ == 1000L),
      s"expected the 4 hot band buckets, got $dropped")
    // edges API: the hot bucket becomes a min-id STAR — exactly d−1
    // candidate rows (O(d), NOT O(d²)) — plus the ordinary pair
    val edges = Dedup.lshCandidateEdges(sigs, "id", bands = 4,
      maxBucketSize = 100L)
    val got = edges.as[(Long, Long)].collect()
    assert(got.length == 1000, s"O(d) expansion expected, got ${got.length}")
    assert(got.filter(_._1 == 1L).length == 999)
    assert(got.toSet.contains((2001L, 2002L)))
    // components over the star resolve the same single cluster the full
    // d² expansion would
    val comp = Dedup.components(edges).as[(Long, Long)].collect()
      .filter(_._1 <= 1000L)
    assert(comp.length == 1000 && comp.forall(_._2 == 1L))
    sigs.unpersist()
  }

  test("minhashNearDupEdges ≡ minhashNearDups when no bucket is hot") {
    val d = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def rows(p: org.apache.spark.sql.DataFrame) =
      p.select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
        .collect().toSet
    assert(rows(Dedup.minhashNearDupEdges(d, "doc_id", "text",
        numHashes = 128, bands = 32)) ==
      rows(Dedup.minhashNearDups(d, "doc_id", "text",
        numHashes = 128, bands = 32)))
  }

  test("releaseCaches unpersists the dedup operators' internal caches; released results still recompute correctly") {
    val d = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    // drain anything earlier tests left behind so the baseline is ours.
    // All checks below are DELTA-based on RDD ids: the session is
    // shared and suites run in parallel, so the GLOBAL persistent-RDD
    // count can legitimately move under this test (another suite's
    // cache()) — only the ids the near-dup pass ADDED are ours to pin.
    Dedup.releaseCaches(spark)
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    val pairs = Dedup.minhashNearDups(d, "doc_id", "text",
      numHashes = 32, bands = 8)
    val before = pairs.count()
    val added = spark.sparkContext.getPersistentRDDs.keySet -- baseline
    assert(added.nonEmpty,
      "the near-dup pass should have materialized tracked caches")
    // the call persisted its shingle + signature + banded frames — the
    // registry must know about them and release them all
    val released = Dedup.releaseCaches(spark)
    assert(released >= 3, s"expected >=3 tracked caches, got $released")
    val remaining = spark.sparkContext.getPersistentRDDs.keySet
      .intersect(added)
    assert(remaining.isEmpty,
      s"released caches must leave no tracked RDDs behind: $remaining")
    // a released (lazy) result recomputes, same answer
    assert(pairs.count() == before)
    // the registry drained: a release with no new dedup calls is a no-op
    assert(Dedup.releaseCaches(spark) == 0)
  }

  test("NearDupGraph: one shared pair graph serves clusters, sizes and both dedup policies identically to the standalone functions") {
    val d = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val g = Dedup.nearDupGraph(d, "doc_id", "text",
      numHashes = 128, bands = 32)
    try {
      val soloEdges = Dedup.minhashNearDupEdges(d, "doc_id", "text",
        numHashes = 128, bands = 32)
      def pairs(p: org.apache.spark.sql.DataFrame) =
        p.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(pairs(g.edges) == pairs(soloEdges) && pairs(g.edges).nonEmpty)
      def labels(p: org.apache.spark.sql.DataFrame) =
        p.select("id", "component").as[(Long, Long)].collect().toSet
      assert(labels(g.clusters) == labels(Dedup.components(soloEdges)))
      assert(g.clusterSizes.as[(Long, Long)].collect().toSet ==
        Dedup.components(soloEdges).groupBy("component")
          .agg(count(lit(1)).as("s")).groupBy(col("s").as("cluster_size"))
          .agg(count(lit(1)).as("n_clusters"))
          .as[(Long, Long)].collect().toSet)
      def ids(p: org.apache.spark.sql.DataFrame) =
        p.select("doc_id").as[Long].collect().toSet
      assert(ids(g.dedupMinId) == ids(Dedup.dedupByPairs(d, soloEdges, "doc_id")))
      assert(ids(g.dedupBest(col("n_chars"))) ==
        ids(Dedup.dedupByPairsBest(d, soloEdges, "doc_id", col("n_chars"))))
    } finally g.close()
  }

  test("ngramJaccardPairs: doc-freq cap bounds hot postings, keeps clean output") {
    // every doc shares one ubiquitous prefix shingle; true dups still
    // share rare shingles, so a cap must not change the pair output
    val common = "the same old prefix"
    val in = docs((1 to 40).map(i =>
      (i.toLong, s"$common unique$i body$i tail$i")): _*)
      .union(docs((100L, s"$common dup body dup tail extra"),
                  (101L, s"$common dup body dup tail extra")))
    val capped = Dedup.ngramJaccardPairs(in, "id", "text",
      maxDocFreq = Some(5L))
    val exact = Dedup.ngramJaccardPairs(in, "id", "text", maxDocFreq = None)
    assert(capped.select("id_a", "id_b").as[(Long, Long)].collect().toSeq ==
      exact.select("id_a", "id_b").as[(Long, Long)].collect().toSeq)
    // identical docs sharing a CAPPED shingle must still score 1.0 —
    // set sizes are taken over the capped universe, not the raw sets
    val cappedJ = capped.where($"id_a" === 100 && $"id_b" === 101)
      .select("jaccard").as[Double].head()
    assert(cappedJ == 1.0)
    // the audit op surfaces exactly the ubiquitous shingles a cap drops
    val dropped = Dedup.droppedShingles(in, "text", 3, 5L)
      .as[(String, Long)].collect().toMap
    assert(dropped.nonEmpty && dropped.keys.forall(_.contains("same old")))
  }

  test("native codegen text expressions match the HOF Column versions bit-for-bit") {
    graft.functions.TextExprs.register(spark)
    val d = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val both = d.select(
      TextNorm.tokens($"text").as("hof_toks"),
      expr("norm_tokens(text)").as("nat_toks"),
      TextNorm.shingles(TextNorm.tokens($"text"), 3).as("hof_sh"),
      expr("token_shingles(text, 3)").as("nat_sh"))
    assert(both.where($"hof_toks" =!= $"nat_toks" || $"hof_sh" =!= $"nat_sh")
      .count() == 0)
    // edge cases: punctuation-only, empty, shorter-than-k
    val edges = Seq("", "!!! ---", "one two", "Mixed CASE 42!x").toDF("text")
    val e = edges.select(
      TextNorm.shingles(TextNorm.tokens($"text"), 3).as("hof"),
      expr("token_shingles(text, 3)").as("nat"))
    assert(e.where($"hof" =!= $"nat").count() == 0)
  }

  test("Subword: greedy longest match, continuation pieces, whole-word UNK") {
    import graft.functions.Subword
    graft.functions.Subword.register(spark)
    graft.functions.TextExprs.register(spark)
    def pieces(text: String): Seq[String] =
      Seq(text).toDF("text").selectExpr("subword_tokens(text)")
        .as[Seq[String]].head()
    // "preexisting": longest initial piece is "pre" (not "p"),
    // continuations prefer "##ex" over "##e", tail matches "##ing"
    assert(pieces("preexisting") ==
      Seq("pre", "##ex", "##i", "##s", "##t", "##ing"))
    // ASCII singles guarantee no UNK; word order preserved across words
    assert(pieces("ab 12") == Seq("a", "##b", "1", "##2"))
    // non-ASCII letter has no piece at its position → whole word [UNK],
    // neighbors unaffected
    assert(pieces("ok héllo") == Seq("o", "##k", Subword.Unk))
    assert(pieces("") == Seq())
    // the opt-in counting helper agrees with the pieces the model sees
    val c = Seq(("x", "preexisting ok"))
      .toDF("id", "body")
      .select(graft.ext.TextOps.subwordCount("body").as("n"))
      .as[Long].head()
    assert(c == 8L)
  }

  test("Dedup.incrementalNearDups: corpus dups drop, lower batch id wins, novel survives") {
    val base = (1 to 30).map(i => s"token$i").mkString(" ")
    val nearBase = (1 to 29).map(i => s"token$i").mkString(" ") + " tokenX"
    val pairA = (50 to 80).map(i => s"word$i").mkString(" ")
    val pairB = (50 to 79).map(i => s"word$i").mkString(" ") + " wordY"
    val novel = (200 to 230).map(i => s"fresh$i").mkString(" ")
    val corpus = docs((1L, base))
    // batch: 10 dups the corpus doc → dropped; 11/12 are mutual dups →
    // 11 (lower id) admitted, 12 dropped; 13 is novel → admitted
    val batch = docs((10L, nearBase), (11L, pairA), (12L, pairB), (13L, novel))
    val got = Dedup.incrementalNearDups(corpus, batch, "id", "text")
      .select("id").as[Long].collect().toSeq.sorted
    assert(got == Seq(11L, 13L))
    // idempotence: re-running the same batch against the corpus admits
    // the same set (the admit rule depends only on content and ids)
    val again = Dedup.incrementalNearDups(corpus, batch, "id", "text")
      .select("id").as[Long].collect().toSeq.sorted
    assert(again == Seq(11L, 13L))

    // the stored-index path must admit the identical set and return rows
    // carrying the index columns
    val corpusIdx = Dedup.buildBandIndex(corpus, "id", "text",
      numHashes = 64, bands = 16)
    assert(corpusIdx.columns.toSet ==
      Set("id", "text", Dedup.IndexBucketsCol, Dedup.IndexShinglesCol))
    val viaIndex = Dedup.incrementalNearDupsIndexed(corpusIdx, batch,
        "id", "text", numHashes = 64, bands = 16)
    assert(viaIndex.select("id").as[Long].collect().toSeq.sorted ==
      Dedup.incrementalNearDups(corpus, batch, "id", "text",
          numHashes = 64, bands = 16)
        .select("id").as[Long].collect().toSeq.sorted)
    assert(viaIndex.columns.contains(Dedup.IndexBucketsCol))
    // empty text yields the single-empty-shingle signature — SAME as the
    // recompute path (two empty docs near-dup each other in both); a
    // null-text doc falls back to empty (not null) index arrays
    val emptyDoc = Dedup.buildBandIndex(docs((7L, "")), "id", "text",
        numHashes = 64, bands = 16)
      .select(col(Dedup.IndexBucketsCol), col(Dedup.IndexShinglesCol))
      .head()
    assert(emptyDoc.getSeq[Long](0).size == 16 &&
      emptyDoc.getSeq[String](1) == Seq(""))
    assert(Dedup.incrementalNearDupsIndexed(corpusIdx, docs((7L, "")),
      "id", "text", numHashes = 64, bands = 16)
      .select("id").as[Long].collect().toSeq == Seq(7L))
  }

  test("TextOps.gopherRules: each rule discriminates, a clean doc keeps") {
    val base = "the quick brown fox jumps over the lazy dog and " +
      "runs with great speed that day under warm skies every morning "
    val docs = Seq(
      ("clean", base * 4),                            // all 7 rules pass
      ("short", "the and to of"),                     // word count < 50
      ("symbols", (base * 4) + ("# " * 60)),          // '#' per word > 0.1
      ("bullets", Seq.fill(10)("• item in a list").mkString("\n") +
        "\n" + base * 4),                             // just bullets + body
      ("numeric", ("12345 67890 11111 " * 20) + "the and"), // alpha < 80%
      ("longwords", ("extraordinarily incomprehensible " * 30) + "the and"),
      ("nostops", "alpha beta gamma delta epsilon zeta " * 10)
    ).toDF("doc_id", "text")
    val got = TextOps.gopherRules(docs, "doc_id", "text")
      .select("doc_id", "kept", "rules_passed", "stop_hits")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("clean")._2 == 1L && got("clean")._3 == 7L)
    // 4 words fail the count AND the 2.5-char mean; the other 5 pass
    assert(got("short")._2 == 0L && got("short")._3 == 5L)
    assert(got("symbols")._2 == 0L)
    assert(got("numeric")._2 == 0L)
    assert(got("longwords")._2 == 0L)
    assert(got("nostops")._2 == 0L && got("nostops")._4 == 0L)
    // the bullet doc fails ONLY when bullets dominate the line census:
    // 10 bullet lines over 11 total lines is > 90%
    assert(got("bullets")._2 == 0L)
    // stop hits are DISTINCT stop-list words, not token occurrences
    // ('the' appears twice per repetition but counts once)
    assert(got("clean")._4 == 4L) // the, and, with, that
  }

  test("TextOps.c4Clean: line rules and page drops each discriminate") {
    val good = "This line has plenty of words."
    val six = Seq.fill(6)(good).mkString("\n")
    val docs = Seq(
      ("keep", six),                                    // 6 kept, >=5 sentences
      ("shortlines", Seq.fill(6)("Too short.").mkString("\n")), // < 3 words
      ("nopunct", Seq.fill(6)("this line has no terminal punctuation at all")
        .mkString("\n")),
      ("js", six + "\nThis site needs JavaScript enabled to work."),
      ("lorem", six + "\nLorem Ipsum dolor sit amet."),
      ("brace", six + "\nvar code = { x };"),
      ("fewsent", Seq.fill(3)(good).mkString("\n"))
    ).toDF("doc_id", "text")
    val got = TextOps.c4Clean(docs, "doc_id", "text")
      .select("doc_id", "n_lines", "n_kept_lines", "kept")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("keep") == (("keep", 6L, 6L, 1L)))
    assert(got("shortlines")._3 == 0L && got("shortlines")._4 == 0L)
    assert(got("nopunct")._3 == 0L && got("nopunct")._4 == 0L)
    // the javascript LINE drops; the page survives on the others
    assert(got("js") == (("js", 7L, 6L, 1L)))
    // lorem ipsum and curly braces drop the PAGE even when its lines
    // individually pass
    assert(got("lorem")._3 == 7L && got("lorem")._4 == 0L)
    assert(got("brace")._4 == 0L)
    // fewer than 5 sentences after cleaning drops the page
    assert(got("fewsent")._3 == 3L && got("fewsent")._4 == 0L)
  }

  test("TextOps.decontaminate: flags exactly the docs overlapping the eval set") {
    val shared = (1 to 10).map(i => s"leak$i").mkString(" ")
    val evalSet = docs((100L, s"$shared and some eval framing text"))
    val corpus = docs(
      (1L, s"prefix words then $shared trailing content"), // contaminated
      (2L, (20 to 40).map(i => s"clean$i").mkString(" ")), // clean
      (3L, s"also carries $shared inside it"))             // contaminated
    val got = TextOps.decontaminate(corpus, evalSet, "id", "text",
        shingleK = 5)
      .orderBy("id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 3L))
    assert(got.forall { case (_, nSh, nEval) => nSh >= 6 && nEval == 1 })
  }

  test("TextOps.contaminationScore: exact-bps overlap share for every doc, clean docs score 0") {
    val evalSet = docs((100L, "a b c d e"))            // one 5-shingle
    val corpus = docs(
      (1L, "a b c d e f"),                             // 2 shingles, 1 hits → 5000 bps
      (2L, "p q r s t u v"))                           // 3 shingles, 0 hit → 0 bps
    val got = TextOps.contaminationScore(corpus, evalSet, "id", "text",
        shingleK = 5)
      .orderBy("id")
      .select("id", "n_shingles", "n_overlap", "contamination_bps")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 1L, 5000L), (2L, 3L, 0L, 0L)))
  }

  test("TextOps.contaminationScore: shingle-less docs come back as exact-zero rows, short docs shingle whole") {
    val evalSet = docs((100L, "a b c d e"))
    // a sub-k doc carries ONE whole-doc shingle (kernel contract); only
    // a NULL text yields no shingles at all — it must not vanish
    val corpus = Seq((1L, Some("a b c d e f")), (2L, Some("too short")),
      (3L, None: Option[String])).toDF("id", "text")
    val got = TextOps.contaminationScore(corpus, evalSet, "id", "text",
        shingleK = 5)
      .orderBy("id")
      .select("id", "n_shingles", "n_overlap", "contamination_bps")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 1L, 5000L), (2L, 1L, 0L, 0L), (3L, 0L, 0L, 0L)))
  }

  test("Sampling.stratifiedByHash: per-group rates, determinism, append stability") {
    import graft.ext.Sampling
    val df = (0 until 2000)
      .map(i => (i.toLong, if (i % 4 == 0) "fr" else "en")).toDF("id", "lang")
    val kept = Sampling.stratifiedByHash(df, "lang", "id",
        Map("en" -> 0.25)).select("id", "lang")
      .as[(Long, String)].collect().toSet
    // fr keeps everything; en keeps ~25% (hash-binomial, loose bounds)
    assert(kept.count(_._2 == "fr") == 500)
    val en = kept.count(_._2 == "en")
    assert(en > 290 && en < 460, s"en kept $en of 1500, expected ~375")
    // deterministic: same input → same sample
    val again = Sampling.stratifiedByHash(df, "lang", "id",
        Map("en" -> 0.25)).select("id", "lang")
      .as[(Long, String)].collect().toSet
    assert(again == kept)
    // append stability: sampling a prefix yields exactly the subset
    val prefix = Sampling.stratifiedByHash(
        df.where($"id" < 1000), "lang", "id", Map("en" -> 0.25))
      .select("id", "lang").as[(Long, String)].collect().toSet
    assert(prefix == kept.filter(_._1 < 1000))
  }

  test("event_bursts: first-day NULL baseline, integer ratio, flag consistency") {
    val rows = SparkEntry.queries("event_bursts")(spark, "/root/testdata/sf0.001")
      .as[(String, java.sql.Date, Long, Option[Long], Boolean)]
      .collect().toSeq
    assert(rows.nonEmpty)
    // exactly one NULL-baseline row per event_type: its first day
    val byType = rows.groupBy(_._1)
    byType.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2.toString)
      assert(sorted.head._4.isEmpty && sorted.tail.forall(_._4.nonEmpty))
    }
    // the burst flag is exactly ratio > 20000, never NULL-true
    rows.foreach { case (_, _, _, ratio, burst) =>
      assert(burst == ratio.exists(_ > 20000L))
    }
  }

  test("TextOps.collocations: df counts, PMI value, minDf gate") {
    // "machine learning" in 6 of 10 docs; "machine" in all 10
    val in = docs(((1 to 6).map(i => (i.toLong, "machine learning rocks")) ++
      (7 to 10).map(i => (i.toLong, "machine parts"))): _*)
    val got = TextOps.collocations(in, "id", "text", minDf = 5L)
      .as[(String, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    // PMI(machine, learning) = ln((6/10) / ((10/10)·(6/10))) = 0
    // PMI(learning, rocks)   = ln((6/10) / ((6/10)·(6/10)))  = ln(10/6)
    assert(got("machine learning")._1 == 6L)
    assert(got("machine learning")._2 == 0.0)
    assert(math.abs(got("learning rocks")._2 - math.log(10.0 / 6)) < 1e-4)
    // "machine parts" has df 4 < minDf → absent
    assert(!got.contains("machine parts"))
  }

  test("TextOps.unigramLogProb: rare tokens score below common ones") {
    // corpus: "common" appears 6 times, each "rareN" once → total 9
    // doc 1 = all common (lp = 3·ln(6/9)), doc 2 = all rare (3·ln(1/9))
    val in = docs((1L, "common common common"),
      (2L, "rare1 rare2 rare3"), (3L, "common common common"))
    val got = TextOps.unigramLogProb(in, "id", "text")
      .orderBy("id").as[(Long, Long, Double)].collect().toSeq
    val lnC = math.log(6.0 / 9.0)
    val lnR = math.log(1.0 / 9.0)
    assert(got.map(_._1) == Seq(1L, 2L, 3L) && got.forall(_._2 == 3L))
    assert(math.abs(got(0)._3 - BigDecimal(lnC).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(got(1)._3 < got(0)._3, "rare doc must score below common doc")
  }

  test("Dedup.fingerprintPairs: shared span guarantees shared fingerprints, unrelated docs none") {
    // winnowing guarantee: a shared run of ≥ w+k−1 = 6 tokens yields at
    // least one shared fingerprint; a 14-token shared span comfortably
    // clears minShared = 2
    val shared = (1 to 14).map(i => s"s$i").mkString(" ")
    val in = docs(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"one two three $shared four"),
      (3L, "p q r s t u v w x y z"))
    val got = Dedup.fingerprintPairs(in, "id", "text")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L)))
    assert(got.head._3 >= 2L)
    // the minShared gate holds
    assert(Dedup.fingerprintPairs(in, "id", "text", minShared = 1000L)
      .count() == 0)
  }

  test("Dedup.containmentPairs: subset docs flag where Jaccard misses them") {
    // d2's shingles are a strict subset of d1's (quote-inside-article):
    // containment = 1.0 while jaccard = 3/12 = 0.25 (below any dup bar)
    val article = (1 to 14).map(i => s"w$i").mkString(" ") // 12 shingles
    val quote = "w5 w6 w7 w8 w9"                           // 3, all shared
    val in = docs((1L, article), (2L, quote), (3L, "x y z q r"))
    val got = Dedup.containmentPairs(in, "id", "text", threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 1.0)))
    val jac = Dedup.ngramJaccardPairs(in, "id", "text", threshold = 0.5)
      .count()
    assert(jac == 0, "the Jaccard join must NOT see the subset pair")
  }

  test("Sampling.mixByTemperature: sqrt-flattened targets, smallest group sets scale") {
    import graft.ext.Sampling
    // groups of 16 / 4 / 1 docs: w = 4/2/1, scale = min(n/w) = min(√n)=1
    // → targets floor(1·4)=4, floor(1·2)=2, floor(1·1)=1
    val rows = (1 to 16).map(i => (i.toLong, "big")) ++
      (21 to 24).map(i => (i.toLong, "mid")) ++ Seq((31L, "tiny"))
    val in = rows.toDF("id", "grp")
    val got = Sampling.mixByTemperature(in, "grp", "id", seed = "t")
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(got == Map("big" -> 4L, "mid" -> 2L, "tiny" -> 1L))
    // flattening: raw shares 16:4:1 became 4:2:1 — tail upsampled
    // determinism: same seed → same picked ids
    val a = Sampling.mixByTemperature(in, "grp", "id", seed = "t")
      .select("id").as[Long].collect().toSeq.sorted
    val b = Sampling.mixByTemperature(in, "grp", "id", seed = "t")
      .select("id").as[Long].collect().toSeq.sorted
    assert(a == b)
  }

  test("TextOps.qualityScoreLinear: hand-computed margin, sigmoid, zero-token doc") {
    val in = docs((1L, "the the the the"), (2L, "zz"), (3L, ""))
    val got = TextOps.qualityScoreLinear(in, "id", "text")
      .orderBy("id").as[(Long, Long, Double, Boolean)].collect().toSeq
    def sig(z: Double) = BigDecimal(1.0 / (1.0 + math.exp(-z)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // d1: n=4, distinct=1, sumlen=12, h_en=4 →
    //     z = -3 + .04 + 1.5·¼ + .1·3 + 8·1 = 5.715
    val z1 = -3.0 + 1.0 * (4 / 100.0) + 1.5 * 0.25 + 0.1 * 3.0 + 8.0 * 1.0
    // d2: n=1, distinct=1, sumlen=2, h_en=0 → z = -3 + .01 + 1.5 + .2
    val z2 = -3.0 + 1.0 * (1 / 100.0) + 1.5 * 1.0 + 0.1 * 2.0 + 8.0 * 0.0
    assert(got == Seq(
      (1L, 4L, sig(z1), true),
      (2L, 1L, sig(z2), false),
      (3L, 0L, sig(-3.0), false))) // every ratio zeroes out
  }

  test("Similarity.quantizedRerankTopK: shortlist rerank recovers brute-force top-k") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = e.where(col("vec_id") % 50 === 0)
    val exact = Similarity.bruteForceTopK(e, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val reranked = Similarity.quantizedRerankTopK(e, queries, "vec_id",
        "embedding", k = 5, shortlist = 20)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(reranked.size == exact.size)
    val overlap = (exact & reranked).size.toDouble / exact.size
    assert(overlap >= 0.9,
      s"quantized rerank recall $overlap below 0.9 vs brute force")
    intercept[IllegalArgumentException] {
      Similarity.quantizedRerankTopK(e, queries, "vec_id", "embedding",
        k = 5, shortlist = 4)
    }
  }

  test("Similarity.quantizeInt8: codes, scale, error bound, zero vector, levels") {
    val in = Seq((1L, Seq(1.0f, -0.4f, 0.2f, 0.0f)), (2L, Seq(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(in, "vec_id", "embedding")
      .orderBy("vec_id")
      .as[(Long, Int, Double, Seq[Int], Double)].collect().toSeq
    val (id1, dim1, sc1, q1, mse1) = got(0)
    assert((id1, dim1, q1) == ((1L, 4, Seq(127, -51, 25, 0))))
    assert(math.abs(sc1 - 1.0 / 127) < 1e-6)
    // dequant error per element is at most (scale/2)² by construction
    assert(mse1 >= 0 && mse1 <= math.pow(sc1 / 2, 2) + 1e-12)
    assert(got(1) == ((2L, 2, 0.0, Seq(0, 0), 0.0)))
    // 3-level (ternary) codebook: codes collapse to {-1, 0, 1}
    val tern = Similarity.quantizeInt8(in, "vec_id", "embedding", levels = 1)
      .orderBy("vec_id").as[(Long, Int, Double, Seq[Int], Double)]
      .collect().toSeq
    assert(tern(0)._4 == Seq(1, 0, 0, 0) && tern(0)._3 == 1.0)
  }

  test("TextOps.bigramLogProb: hand-computed interpolation, first-token unigram") {
    // corpus: d1 = [a b a b], d2 = [a c] → unigrams a:3 b:2 c:1 (N=6)
    // bigram occurrences: (a,b)×2, (b,a)×1, (a,c)×1; contexts a:3 b:1
    val in = docs((1L, "a b a b"), (2L, "a c"))
    val got = TextOps.bigramLogProb(in, "id", "text")
      .orderBy("id").as[(Long, Long, Double)].collect().toSeq
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1 = (math.log(3.0 / 6) + 2 * math.log(0.75 * 2 / 3 + 0.25 * 2 / 6) +
      math.log(0.75 * 1 / 1 + 0.25 * 3 / 6)) / 4
    val d2 = (math.log(3.0 / 6) + math.log(0.75 * 1 / 3 + 0.25 * 1 / 6)) / 2
    assert(got == Seq((1L, 4L, r4(d1)), (2L, 2L, r4(d2))))
    // a doc with corpus-rare transitions (a a, b b) scores below the
    // corpus-typical alternation, even though unigrams are identical
    val in2 = docs((1L, "a b a b a b"), (2L, "a b a b a b"), (3L, "a a b b a b"))
    val s = TextOps.bigramLogProb(in2, "id", "text")
      .orderBy("id").as[(Long, Long, Double)].collect().toSeq
    assert(s(2)._3 < s(0)._3)
  }

  test("TextOps.ngramNovelty: df-1 share in bps, short and empty docs") {
    // d1/d2 share "x y z"; each owns its second shingle; d3 all-own
    val in = docs((1L, "x y z w"), (2L, "x y z q"), (3L, "p q r"),
      (4L, "hi"), (5L, ""))
    val got = TextOps.ngramNovelty(in, "id", "text")
      .orderBy("id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 1L, 5000L),   // "x y z" shared, "y z w" unique
      (2L, 2L, 1L, 5000L),
      (3L, 1L, 1L, 10000L),
      (4L, 1L, 1L, 10000L),  // sub-k doc → whole-text shingle
      (5L, 1L, 1L, 10000L))) // empty doc → the '' shingle, unshared
    // two identical empty docs share the '' shingle → both score 0
    val e = TextOps.ngramNovelty(docs((1L, ""), (2L, "!!")), "id", "text")
      .orderBy("id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(e.map(_._4) == Seq(0L, 0L))
  }

  test("Dedup.stripDuplicateSpans: global keep-first, within-doc repeats, empty docs") {
    // spans of 2: d1 = [a b][c d][a b] (internal repeat), d2 = [a b][x]
    val in = docs((1L, "a b c d a b"), (2L, "a b x"), (3L, ""))
    val got = Dedup.stripDuplicateSpans(in, "id", "text", spanTokens = 2)
      .orderBy("id").as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 1L, "a b c d"), // second "a b" occurrence stripped
      (2L, 2L, 1L, "x"),       // cross-doc repeat stripped, tail span kept
      (3L, 0L, 0L, "")))       // token-less doc survives as empty
    // the text-keyed window decides identically (no collisions here)
    val exact = Dedup.stripDuplicateSpans(in, "id", "text",
        spanTokens = 2, hashKey = false)
      .orderBy("id").as[(Long, Long, Long, String)].collect().toSeq
    assert(exact == got)
  }

  test("TextOps.chunk: coverage, overlap, tails, empty docs") {
    // 10 tokens, size 5, overlap 2 (stride 3): chunks at 0, 3, 6 —
    // ceil(max(10-2,1)/3) = 3; last chunk is the 4-token tail
    val in = docs((1L, (1 to 10).map(i => s"t$i").mkString(" ")),
      (2L, "a b"), (3L, ""))
    val got = TextOps.chunk(in, "id", "text", size = 5, overlap = 2)
      .orderBy("id", "chunk_id")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, "t1 t2 t3 t4 t5", 5L),
      (1L, 1L, "t4 t5 t6 t7 t8", 5L),
      (1L, 2L, "t7 t8 t9 t10", 4L),
      (2L, 0L, "a b", 2L),
      (3L, 0L, "", 0L)))
    // consecutive chunks share exactly `overlap` tokens; union covers all
    val c0 = got(0)._3.split(" ").toSeq
    val c1 = got(1)._3.split(" ").toSeq
    assert(c0.takeRight(2) == c1.take(2))
    intercept[IllegalArgumentException] {
      TextOps.chunk(in, "id", "text", size = 3, overlap = 3)
    }
  }

  test("Sampling.mixByWeight: binding constraint, md5 order, dropped groups") {
    import graft.ext.Sampling
    import org.apache.spark.sql.expressions.Window
    // a has slack (8 rows, weight .5), b binds (2 rows, weight .5):
    // scale = min(8/.5, 2/.5) = 4 → target 2 per group; c is unlisted
    val df = ((1 to 8).map(i => (i.toLong, "a")) ++
      Seq((101L, "b"), (102L, "b"), (201L, "c"))).toDF("id", "grp")
    val out = Sampling.mixByWeight(df, "grp", "id",
      Map("a" -> 0.5, "b" -> 0.5), "s1")
    val got = out.select("grp", "id", "mix_rank")
      .as[(String, Long, Long)].collect().toSeq
    assert(got.count(_._1 == "a") == 2 && got.count(_._1 == "b") == 2)
    assert(!got.exists(_._1 == "c"))
    assert(got.filter(_._1 == "a").map(_._3).sorted == Seq(1L, 2L))
    // the two-pass rank must equal the naive single-window formulation,
    // and the kept rows are exactly the rank <= target ones
    val naive = df.where($"grp".isin("a", "b"))
      .withColumn("key", md5(concat($"id".cast("string"), lit(":s1"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"grp").orderBy($"key", $"id")))
      .select($"grp", $"id", $"rk".cast("long"))
      .as[(String, Long, Long)].collect().toSeq
    assert(got.toSet == naive.filter(_._3 <= 2).toSet)
  }

  test("Sampling.mixByWeight raises when a weighted group has no rows") {
    import graft.ext.Sampling
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "grp")
    val ex = intercept[Exception] {
      Sampling.mixByWeight(df, "grp", "id",
        Map("a" -> 0.5, "b" -> 0.25, "ghost" -> 0.25), "s1").collect()
    }
    val msgs = ex.getMessage +: Option(ex.getCause).map(_.getMessage).toList
    assert(msgs.exists(m => m != null && m.contains("weighted groups present")))
  }

  test("Dedup.components: chains, triangles, and end-to-end representative keep") {
    // components: chain 1-2-3-4 (diameter 3), triangle 10-11-12, pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val comp = Dedup.components(pairs).as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comp(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(comp(_) == 10L))
    assert(Seq(20L, 21L).forall(comp(_) == 20L))

    val corpus = (Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L, 21L) ++ Seq(99L))
      .map(i => (i, s"doc$i")).toDF("id", "text")
    val kept = Dedup.dedupByPairs(corpus, pairs, "id")
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 10L, 20L, 99L)) // reps + untouched singleton
  }

  test("Dedup.bandsForThreshold: S-curve knee lands nearest the target, exact factorizations only") {
    // 128 perms: r=4 → (1/32)^(1/4) ≈ 0.420 (closest to 0.5),
    // r=8 → (1/16)^(1/8) ≈ 0.707 (closest to 0.7)
    assert(Dedup.bandsForThreshold(128, 0.5) == (32, 4))
    assert(Dedup.bandsForThreshold(128, 0.7) == (16, 8))
    // every returned pair multiplies back to numPerms
    for (n <- Seq(16, 64, 100, 128); t <- Seq(0.2, 0.5, 0.8)) {
      val (b, r) = Dedup.bandsForThreshold(n, t)
      assert(b * r == n, s"($b, $r) drops permutations of $n")
    }
    intercept[IllegalArgumentException] { Dedup.bandsForThreshold(128, 1.0) }
  }

  test("Dedup.components: pointer jumping converges a deep chain in O(log d) rounds") {
    // a 200-link chain has diameter 200 — plain min-label propagation
    // would need 200 rounds (and hit the maxRounds guard); the pointer
    // jump doubles the label's reach per round, so ~log2(200)+slack
    val chain = (1L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = Dedup.components(chain).as[(Long, Long)].collect().toMap
    assert((1L to 200L).forall(comp(_) == 1L))
    val rounds = Dedup.lastComponentsRounds.get()
    assert(rounds <= 12, s"expected O(log d) convergence, took $rounds rounds")
  }

  test("Dedup.dedupByPairsBest keeps the preferred member, not the min id") {
    val corpus = Seq((1L, "dup short", 9L), (5L, "dup long", 50L),
      (3L, "solo", 4L)).toDF("id", "text", "len")
    val pairs = Seq((1L, 5L)).toDF("id_a", "id_b")
    // min-id policy would keep 1; preference = len keeps 5; singleton 3 stays
    val got = graft.ext.Dedup.dedupByPairsBest(corpus, pairs, "id", $"len")
      .select("id").as[Long].collect().toSeq.sorted
    assert(got == Seq(3L, 5L))
  }

  // ------------------------------------------------------ similarity —

  test("Similarity.bruteForceTopK: exact ranks on a hand-computed case") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),   // closest to 0
      (2L, Array(0.0f, 1.0f)),   // orthogonal to 0
      (3L, Array(0.7f, 0.7f))    // diagonal
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs,
        vecs.where($"vec_id" === 0), "vec_id", "embedding", k = 3)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toSeq
    assert(out == Seq((1L, 1), (3L, 2), (2L, 3)))
  }

  test("Similarity.annTopK: recall >= 0.9 vs brute force on sf0.001 embeddings") {
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.where($"vec_id" % 50 === 0)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.annTopK(e, q, "vec_id", "embedding", 5,
        dim = 64, nBits = 64, bands = 32)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.9, s"ANN recall $recall too low")
  }

  test("Similarity.cosineNearDupsAnn: exact precision, high recall vs the O(n²) scan") {
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.cosineNearDups(e, "vec_id", "embedding", 0.45))
    assert(exact.nonEmpty, "corpus should contain planted embedding near-dups")
    val ann = pairs(Similarity.cosineNearDupsAnn(e, "vec_id", "embedding",
      threshold = 0.45, dim = 64, nBits = 64, bands = 16))
    // candidates are re-verified with true cosine → every ANN pair is real
    assert(ann.subsetOf(exact), "ANN near-dup pairs must be true pairs")
    val recall = ann.size.toDouble / exact.size
    assert(recall >= 0.9, s"ANN near-dup recall $recall too low")
    // the front-door API routes to ANN by default (the O(n²) scan is
    // reachable only via an explicit exact = true)
    assert(pairs(Dedup.embeddingNearDups(e, "vec_id", "embedding",
      threshold = 0.45, dim = 64)) == ann)
    assert(pairs(Dedup.embeddingNearDups(e, "vec_id", "embedding",
      threshold = 0.45, dim = 64, exact = true)) == exact)
  }

  test("Shards.packByBudget equals the single-window running-sum layout") {
    import org.apache.spark.sql.expressions.Window
    // skewed groups (90% "en") and irregular token counts; coarse buckets
    // so most buckets hold several rows and offsets genuinely compose
    val df = (0 until 300)
      .map(i => (if (i % 10 == 0) "fr" else "en", i.toLong, (i * 37 % 97 + 1).toLong))
      .toDF("lang", "id", "toks")
    val packed = graft.ext.Shards
      .packByBudget(df, Seq("lang"), "id", "toks", capacity = 100L,
        bucketExpr = floor($"id" / 7).cast("long"))
      .select("lang", "id", "shard").as[(String, Long, Long)].collect().toSet
    val w = Window.partitionBy("lang").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = df.withColumn("cum", sum($"toks").over(w))
      .withColumn("shard", floor(($"cum" - $"toks") / lit(100L)).cast("long"))
      .select("lang", "id", "shard").as[(String, Long, Long)].collect().toSet
    assert(packed == ref)

    // a NON-monotone bucketExpr must raise (it would silently corrupt
    // shard ids: (bucket, id) order is no longer the id order)
    val ex = intercept[Exception] {
      graft.ext.Shards.packByBudget(df, Seq("lang"), "id", "toks",
          capacity = 100L, bucketExpr = ($"id" % 3).cast("long"))
        .collect()
    }
    val msgs = ex.getMessage +: Option(ex.getCause).map(_.getMessage).toList
    assert(msgs.exists(m => m != null && m.contains("not monotone")))
  }

  test("Similarity.ivfTopK: exhaustive probe == brute force; pruning keeps useful recall") {
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.where($"vec_id" % 50 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)]
        .collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5))
    // 500 vecs, stride 50 → 10 centroids; probing all 10 cells == exact
    val exhaustive = pairs(Similarity.ivfTopK(e, q, "vec_id", "embedding", 5,
      centroidStride = 50, nProbe = 10))
    assert(exhaustive == exact)
    // pruned probing scores ~40% of the corpus; on isotropic random data
    // recall degrades gracefully rather than collapsing
    val pruned = Similarity.ivfTopK(e, q, "vec_id", "embedding", 5,
        centroidStride = 50, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exactIds = exact.map { case (a, b, _) => (a, b) }
    val recall = (pruned & exactIds).size.toDouble / exactIds.size
    assert(recall >= 0.4, s"IVF pruned recall $recall collapsed")
  }

  test("Similarity persisted IVF index: build-then-query == one-shot; queries read ONLY the index") {
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.where($"vec_id" % 50 === 0)
    val root = java.nio.file.Files
      .createTempDirectory("graft_simidx_spec_").toString
    Similarity.buildIvfIndex(e, "vec_id", "embedding", root,
      centroidStride = 50)
    // queries come from MEMORY so every scanned file is attributable
    val qMem = spark.createDataFrame(
      spark.sparkContext.parallelize(q.collect().toSeq), q.schema)
    val served = Similarity.indexedIvfTopK(spark, root, qMem,
      "vec_id", "embedding", 5, nProbe = 4)
    val oneShot = Similarity.ivfTopK(e, q, "vec_id", "embedding", 5,
      centroidStride = 50, nProbe = 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank", "sim")
        .as[(Long, Long, Int, Double)].collect().toSet
    assert(rows(served) == rows(oneShot),
      "the persisted index must serve the one-shot answer bit for bit")
    // the serving plan never touches the corpus parquet — its only
    // file inputs are the index tables under the index root
    val files = served.inputFiles
    assert(files.nonEmpty && files.forall(_.contains(root)),
      s"query phase must read only the index, got: ${files.take(3).mkString(", ")}")
    // the index is one TRANSACTION: both tables or neither
    import graft.ops.VersionedPartitioned
    assert(VersionedPartitioned
      .headTag(spark, s"$root/${Similarity.IvfCellsTable}")
      .exists(_.startsWith("txn:")))
  }

  test("Similarity.ivfPqTopK: exact with exhaustive knobs; PQ shortlist keeps recall") {
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.where($"vec_id" % 50 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)]
        .collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5))
    // probing every cell with a corpus-sized shortlist makes the PQ
    // approximation irrelevant: the exact rerank sees every candidate
    val exhaustive = pairs(Similarity.ivfPqTopK(e, q, "vec_id", "embedding",
      5, centroidStride = 50, nProbe = 10, m = 8, cbStride = 17,
      shortlist = 1000))
    assert(exhaustive == exact)
    // default-ish knobs: codes are 8 bytes/vector (64x compression of
    // the 64-dim doubles); the 4x-k shortlist + exact rerank keeps
    // useful recall on isotropic random data
    val pq = Similarity.ivfPqTopK(e, q, "vec_id", "embedding", 5,
        centroidStride = 50, nProbe = 6, m = 8, cbStride = 17,
        shortlist = 20)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exactIds = exact.map { case (a, b, _) => (a, b) }
    val recall = (pq & exactIds).size.toDouble / exactIds.size
    assert(recall >= 0.4, s"IVF-PQ recall $recall collapsed")
  }

  test("pq_encode/pq_decode kernels: integer argmin, lowest-index ties, exact decode") {
    import graft.functions.VectorExprs
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def arr(xs: Double*) = new GenericArrayData(xs.toArray)
    // m=2, dsub=2, ksub=2; codebook layout (j, e, t)
    val cbD = Array(/* j0 e0 */ 1.0, 0.0, /* j0 e1 */ 0.0, 1.0,
      /* j1 e0 */ 2.0, 2.0, /* j1 e1 */ -1.0, 0.0)
    val cbI = new GenericArrayData(cbD.map(VectorExprs.pqScaled))
    val codes = VectorExprs.pqEncode(arr(0.9, 0.1, -0.8, 0.1), cbI, 2, 2)
    // subspace 0: (0.9,0.1) nearer (1,0) → e0; subspace 1: (-0.8,0.1)
    // nearer (-1,0) → e1
    assert(codes.toIntArray().toSeq == Seq(0, 1))
    // tie (equidistant in scaled ints) → lowest entry index
    val tie = VectorExprs.pqEncode(arr(0.5, 0.5, 0.0, 0.0),
      new GenericArrayData(Array(1.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0)
        .map(VectorExprs.pqScaled)), 2, 2)
    assert(tie.toIntArray()(0) == 0)
    // decode = centroid + picked entries, exact doubles
    val dec = VectorExprs.pqDecode(codes,
      arr(10.0, 20.0, 30.0, 40.0), new GenericArrayData(cbD), 2)
    assert(dec.toDoubleArray().toSeq == Seq(11.0, 20.0, 29.0, 40.0))
    // malformed codebooks fail loudly, never mis-encode
    intercept[IllegalArgumentException](
      VectorExprs.pqEncode(arr(1.0, 2.0, 3.0), cbI, 2, 2))
    intercept[IllegalArgumentException](
      VectorExprs.pqDecode(codes, arr(1.0, 2.0, 3.0, 4.0),
        new GenericArrayData(cbD.take(6)), 2))
  }

  test("Similarity.withBandBuckets is deterministic, disjoint across bands, in range") {
    val vecs = Seq((0L, Array(0.3, -1.2, 2.0)), (1L, Array(-0.5, 0.5, 0.1)))
      .toDF("vec_id", "v")
    def buckets() = Similarity.withBandBuckets(vecs, "v", "b",
        nBits = 16, dim = 3, bands = 4)
      .select("b").as[Seq[Long]].collect()
    val first = buckets()
    // band b with r=4 bits packs onto seed b: bucket ∈ [b*16, (b+1)*16)
    assert(first.forall(_.length == 4))
    assert(first.forall(_.zipWithIndex.forall { case (v, b) =>
      v >= b * 16L && v < (b + 1) * 16L
    }))
    assert(first.toSeq == buckets().toSeq)
  }

  test("native expressions: null propagation and loud length mismatches") {
    graft.functions.VectorExprs.register(spark)
    graft.functions.TextExprs.register(spark)
    // nulls propagate as nulls (UnaryExpression/BinaryExpression default)
    val nullRows = Seq((1L, Option.empty[Array[Double]], Option.empty[String]))
      .toDF("id", "v", "t")
      .select(expr("vec_dot(v, v)").as("d"),
        expr("sign_band_buckets(v, 16, 3, 4)").as("b"),
        expr("token_stats(t)").as("s"),
        expr("winnow_fingerprint(t, 3, 4)").as("f"))
      .collect().head
    assert((0 until 4).forall(nullRows.isNullAt))
    // a vector that does not match the declared dim must throw, not
    // silently bucket a truncated projection
    val bad = Seq((1L, Array(1.0, 2.0))).toDF("id", "v")
      .select(expr("sign_band_buckets(v, 16, 3, 4)"))
    val e = intercept[Exception](bad.collect())
    assert(e.getMessage != null)
    val mism = Seq((Array(1.0, 2.0), Array(1.0))).toDF("a", "b")
      .select(expr("vec_dot(a, b)"))
    intercept[Exception](mism.collect())
  }

  test("token_stats native kernel ≡ Column HOF formulation") {
    val corpus = docs(
      (1L, "The cat and the dog!! 42 times."),
      (2L, ""),
      (3L, "der und das ist nicht mit"),
      (4L, "的 了 是 我 不 在"),
      (5L, (1 to 50).map(i => s"tok$i the").mkString(" ")))
    graft.functions.TextExprs.register(spark)
    val native = corpus.select($"id", expr("token_stats(text)").as("s"))
      .select($"id", $"s.n_tokens", $"s.n_distinct", $"s.sum_token_len",
        $"s.h_en", $"s.h_de", $"s.h_zh")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val viaColumns = corpus
      .withColumn("toks", TextNorm.tokens($"text"))
      .select($"id", size($"toks"), size(array_distinct($"toks")),
        coalesce(aggregate($"toks", lit(0L), (acc, t) => acc + length(t)), lit(0L)),
        TextOps.hitCount($"toks", TextOps.langProfiles.head._2),
        TextOps.hitCount($"toks", TextOps.langProfiles(1)._2),
        TextOps.hitCount($"toks", TextOps.langProfiles.last._2))
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(native == viaColumns)
  }

  test("VectorExprs.planes match their md5 definition") {
    val p = graft.functions.VectorExprs.planes(4, 3)
    def ref(j: Int, i: Int): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$j:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (hex.head < '8') 1.0 else -1.0
    }
    for (j <- 0 until 4; i <- 0 until 3) assert(p(j)(i) == ref(j, i))
  }

  // ------------------------------------------------------------ text —

  test("TextOps.stats: hand-computed counts and ratios") {
    val in = docs((1L, "The cat and the dog!! 42 times."))
    val r = TextOps.stats(in, "id", "text").head()
    // toks: the cat and the dog 42 times
    assert(r.getAs[Int]("n_tokens") == 7)
    assert(r.getAs[Int]("n_distinct_tokens") == 6)
    // bpe-ish: The cat and the dog ! ! 42 times . = 10
    assert(r.getAs[Int]("n_bpeish") == 10)
    // hits: the, and, the → 3 of 7
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 0.4286) < 1e-9)
    assert(r.getAs[String]("lang_guess") == "en")
  }

  test("TextOps.langId: priority tie-break and clear winners") {
    val in = docs(
      (1L, "der und das ist nicht mit"),      // german stopwords
      (2L, "el la de que y en un"),           // spanish
      (3L, "xyzzy plugh"))                    // no hits anywhere → first lang
    val got = in.select($"id", TextOps.langId(TextNorm.tokens($"text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "de")
    assert(got(2L) == "es")
    assert(got(3L) == "en") // all-zero tie resolves to highest priority
  }

  test("TextOps.fingerprint: winnowing overlaps on shared content, stable under edit") {
    val a = (1 to 40).map(i => s"w$i").mkString(" ")
    val edited = ((1 to 20).map(i => s"w$i") ++ Seq("EDIT") ++
      (21 to 40).map(i => s"w$i")).mkString(" ")
    val unrelated = (100 to 140).map(i => s"v$i").mkString(" ")
    val fp = TextOps.fingerprints(docs((1L, a), (2L, edited), (3L, unrelated)),
        "id", "text")
      .as[(Long, Seq[String])].collect().toMap
    val overlapEdit = (fp(1L).toSet & fp(2L).toSet).size.toDouble / fp(1L).size
    val overlapNone = (fp(1L).toSet & fp(3L).toSet).size
    assert(overlapEdit > 0.5, s"edited doc should share most fingerprints: $overlapEdit")
    assert(overlapNone == 0)
    assert(fp(1L) == fp(1L).sorted && fp(1L).distinct == fp(1L))
  }

  test("winnow_fingerprint native kernel ≡ Column HOF formulation") {
    val corpus = docs(
      (1L, "The cat and the dog!! 42 times over the lazy dog."),
      (2L, "short"),
      (3L, ""),
      (4L, (1 to 60).map(i => s"tok$i word$i").mkString(" ")),
      (5L, "a b a b a b a b a b"))
    val native = TextOps.fingerprints(corpus, "id", "text")
      .as[(Long, Seq[String])].collect().toMap
    val viaColumns = corpus.select($"id",
        TextOps.fingerprint(TextNorm.tokens($"text"), 3, 4).as("fp"))
      .as[(Long, Seq[String])].collect().toMap
    assert(native == viaColumns)
  }

  test("AsOf.join: latest-at-or-before match, tie inclusivity, tolerance, no-match nulls") {
    import graft.ops.AsOf
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")
    val left = Seq(
      (1L, t("09:00:00"), 100L),  // before any right row → null
      (1L, t("10:00:00"), 101L),  // exactly at right ts → inclusive match
      (1L, t("10:59:00"), 102L),  // latest right row <= 10:59 is 10:00
      (1L, t("13:30:00"), 103L),  // after 11:00 right row
      (2L, t("10:30:00"), 200L))  // other key: its own right stream
      .toDF("k", "ts", "lid")
    val right = Seq(
      (1L, t("10:00:00"), "a"), (1L, t("11:00:00"), "b"),
      (2L, t("10:15:00"), "z"))
      .toDF("k", "ts", "tag")
    val out = AsOf.join(left, right, Seq("k"), "ts", "ts", Seq("tag"))
      .select("lid", "ref_tag").as[(Long, Option[String])]
      .collect().toMap
    assert(out == Map(100L -> None, 101L -> Some("a"), 102L -> Some("a"),
      103L -> Some("b"), 200L -> Some("z")))
    // tolerance: 103's match (11:00) is 2.5h stale → nulled at 1h bound
    val bounded = AsOf.join(left, right, Seq("k"), "ts", "ts", Seq("tag"),
        toleranceMs = Some(3600 * 1000L))
      .select("lid", "ref_tag").as[(Long, Option[String])]
      .collect().toMap
    assert(bounded(103L).isEmpty && bounded(102L) == Some("a"))

    // a NULL payload field in the matched right row must stay null —
    // not be spliced from an older right row's non-null value
    val rightNulls = Seq((1L, t("10:00:00"), Some("a"), Some(5.0)),
      (1L, t("11:00:00"), Some("b"), None))
      .toDF("k", "ts", "tag", "v")
    val spliced = AsOf.join(left.where($"lid" === 103), rightNulls,
        Seq("k"), "ts", "ts", Seq("tag", "v"))
      .select("ref_tag", "ref_v").as[(Option[String], Option[Double])].head()
    assert(spliced == ((Some("b"), None)))
  }

  test("RangeJoin.pointInInterval equals the brute-force theta join") {
    import graft.ops.RangeJoin
    val points = (1 to 500).map(i => (i % 5L, i * 7.0 % 331)).toDF("k", "x")
    val intervals = Seq((0L, 10.0, 50.0), (0L, 45.0, 47.0), (1L, 300.0, 600.0),
      (2L, -20.0, 5.0), (3L, 100.0, 100.0), (4L, 0.0, 330.0))
      .toDF("k", "lo", "hi")
    for (width <- Seq(1L, 13L, 1000L)) { // narrow, medium, one-bucket-fits-all
      val got = RangeJoin.pointInInterval(points, intervals, Seq("k"),
          "x", "lo", "hi", width)
        .select("k", "x", "lo", "hi").collect().toSeq
        .map(_.toSeq).sortBy(_.toString)
      val brute = points.join(intervals, "k")
        .where($"x".between($"lo", $"hi"))
        .select("k", "x", "lo", "hi").collect().toSeq
        .map(_.toSeq).sortBy(_.toString)
      assert(got == brute, s"width=$width")
    }
  }

  test("Skew.saltedJoin equals the plain join and spreads the hot key") {
    import graft.ops.Skew
    // 90% of the big side hammers one key
    val big = (1 to 5000).map(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "HOT", i.toLong, i * 1.5))
      .toDF("key", "row_id", "v")
    val small = (Seq("HOT") ++ (0 until 7).map(i => s"k$i")).zipWithIndex
      .map { case (k, i) => (k, s"dim$i") }.toDF("key", "dim")
    val plain = big.join(small, "key")
      .select("key", "row_id", "v", "dim").orderBy("row_id")
    val salted = Skew.saltedJoin(big, small, "key",
        bigIdCols = Seq("row_id"), parts = 8)
      .select("key", "row_id", "v", "dim").orderBy("row_id")
    assert(salted.collect().toSeq == plain.collect().toSeq)
    // the hot key really lands on multiple salts
    val salts = big.where($"key" === "HOT")
      .select(pmod(xxhash64($"row_id"), lit(8L)).as("s"))
      .distinct().count()
    assert(salts == 8)
  }

  test("tfidf top terms rank distinguishing tokens above shared ones") {
    // "common" appears in all 3 docs (idf = ln(1) = 0); each doc's unique
    // token must outrank it
    val corpus = docs(
      (1L, "common alpha alpha"),
      (2L, "common beta"),
      (3L, "common gamma gamma gamma"))
    graft.functions.TextExprs.register(spark)
    val posted = corpus.select($"id".as("doc_id"),
      explode(expr("norm_tokens(text)")).as("tok"))
    val tf = posted.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val total = corpus.agg(count(lit(1)).as("n_total"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("tok"))
    val top = tf.join(dfreq, "tok").crossJoin(broadcast(total))
      .withColumn("score", $"tf" * log($"n_total".cast("double") / $"df"))
      .withColumn("rank", row_number().over(w))
      .where($"rank" === 1)
      .select("doc_id", "tok").as[(Long, String)].collect().toMap
    assert(top == Map(1L -> "alpha", 2L -> "beta", 3L -> "gamma"))
  }

  test("Bucketing.coLocatedJoin is exchange-free and equals the plain join") {
    import graft.ops.Bucketing
    val tmp = java.nio.file.Files.createTempDirectory("graft_bspec_")
    val a = (1 to 500).map(i => (i.toLong % 40, i.toLong)).toDF("k", "va")
    val b = (1 to 80).map(i => (i.toLong % 40, s"d$i")).toDF("j", "vb")
    Bucketing.writeBucketed(a, "bspec_a", s"$tmp/a", "k", buckets = 4)
    Bucketing.writeBucketed(b, "bspec_b", s"$tmp/b", "j", buckets = 4)
    val joined = Bucketing.coLocatedJoin(spark, "bspec_a", "bspec_b", "k", "j")
    // the bucketed scans satisfy the join's distribution: no shuffle AND
    // no broadcast — the plan is a bucketed sort-merge join
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("Bucketed: true"), plan)
    val plain = a.join(b, $"k" === $"j")
      .select("k", "va", "vb").collect().toSeq.map(_.toSeq).sortBy(_.toString)
    val got = joined
      .select("k", "va", "vb").collect().toSeq.map(_.toSeq).sortBy(_.toString)
    assert(got == plain)
  }

  // ---------------------------------------------------------- sessions —

  test("Sessions: gap boundaries, per-session stats, key isolation") {
    import graft.ops.Sessions
    def t(m: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $m:00")
    val in = Seq(
      (1L, t("10:00"), 1L, 10.0), (1L, t("10:10"), 2L, 20.0), // session 0
      (1L, t("11:10"), 3L, 5.0),                              // gap 60m → session 1
      (2L, t("10:00"), 4L, 7.0))                              // other key
      .toDF("user_id", "ts", "event_id", "value")
    val out = Sessions.stats(in, Seq("user_id"), "ts", "value",
        gapSeconds = 1800, orderCols = Seq("ts", "event_id"))
      .orderBy("user_id", "session_id")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 2L, 600000L, 30.0), // 2 events spanning 10 minutes
      (1L, 1L, 1L, 0L, 5.0),
      (2L, 0L, 1L, 0L, 7.0)))
  }

  // ------------------------------------------------------ multimodal —

  test("Multimodal.BmpCodec: round trip with row padding, top-down variant, junk rejected") {
    import Multimodal.BmpCodec
    // width 3 forces 3 pad bytes per row; the asymmetric pattern makes
    // any flip / channel-order / padding slip visible
    val rgb = Array(0xFF0000, 0x00FF00, 0x0000FF,
      0x102030, 0x405060, 0x708090)
    val bytes = BmpCodec.encode(3, 2, rgb)
    val (w, h, dec) = BmpCodec.decode(bytes)
    assert((w, h) == ((3, 2)) && dec.toSeq == rgb.toSeq)
    // patching the height to -2 flags the SAME stored rows as top-down,
    // so the decoded image must come back vertically flipped
    val b2 = bytes.clone()
    java.nio.ByteBuffer.wrap(b2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(22, -2)
    val (_, h2, dec2) = BmpCodec.decode(b2)
    assert(h2 == 2 &&
      dec2.toSeq == (rgb.slice(3, 6) ++ rgb.slice(0, 3)).toSeq)
    intercept[Exception](BmpCodec.decode("not a bitmap".getBytes("UTF-8")))
    intercept[Exception](BmpCodec.encode(2, 2, Array(1, 2, 3)))
  }

  test("Multimodal.QoiCodec: every chunk op round-trips; streams compress; junk rejected") {
    import Multimodal.QoiCodec
    // a pixel stream engineered to hit every op: RUN (repeats), INDEX
    // (red recurs after other colors), DIFF (+1 steps), LUMA (+16 on all
    // channels), RGB (large jumps)
    val rgb = Array(
      0xFF0000, 0xFF0000, 0xFF0000,             // run of the first pixel
      0x00FF00,                                 // RGB jump
      0x01FF01,                                 // DIFF (+1, 0, +1)
      0x11FF11 + 0x001000,                      // LUMA-range step
      0xFF0000,                                 // INDEX (red seen before)
      0x000000, 0x000000)                       // black = zero-init slot
    val bytes = QoiCodec.encode(3, 3, rgb)
    val (w, h, dec) = QoiCodec.decode(bytes)
    assert((w, h) == ((3, 3)) && dec.toSeq == rgb.toSeq)
    // compression is real: a 64-px constant image is header + 2 run
    // chunks + end marker, far below the 3-byte/px raw size
    val flat = Array.fill(64)(0x123456)
    val fb = QoiCodec.encode(8, 8, flat)
    assert(fb.length < 14 + 64 * 3 + 8 && fb.length <= 14 + 4 + 2 + 8)
    assert(QoiCodec.decode(fb)._3.toSeq == flat.toSeq)
    // a >62-px run must split into two run chunks per the spec cap
    val long = Array.fill(100)(0xABCDEF)
    assert(QoiCodec.decode(QoiCodec.encode(10, 10, long))._3.toSeq == long.toSeq)
    // random-ish content (no two equal neighbors) still round-trips
    val noisy = Array.tabulate(48)(i => ((i * 2654435761L) & 0xFFFFFF).toInt)
    assert(QoiCodec.decode(QoiCodec.encode(6, 8, noisy))._3.toSeq == noisy.toSeq)
    intercept[Exception](QoiCodec.decode("not a qoi file at all".getBytes("UTF-8")))
    intercept[Exception](QoiCodec.encode(2, 2, Array(1)))
    // truncating the chunk stream is an error, not garbage pixels
    intercept[Exception](QoiCodec.decode(bytes.dropRight(12)))
  }

  test("Multimodal.TiffCodec: IFD walk, inline vs offset values, multi-strip reassembly") {
    import Multimodal.TiffCodec
    // 4x5 → 3 strips (RowsPerStrip=2, last strip short): StripOffsets
    // and StripByteCounts go OUT-OF-LINE (3 LONGs > 4 bytes)
    val tall = Array.tabulate(20)(i => ((i * 2654435761L) & 0xFFFFFF).toInt)
    val (w1, h1, d1) = TiffCodec.decode(TiffCodec.encode(4, 5, tall))
    assert((w1, h1) == ((4, 5)) && d1.toSeq == tall.toSeq)
    // 3x2 → ONE strip: the strip tables ride INLINE in the IFD entry —
    // the other half of the value-or-offset rule
    val flat = Array.tabulate(6)(i => 0x010203 * (i + 1))
    val (w2, h2, d2) = TiffCodec.decode(TiffCodec.encode(3, 2, flat))
    assert((w2, h2) == ((3, 2)) && d2.toSeq == flat.toSeq)
    // 1x1 exercises both minimal dims and inline byte counts
    assert(TiffCodec.decode(TiffCodec.encode(1, 1, Array(0xABCDEF)))
      ._3.toSeq == Seq(0xABCDEF))
    // strip order is load-bearing: swapping two strips must relocate
    // rows (the multi-strip reader really uses the offset table)
    val enc = TiffCodec.encode(4, 4, Array.tabulate(16)(i => i * 0x111111 & 0xFFFFFF))
    intercept[Exception](TiffCodec.decode("II not a tiff".getBytes("UTF-8")))
    intercept[Exception](TiffCodec.decode(enc.take(8))) // header only
    intercept[Exception](TiffCodec.encode(2, 2, Array(1)))
  }

  test("Multimodal.GifCodec: LZW width growth + table reset, interlace, delta frames, disposal, transparency") {
    import Multimodal.{GifCodec, GifFrame}
    // LZW unit: a high-entropy 256-color index stream long enough to
    // grow the code width to 12 bits AND overflow the 4096-entry table,
    // forcing a mid-stream CLEAR + re-grow — then an exact round trip
    val big = Array.tabulate(9000)(i => ((i * 2654435761L) >>> 7).toInt & 0xff)
    assert(GifCodec.lzwDecompress(GifCodec.lzwCompress(big, 8), 8,
      big.length).toSeq == big.toSeq)
    // and the tiny-palette path (minCodeSize floor of 2)
    val bits = Array.tabulate(50)(i => i % 2)
    assert(GifCodec.lzwDecompress(GifCodec.lzwCompress(bits, 2), 2,
      bits.length).toSeq == bits.toSeq)

    // single full frame, interlaced: canvas round-trips exactly
    val px = Array.tabulate(32)(i => (i * 0x030507) & 0xffffff)
    val one = GifCodec.decode(GifCodec.encode(8, 4,
      Seq(GifFrame(0, 0, 8, 4, px)), interlaced = true))
    assert(one._1 == 8 && one._2 == 4 && one._3.length == 1 &&
      one._3(0).toSeq == px.toSeq)

    // animation semantics: frame 0 full red canvas (disposal 2),
    // frame 1 a 2×1 delta at (1,1) with one HOLE pixel.
    // After frame 1: frame 0's rect was restored to background first —
    // background is BLACK because red!=0 so the smallest unused color
    // (allocated for the hole) is 0x000000 at palette slot 0.
    val anim = GifCodec.encode(4, 2, Seq(
      GifFrame(0, 0, 4, 2, Array.fill(8)(0xFF0000), disposal = 2),
      GifFrame(1, 1, 2, 1, Array(GifCodec.Hole, 0x00FF00))))
    val (_, _, frames) = GifCodec.decode(anim)
    assert(frames.length == 2)
    assert(frames(0).toSeq == Seq.fill(8)(0xFF0000))
    val expect1 = Array.fill(8)(0)                  // restored to bg
    expect1(1 * 4 + 1) = 0                          // hole: bg shows through
    expect1(1 * 4 + 2) = 0x00FF00
    assert(frames(1).toSeq == expect1.toSeq)

    // disposal 1 leaves the canvas: hole now shows the PRIOR pixel
    val anim2 = GifCodec.encode(4, 2, Seq(
      GifFrame(0, 0, 4, 2, Array.fill(8)(0xFF0000), disposal = 1),
      GifFrame(1, 1, 2, 1, Array(GifCodec.Hole, 0x00FF00))))
    val f2 = GifCodec.decode(anim2)._3
    assert(f2(1)(1 * 4 + 1) == 0xFF0000 && f2(1)(1 * 4 + 2) == 0x00FF00)

    intercept[Exception](GifCodec.decode("not a gif".getBytes("UTF-8")))
    intercept[Exception](GifCodec.encode(2, 2, Seq(
      GifFrame(0, 0, 3, 3, Array.fill(9)(1)))))     // rect outside screen
    intercept[Exception](GifCodec.decode(anim.dropRight(6)))
  }

  test("Multimodal.PngCodec: RGB and greyscale round-trip through all five filters; CRC and truncation rejected") {
    import Multimodal.PngCodec
    // 5 rows → the encoder's row % 5 cycle emits None/Sub/Up/Average/
    // Paeth in one stream; noisy content so every filter does real work
    val rgb = Array.tabulate(40)(i => ((i * 2654435761L) & 0xFFFFFF).toInt)
    val bytes = PngCodec.encode(8, 5, rgb)
    val (w, h, dec) = PngCodec.decode(bytes)
    assert((w, h) == ((8, 5)) && dec.toSeq == rgb.toSeq)
    // greyscale mode: 1 byte/px on disk, replicated channels decoded
    val gray = Array.tabulate(30)(i => (i * 37) % 256)
    val gb = PngCodec.encode(6, 5, gray, gray = true)
    val (gw, gh, gdec) = PngCodec.decode(gb)
    assert((gw, gh) == ((6, 5)))
    assert(gdec.toSeq == gray.map(g => (g << 16) | (g << 8) | g).toSeq)
    // DEFLATE is real: a constant image compresses far below raw size
    val flat = Array.fill(32 * 32)(0x336699)
    assert(PngCodec.encode(32, 32, flat).length < 32 * 32 * 3 / 4)
    assert(PngCodec.decode(PngCodec.encode(32, 32, flat))._3.toSeq
      == flat.toSeq)
    // corruption is an error, never garbage pixels: flipped IDAT byte
    // fails the chunk CRC; truncation fails the length walk
    val corrupt = bytes.clone()
    corrupt(bytes.length - 20) = (corrupt(bytes.length - 20) ^ 0x1).toByte
    intercept[Exception](PngCodec.decode(corrupt))
    intercept[Exception](PngCodec.decode(bytes.dropRight(8)))
    intercept[Exception](PngCodec.decode("not a png".getBytes("UTF-8")))
    intercept[Exception](PngCodec.encode(2, 2, Array(1)))
  }

  test("Multimodal.PgmCodec: real byte round trip, comment-tolerant header, corruption rejected") {
    import Multimodal.PgmCodec
    val px = (0 until 12).map(i => (i * 21) % 256).toArray
    val bytes = PgmCodec.encode(4, 3, 255, px)
    val (w, h, mv, dec) = PgmCodec.decode(bytes)
    assert((w, h, mv) == (4, 3, 255) && dec.sameElements(px))
    // values > 127 survive the byte sign round trip
    val hot = Array.fill(4)(250)
    assert(PgmCodec.decode(PgmCodec.encode(2, 2, 255, hot))._4.sameElements(hot))
    // netpbm comment lines in the header are skipped
    val commented = ("P5\n# a comment\n2 2\n# another\n255\n").getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4)
    assert(PgmCodec.decode(commented)._4.sameElements(Array(1, 2, 3, 4)))
    // wrong magic and truncated raster are errors, not garbage stats
    intercept[IllegalArgumentException] {
      PgmCodec.decode("P6\n1 1\n255\nx".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      PgmCodec.decode(bytes.dropRight(2))
    }
  }

  test("Multimodal.WavCodec: PCM16 round trip, chunk walking, corruption rejected") {
    import Multimodal.WavCodec
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345)
    val bytes = WavCodec.encode(16000, samples)
    assert(bytes.length == 44 + samples.length * 2)
    val (rate, dec) = WavCodec.decode(bytes)
    assert(rate == 16000 && dec.sameElements(samples))
    // an unknown chunk between fmt and data is walked over per spec
    val withList = bytes.take(36) ++
      "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++
      "INFO".getBytes("US-ASCII") ++ bytes.drop(36)
    assert(WavCodec.decode(withList)._2.sameElements(samples))
    // stereo/float/truncated inputs are errors, not silent garbage
    intercept[IllegalArgumentException] {
      val stereo = bytes.clone(); stereo(22) = 2; WavCodec.decode(stereo)
    }
    intercept[IllegalArgumentException] {
      WavCodec.decode(bytes.dropRight(3))
    }
  }

  test("Multimodal: stub decode is deterministic with correct batch shape") {
    import Multimodal._
    val rows = Seq(
      MediaRow(1L, "image", Array[Byte](1, 2, 3), MediaMeta(800, 600, 0, 0, "image/png")),
      MediaRow(2L, "audio", Array[Byte](9, 9), MediaMeta(0, 0, 44100, 0, "audio/wav")),
      MediaRow(3L, "video", Array[Byte](7), MediaMeta(1920, 1080, 0, 300, "video/mp4")))
    val ds = spark.createDataset(rows).repartition(2)
    val feats = decodeFeatures(ds, dim = 8).collect().sortBy(_.media_id)
    assert(feats.map(_.byte_len).toSeq == Seq(3L, 2L, 1L))
    assert(feats.forall(_.features.length == 8))
    assert(feats.forall(_.features.forall(x => x >= 0.0 && x < 1.0)))
    val again = decodeFeatures(ds, dim = 8).collect().sortBy(_.media_id)
    assert(feats.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
  }

  test("Multimodal: resize plan preserves aspect, frame sampling strides") {
    import Multimodal._
    val df = spark.createDataset(Seq(
      MediaRow(1L, "image", Array[Byte](1), MediaMeta(4000, 2000, 0, 0, "i")),
      MediaRow(2L, "video", Array[Byte](2), MediaMeta(100, 50, 0, 10, "v")))).toDF()
    val rs = resizePlan(df, maxSide = 1000)
      .select("media_id", "target_width", "target_height")
      .as[(Long, Int, Int)].collect().map { case (k, w, h) => k -> (w, h) }.toMap
    assert(rs(1L) == (1000, 500))   // downscale to box
    assert(rs(2L) == (100, 50))     // never upscale
    val fs = frameSamplePlan(df, stride = 3)
      .where($"media_id" === 2).select("sample_frames")
      .as[Seq[Int]].head()
    assert(fs == Seq(0, 3, 6, 9))
  }

  test("Multimodal.binarize + binaryFeatures roundtrip byte length") {
    val in = docs((1L, "hej"), (2L, "åäö"))
    val out = Multimodal.binaryFeatures(
        Multimodal.binarize(in, "id", "text"), "id")
      .select("id", "byte_len").as[(Long, Int)].collect().toMap
    assert(out(1L) == 3)
    assert(out(2L) == 6) // non-ASCII: UTF-8 is 2 bytes per char
  }

  // --------------------------------------- markup / blocklist / NFKC —

  test("stripHtml drops tags+script contents, decodes entities, is plain-text identity") {
    val html = "<html><head><style>p { color: red }</style></head>\n" +
      "<body><script>if (a < 1) { b(); }</script><!-- x -->\n" +
      "<h1>Head</h1>\n<p>one &amp; two &lt;three&gt;&nbsp;four</p></body></html>"
    val got = TextOps.htmlStrip(docs((1L, html)), "id", "text")
      .select("text").head().getString(0)
    assert(got == "Head\none & two <three> four")
    // script/style CONTENTS (braces included) never reach the output
    assert(!got.contains("{") && !got.contains("color"))
    // plain text with single spaces and newlines passes through intact
    val plain = "alpha beta gamma\ndelta epsilon."
    val id = TextOps.htmlStrip(docs((2L, plain)), "id", "text")
      .select("text").head().getString(0)
    assert(id == plain)
    // the corpus curateCorpus strips is plain: identity there too
    val d = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    assert(d.where(graft.ext.TextOps.stripHtml(col("text")) =!= col("text"))
      .count() == 0)
  }

  test("blocklistFilter: any-hit drops, counts exact, miss keeps") {
    val in = docs((1L, "good clean text here"),
      (2L, "some Slow slow text"), (3L, "spam"), (4L, ""))
    val rows = TextOps.blocklistFilter(in, "id", "text", Seq("slow", "spam"))
      .select("id", "n_bad", "n_bad_distinct", "kept")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rows(1L) == ((0L, 0L, 1L)))
    assert(rows(2L) == ((2L, 1L, 0L))) // case-insensitive, 2 hits 1 word
    assert(rows(3L) == ((1L, 1L, 0L)))
    assert(rows(4L) == ((0L, 0L, 1L)))
  }

  test("nfkc kernel: compatibility forms, idempotence, corpus identity") {
    graft.functions.TextExprs.register(spark)
    val cases = Seq(
      "Café" -> "Café",             // canonical composition
      "ＡＢＣ" -> "ABC",           // fullwidth
      "ﬁle" -> "file",                    // ligature
      "①②" -> "12",                  // circled digits
      "ｶﾞ" -> "ガ",              // halfwidth katakana + mark
      "x²" -> "x2",                       // superscript
      "½" -> "1⁄2",                  // vulgar fraction
      "ascii" -> "ascii")
    val got = cases.map(_._1).zipWithIndex.map { case (s, i) =>
      (i.toLong, s) }.toDF("id", "raw")
      .select(col("id"), expr("nfkc(raw)").as("n"))
      .orderBy("id").as[(Long, String)].collect().map(_._2).toSeq
    assert(got == cases.map(_._2))
    // idempotent: nfkc(nfkc(x)) == nfkc(x)
    val twice = cases.map(_._1).zipWithIndex.map { case (s, i) =>
      (i.toLong, s) }.toDF("id", "raw")
      .where(expr("nfkc(nfkc(raw))") =!= expr("nfkc(raw)")).count()
    assert(twice == 0)
    // the synthetic corpus is ASCII: nfkc is identity there — the pin
    // that licenses curate_corpus's oracle to skip the NFKC replay
    // (DuckDB cannot compute compatibility forms)
    val d = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    assert(d.where(expr("nfkc(text)") =!= col("text")).count() == 0)
  }

  // ------------------------------------------------------------ warc —

  test("Warc: streams gzip members and plain files, HTTP-splits, fails loudly on malformed input") {
    import java.nio.charset.StandardCharsets.UTF_8
    import graft.ext.Warc
    val tmp = java.nio.file.Files.createTempDirectory("graft_warcspec_")
    val dir = tmp.toString
    Warc.writeFixture(s"$dir/a.warc.gz", Iterator(
      ("response", "https://x/1", "application/http; msgtype=response",
        ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
          "<html>hello</html>").getBytes(UTF_8)),
      ("warcinfo", "", "application/warc-fields",
        "robots: classic\r\n".getBytes(UTF_8)),
      ("conversion", "https://x/2", "text/plain",
        "plain text".getBytes(UTF_8))), gzip = true)
    Warc.writeFixture(s"$dir/b.warc", Iterator(
      ("response", "https://x/3", "application/http; msgtype=response",
        "HTTP/1.1 404 Not Found\r\n\r\nmissing".getBytes(UTF_8))),
      gzip = false)
    val recs = Warc.records(spark, dir)
    assert(recs.count() == 4)
    // record ids are deterministic (URI-derived), lengths exact
    val byUri = recs.collect()
      .map(r => r.getAs[String]("target_uri") -> r).toMap
    assert(byUri("https://x/1").getAs[Long]("content_length") ==
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        "<html>hello</html>").getBytes(UTF_8).length)
    assert(byUri("https://x/1").getAs[String]("record_id").nonEmpty)
    // HTTP split: response bodies lose their HTTP headers; WET
    // conversion records pass through whole
    val html = Warc.htmlResponses(recs).orderBy("target_uri")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(html == Seq("https://x/1" -> "<html>hello</html>",
      "https://x/3" -> "missing"))
    assert(Warc.wetTexts(recs).collect().map(_.getString(1)).toSeq ==
      Seq("plain text"))

    def rootMsg(e: Throwable): String = {
      var t = e
      while (t.getCause != null) t = t.getCause
      Option(t.getMessage).getOrElse("")
    }
    // a truncated record errors loudly with file + record index
    val dir2 = java.nio.file.Files.createTempDirectory("graft_warctrunc_")
    val whole = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/b.warc"))
    java.nio.file.Files.write(dir2.resolve("c.warc"),
      whole.dropRight(10))
    val e1 = intercept[Exception](
      Warc.records(spark, dir2.toString).collect())
    assert(rootMsg(e1).contains("truncated") &&
      rootMsg(e1).contains("c.warc"), rootMsg(e1))
    // a garbage version line errors loudly too
    val dir3 = java.nio.file.Files.createTempDirectory("graft_warcbad_")
    java.nio.file.Files.write(dir3.resolve("d.warc"),
      "GARBAGE/9.9\r\nWARC-Type: response\r\n\r\n".getBytes(UTF_8))
    val e2 = intercept[Exception](
      Warc.records(spark, dir3.toString).collect())
    assert(rootMsg(e2).contains("version line"), rootMsg(e2))
  }

  test("JpegCodec: constant-MCU images round-trip exactly at q100; lossy path bounded; malformed loud") {
    import Multimodal.JpegCodec
    // the reference YCbCr round trip (the ONLY pixel math on the
    // exact path) — same expression shapes as the codec and the
    // dedup/image oracles
    def clamp(v: Long): Int =
      if (v < 0) 0 else if (v > 255) 255 else v.toInt
    // the codec's scaled-integer color transform (exact, tie-free
    // across engines — same formulas as the image_jpeg_* oracles)
    def roundTrip(p: Int): Int = {
      val (r, g, b) = ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
      val y = clamp((299L * r + 587L * g + 114L * b + 500L) / 1000L)
      val cb = clamp(128L + (-168735892L * r - 331264108L * g +
        500000000L * b + 500000000L) / 1000000000L)
      val cr = clamp(128L + (500000000L * r - 418687589L * g -
        81312411L * b + 500000000L) / 1000000000L)
      val r2 = clamp(y + (1402L * (cr - 128) + 500L) / 1000L)
      val g2 = clamp(y + (-344136L * (cb - 128) -
        714136L * (cr - 128) + 500000L) / 1000000L)
      val b2 = clamp(y + (1772L * (cb - 128) + 500L) / 1000L)
      (r2 << 16) | (g2 << 8) | b2
    }
    // 64×24 (bottom MCU row partial → edge padding), 4×2 color grid of
    // 16×16 regions → every 4:2:0 MCU is constant → exact at q100
    val colors = Array(0xc86432, 0x0afa82, 0x102030, 0xfefdfc,
      0x804020, 0x33cc99, 0x5a5a5a, 0xff0004)
    def grid(x: Int, y: Int): Int = colors((y / 16) * 4 + (x / 16))
    val img = Array.tabulate(64 * 24)(i => grid(i % 64, i / 64))
    val (w, h, dec) = JpegCodec.decode(
      JpegCodec.encode(64, 24, img, quality = 100, chroma420 = true))
    assert(w == 64 && h == 24)
    val expected = img.map(roundTrip)
    assert(dec.sameElements(expected),
      s"4:2:0 q100 constant-MCU decode diverged at index " +
        s"${dec.zip(expected).indexWhere(t => t._1 != t._2)}")
    // 4:4:4 (8×8 blocks): 16×8 two-block image, also exact
    val img2 = Array.tabulate(16 * 8)(i =>
      if (i % 16 < 8) colors(0) else colors(1))
    val (_, _, dec2) = JpegCodec.decode(
      JpegCodec.encode(16, 8, img2, quality = 100, chroma420 = false))
    assert(dec2.sameElements(img2.map(roundTrip)))
    // grayscale: luma-only stream replicates into all channels
    val (_, _, dec3) = JpegCodec.decode(
      JpegCodec.encode(16, 8, img2, quality = 100, gray = true))
    val lumas = img2.map { p =>
      val l = clamp((299L * ((p >> 16) & 0xff) +
        587L * ((p >> 8) & 0xff) + 114L * (p & 0xff) + 500L) / 1000L)
      (l << 16) | (l << 8) | l
    }
    assert(dec3.sameElements(lumas))

    // LOSSY path: a gradient at quality 50 is deterministic and close
    val grad = Array.tabulate(32 * 32) { i =>
      val (x, y) = (i % 32, i / 32)
      ((x * 8) << 16) | ((y * 8) << 8) | ((x * 4 + y * 4) & 0xff)
    }
    val bytes1 = JpegCodec.encode(32, 32, grad, quality = 50)
    val bytes2 = JpegCodec.encode(32, 32, grad, quality = 50)
    assert(java.util.Arrays.equals(bytes1, bytes2), "encode must be deterministic")
    val (_, _, lossy) = JpegCodec.decode(bytes1)
    val maxErr = grad.zip(lossy).map { case (a, b) =>
      Seq(16, 8, 0).map(s => math.abs(((a >> s) & 0xff) - ((b >> s) & 0xff))).max
    }.max
    assert(maxErr <= 40, s"q50 per-channel error $maxErr out of bounds")

    // restart intervals (DRI + RST0-7, ubiquitous in crawl JPEGs):
    // identical decoded pixels, predictor resets at each marker
    val bytesR = JpegCodec.encode(32, 32, grad, quality = 50,
      restartInterval = 2)
    val (_, _, lossyR) = JpegCodec.decode(bytesR)
    assert(lossyR.sameElements(lossy),
      "restart markers must not change decoded pixels")

    // malformed input fails LOUDLY with a reason
    def msg(bs: Array[Byte]): String =
      intercept[IllegalArgumentException](JpegCodec.decode(bs)).getMessage
    assert(msg(Array(0, 1, 2, 3).map(_.toByte)).contains("SOI"))
    assert(msg(Array(0xff, 0xd8, 0xff, 0xc9).map(_.toByte))
      .contains("arithmetic"))
    assert(msg(Array(0xff, 0xd8, 0xff, 0xc1).map(_.toByte))
      .contains("SOF"))
    // a DRI that disagrees with the marker cadence is caught, not
    // silently resynced into garbage
    val driAt = bytesR.indexOfSlice(
      Seq(0xff.toByte, 0xdd.toByte, 0.toByte, 4.toByte))
    assert(driAt > 0)
    val tampered = bytesR.clone()
    tampered(driAt + 5) = 3
    assert(msg(tampered).contains("cadence") ||
      msg(tampered).contains("RST"), msg(tampered))
    assert(msg(bytes1.dropRight(12)).contains("truncated"))
  }

  test("JpegCodec progressive (SOF2): successive approximation decodes to the baseline pixels") {
    import Multimodal.JpegCodec
    // the strong pin: progressive and baseline encode the SAME
    // quantized coefficients, so after all scans the decoded pixels
    // must be IDENTICAL — any lost or misordered bit in the DC/AC
    // first/refinement scans (EOB runs, ZRL-with-correction-bits,
    // newly-nonzero placement) breaks full-array equality
    val grad = Array.tabulate(32 * 32) { i =>
      val (x, y) = (i % 32, i / 32)
      ((x * 8) << 16) | ((y * 8) << 8) | ((x * 4 + y * 4) & 0xff)
    }
    for ((c420, q) <- Seq((true, 50), (false, 50), (true, 100))) {
      val base = JpegCodec.decode(
        JpegCodec.encode(32, 32, grad, quality = q, chroma420 = c420))._3
      val prog = JpegCodec.decode(JpegCodec.encodeProgressive(
        32, 32, grad, quality = q, chroma420 = c420))._3
      assert(prog.sameElements(base),
        s"progressive(q=$q, c420=$c420) diverged from baseline at " +
          s"index ${prog.zip(base).indexWhere(t => t._1 != t._2)}")
    }
    // grayscale progressive (single-component non-interleaved DC scan)
    val bg = JpegCodec.decode(
      JpegCodec.encode(24, 16, grad.take(24 * 16), quality = 50,
        gray = true))._3
    val pg = JpegCodec.decode(JpegCodec.encodeProgressive(
      24, 16, grad.take(24 * 16), quality = 50, gray = true))._3
    assert(pg.sameElements(bg))
    // non-multiple-of-16 dims exercise the non-interleaved AC grid
    // (ceil(sampled/8), NOT the MCU-padded grid — the classic trap)
    val odd = Array.tabulate(40 * 24) { i =>
      val (x, y) = (i % 40, i / 40)
      ((x * 6) << 16) | ((y * 10) << 8) | ((x * 3 + y * 5) & 0xff)
    }
    val ob = JpegCodec.decode(
      JpegCodec.encode(40, 24, odd, quality = 50, chroma420 = true))._3
    val op = JpegCodec.decode(JpegCodec.encodeProgressive(
      40, 24, odd, quality = 50, chroma420 = true))._3
    assert(op.sameElements(ob))
    // deterministic bytes
    assert(java.util.Arrays.equals(
      JpegCodec.encodeProgressive(32, 32, grad, quality = 50),
      JpegCodec.encodeProgressive(32, 32, grad, quality = 50)))
  }

  test("Warc.canonicalUrl + dedupByUrl: variant spellings collapse, first capture wins") {
    import java.nio.charset.StandardCharsets.UTF_8
    import graft.ext.Warc
    // canonicalization edges: scheme/fragment/host-case/query-order
    // invariance; PATH case preserved; no-query, no-path, bare-token
    // query all stable
    val got = Seq(
        "https://Example.COM/Path/X?b=2&a=1#frag",
        "HTTP://example.com/Path/X?a=1&b=2",
        "example.com/Path/X?a=1&b=2",
        "https://example.com/Path/X",
        "https://HOST.com?z=1&y=2",
        "https://h.com/p?one")
      .toDF("u").select(Warc.canonicalUrl($"u").as("c"))
      .as[String].collect().toSeq
    assert(got == Seq(
      "example.com/Path/X?a=1&b=2",
      "example.com/Path/X?a=1&b=2",
      "example.com/Path/X?a=1&b=2",
      "example.com/Path/X",
      "host.com?y=2&z=1",
      "h.com/p?one"), got.mkString("\n"))

    // dedup: three spellings of one URL + one distinct URL; the FIRST
    // capture (lowest (file, rec_index)) survives with url_copies = 3
    val dir = java.nio.file.Files
      .createTempDirectory("graft_urldedup_").toString
    Warc.writeFixture(s"$dir/a.wet.gz", Iterator(
      ("conversion", "https://Site.org/a?y=2&x=1", "text/plain",
        "first".getBytes(UTF_8)),
      ("conversion", "http://site.org/a?x=1&y=2#f", "text/plain",
        "second".getBytes(UTF_8)),
      ("conversion", "https://site.org/b", "text/plain",
        "unique".getBytes(UTF_8)),
      ("conversion", "HTTPS://SITE.ORG/a?x=1&y=2", "text/plain",
        "third".getBytes(UTF_8))), gzip = true)
    val kept = Warc.dedupByUrl(Warc.records(spark, dir))
      .select($"canonical_url", $"url_copies", $"body".cast("string"))
      .as[(String, Long, String)].collect().toSet
    assert(kept == Set(
      ("site.org/a?x=1&y=2", 3L, "first"),
      ("site.org/b", 1L, "unique")))

    // a Content-Length outside [0, Int.MaxValue] fails LOUDLY with the
    // file name — a silent toInt truncation would desynchronize the
    // stream and misparse every record after it
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft_warclen_").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir2/big.warc"),
      ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
        "Content-Length: 99999999999\r\n\r\n").getBytes(UTF_8))
    val e = intercept[Exception](Warc.records(spark, dir2).collect())
    def rootMsg(t0: Throwable): String = {
      var t = t0
      while (t.getCause != null) t = t.getCause
      Option(t.getMessage).getOrElse("")
    }
    assert(rootMsg(e).contains("Content-Length") &&
      rootMsg(e).contains("big.warc"), rootMsg(e))
  }

  test("crawl-to-multimodal: JPEG response payloads decode straight off WARC records") {
    import java.nio.charset.StandardCharsets.UTF_8
    import graft.ext.Warc
    import Multimodal.JpegCodec
    // the chain the codec exists for: a crawl's image/jpeg responses,
    // HTTP-split by the WARC reader, decode per row with no temp files
    val dir = java.nio.file.Files
      .createTempDirectory("graft_crawljpeg_").toString
    val colors = Seq(0x113355, 0xaabbcc)
    Warc.writeFixture(s"$dir/img.warc.gz", colors.zipWithIndex.iterator
      .map { case (c, i) =>
        val jpeg = JpegCodec.encode(16, 16,
          Array.fill(256)(c), quality = 100, chroma420 = true)
        val http = ("HTTP/1.1 200 OK\r\nContent-Type: image/jpeg\r\n\r\n")
          .getBytes(UTF_8) ++ jpeg
        ("response", s"https://imgs.example/$i.jpg", "image/jpeg", http)
      }, gzip = true)
    val rows = Warc.records(spark, dir)
      .where($"warc_type" === "response")
      .select($"target_uri", $"body").as[(String, Array[Byte])]
      .collect().sortBy(_._1)
    assert(rows.length == 2)
    def clamp(v: Long): Int = if (v < 0) 0 else if (v > 255) 255 else v.toInt
    def roundTrip(p: Int): Int = {
      val (r, g, b) = ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
      val y = clamp((299L * r + 587L * g + 114L * b + 500L) / 1000L)
      val cb = clamp(128L + (-168735892L * r - 331264108L * g +
        500000000L * b + 500000000L) / 1000000000L)
      val cr = clamp(128L + (500000000L * r - 418687589L * g -
        81312411L * b + 500000000L) / 1000000000L)
      (clamp(y + (1402L * (cr - 128) + 500L) / 1000L) << 16) |
        (clamp(y + (-344136L * (cb - 128) -
          714136L * (cr - 128) + 500000L) / 1000000L) << 8) |
        clamp(y + (1772L * (cb - 128) + 500L) / 1000L)
    }
    rows.zip(colors).foreach { case ((_, body), c) =>
      val (w, h, px) = JpegCodec.decode(body)
      assert(w == 16 && h == 16)
      assert(px.forall(_ == roundTrip(c)),
        "a constant 16×16 q100 JPEG must round-trip exactly off the crawl")
    }
  }

  test("crawl-to-corpus: WARC responses feed stripHtml and recover the document text") {
    import java.nio.charset.StandardCharsets.UTF_8
    import graft.ext.Warc
    val dir = java.nio.file.Files.createTempDirectory("graft_crawl_")
      .toString
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "pack my box with five dozen liquor jugs")
    Warc.writeFixture(s"$dir/crawl.warc.gz", texts.iterator.map {
      case (id, t) =>
        val html = "<html><head><title></title>" +
          "<script>var x = 1;</script></head>" +
          s"<body><p>$t</p><!-- note --></body></html>"
        ("response", s"https://x/$id",
          "application/http; msgtype=response",
          ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html)
            .getBytes(UTF_8))
    }, gzip = true)
    // the whole chain: container parse → HTTP split → HTML strip —
    // scripts/comments/tags gone, the document text recovered intact
    val got = Warc.htmlResponses(Warc.records(spark, dir))
      .select(col("target_uri"),
        trim(graft.ext.TextOps.stripHtml(col("html"))).as("text"))
      .orderBy("target_uri").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == texts.map { case (id, t) => (s"https://x/$id", t) })
  }
}
