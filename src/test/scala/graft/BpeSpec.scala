package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Bpe

/**
 * Distributed BPE training vs an INDEPENDENT single-threaded reference:
 * the reference below implements classic greedy leftmost-nonoverlapping
 * merge application over symbol lists (the Sennrich et al. 2016
 * formulation) with the same (count desc, pair asc) tie-break — a
 * different algorithmic shape from the engine's delimiter-replace form,
 * so agreement pins the whole learning loop (pair statistics, argmax,
 * application) rather than replaying one implementation twice. The two
 * merge semantics coincide except interior same-symbol runs ≥ 5, which
 * the divergence-pin test documents explicitly.
 */
/** Single-threaded greedy BPE reference — shared with PropertySpec's
  * random-corpus equivalence test. */
object BpeSpec {

  def refWordFreq(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(t => Bpe.WordPattern.r.findAllIn(t))
      .filter(_.length <= Bpe.MaxWordLen)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }

  /** Classic greedy merge: scan left to right, merge non-overlapping
    * occurrences of (a, b), continue AFTER each merged token. */
  def greedyMerge(sym: Vector[String], a: String,
      b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < sym.length) {
      if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += sym(i); i += 1 }
    }
    out.result()
  }

  def refTrain(wf: Map[String, Long], numMerges: Int,
      eow: Boolean = false): (Seq[(String, String)], Map[String, Long]) = {
    var dict: Map[Vector[String], Long] =
      wf.map { case (w, f) =>
        val sym = w.map(_.toString).toVector
        (if (eow) sym :+ graft.ext.Bpe.EowMarker else sym) -> f
      }
    val merges = Seq.newBuilder[(String, String)]
    for (_ <- 1 to numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((sym, f) <- dict; i <- 0 until sym.length - 1)
        counts((sym(i), sym(i + 1))) =
          counts.getOrElse((sym(i), sym(i + 1)), 0L) + f
      if (counts.nonEmpty) {
        val (a, b) = counts.toSeq
          .minBy { case ((x, y), c) => (-c, x, y) }._1
        merges += ((a, b))
        dict = dict.groupMapReduce { case (sym, _) =>
          greedyMerge(sym, a, b) }(_._2)(_ + _)
      }
    }
    val vocab = dict.toSeq.flatMap { case (sym, f) => sym.map(_ -> f) }
      .groupMapReduce(_._1)(_._2)(_ + _)
    (merges.result(), vocab)
  }
}

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import BpeSpec.{greedyMerge, refTrain, refWordFreq}

  private def corpus(): Seq[String] =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").as[String].collect().toSeq

  // ------------------------------------------------------- the pins —

  test("train: distributed merges equal the greedy reference on the corpus") {
    val texts = corpus()
    val df = texts.toDF("text")
    val (got, dict) = Bpe.train(df, "text", numMerges = 25)
    val (want, wantVocab) = refTrain(refWordFreq(texts), 25)
    assert(got == want)
    val gotVocab = Bpe.vocab(dict).as[(String, Long)].collect().toMap
    assert(gotVocab == wantVocab)
  }

  test("eow variant: marker merges equal the greedy reference with the marker") {
    val texts = corpus()
    val (got, dict) = Bpe.train(texts.toDF("text"), "text",
      numMerges = 25, eow = true)
    val (want, wantVocab) = refTrain(refWordFreq(texts), 25, eow = true)
    assert(got == want)
    assert(Bpe.vocab(dict).as[(String, Long)].collect().toMap == wantVocab)
    // the marker participates: some learned merge must touch it (the
    // corpus has high-frequency short words whose suffix+marker pair
    // outranks word-internal pairs)
    assert(got.exists { case (a, b) =>
      a.contains(Bpe.EowMarker) || b.contains(Bpe.EowMarker) })
  }

  test("wordFreq matches the reference dict and caps word length") {
    val df = Seq("aa bb aa", "x".repeat(Bpe.MaxWordLen + 1) + " bb")
      .toDF("text")
    val got = Bpe.wordFreq(df, "text").as[(String, Long)].collect().toMap
    assert(got == Map("aa" -> 2L, "bb" -> 2L))
  }

  test("merge application: replace-fixpoint equals greedy on runs <= 4") {
    // 'aabb'*: pairs (a,a) on runs 2-4 — shared-delimiter skips must
    // be recovered by the re-scan passes
    val df = Seq(" a a ", " a a a ", " a a a a ").toDF("sp")
    val got = df.select(trim(Bpe.applyMerge(col("sp"), "a", "a")).as("m"))
      .as[String].collect().toSeq
    assert(got == Seq("aa", "aa a", "aa aa"))
  }

  test("divergence pin: same-symbol run of 5 differs from greedy by position only") {
    // documented variant boundary (Bpe scaladoc): greedy yields
    // [aa, aa, a]; replace-fixpoint [aa, a, aa] — same merge count
    val df = Seq(" a a a a a ").toDF("sp")
    val got = df.select(trim(Bpe.applyMerge(col("sp"), "a", "a")).as("m"))
      .as[String].collect().head
    assert(got == "aa a aa")
    assert(greedyMerge(Vector.fill(5)("a"), "a", "a") ==
      Vector("aa", "aa", "a"))
  }

  test("segment: per-doc subword counts match the reference segmentation") {
    val texts = corpus()
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (_, dict) = Bpe.train(df, "text", numMerges = 25)
    val got = Bpe.segment(df, "doc_id", "text", dict)
      .as[(Long, Long, Long)].collect()
      .map { case (id, w, s) => id -> ((w, s)) }.toMap
    // reference: re-train greedily, segment each doc's words by lookup
    val (merges, _) = refTrain(refWordFreq(texts), 25)
    val segLookup = scala.collection.mutable.Map.empty[String, Long]
    def segLen(w: String): Long = segLookup.getOrElseUpdate(w,
      merges.foldLeft(w.map(_.toString).toVector) {
        case (sym, (a, b)) => greedyMerge(sym, a, b)
      }.length.toLong)
    val want = texts.zipWithIndex.map { case (t, i) =>
      val ws = Bpe.WordPattern.r.findAllIn(t).toSeq
      i.toLong -> ((ws.size.toLong, ws.map(segLen).sum))
    }.toMap
    assert(got == want)
  }

  test("segmentTokens: concatenating a doc's subwords reconstructs its words") {
    val texts = corpus()
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (_, dict) = Bpe.train(df, "text", numMerges = 25)
    val got = Bpe.segmentTokens(df, "doc_id", "text", dict)
      .as[(Long, Long, String)].collect()
    assert(got.length == texts.size)
    for ((id, nWords, tokens) <- got) {
      val words = Bpe.WordPattern.r.findAllIn(texts(id.toInt)).toSeq
      assert(nWords == words.size)
      // tokenization is lossless modulo the word boundary
      assert(tokens.replace(" ", "") == words.mkString)
    }
  }

  test("train stops early when the dict runs out of pairs") {
    val df = Seq("ab ab ab").toDF("text")
    val (m, dict) = Bpe.train(df, "text", numMerges = 10)
    assert(m == Seq(("a", "b")))
    assert(Bpe.vocab(dict).as[(String, Long)].collect().toMap ==
      Map("ab" -> 3L))
  }

  test("batched training: non-interacting prefix == sequential, one round") {
    // six words over pairwise-DISJOINT alphabets with strictly
    // decreasing frequencies: the top-6 pairs share no symbol, so one
    // batched round must learn exactly what six sequential rounds do
    val words = Seq("ab" -> 70, "cd" -> 60, "ef" -> 50,
      "gh" -> 40, "ij" -> 30, "kl" -> 20)
    val df = words.map { case (w, n) => (w + " ") * n }.toDF("text")
    val (seq6, seqDict) = Bpe.train(df, "text", numMerges = 6)
    assert(Bpe.lastTrainRounds.get == 6)
    val seqVocab = Bpe.vocab(seqDict).as[(String, Long)].collect().toMap
    val (bat6, batDict) = Bpe.train(df, "text", numMerges = 6, batchSize = 8)
    assert(bat6 == seq6)
    assert(Bpe.lastTrainRounds.get == 1,
      s"expected 1 batched round, got ${Bpe.lastTrainRounds.get}")
    assert(Bpe.vocab(batDict).as[(String, Long)].collect().toMap == seqVocab)
  }

  test("batched training: interacting pairs are skipped — still sequential here") {
    // (a,b) and (b,c) share 'b': the skip-scan applies only the first
    // this round, so batched output is merge-for-merge the sequential one
    val df = Seq(("ab " * 50) + ("bc " * 30)).toDF("text")
    val (seqM, _) = Bpe.train(df, "text", numMerges = 2)
    val (batM, _) = Bpe.train(df, "text", numMerges = 2, batchSize = 4)
    assert(batM == seqM && seqM == Seq(("a", "b"), ("b", "c")))
    assert(Bpe.lastTrainRounds.get == 2)
    // merged-token interaction: symbol "ab" already exists as a word,
    // so a candidate containing it must not ride in a batch with (a,b)
    val df2 = Seq(("ab c " * 40) + ("a b " * 30)).toDF("text")
    val (s2, _) = Bpe.train(df2, "text", numMerges = 2)
    val (b2, _) = Bpe.train(df2, "text", numMerges = 2, batchSize = 4)
    assert(b2 == s2)
  }

  test("batched training: 256 merges cut rounds several-fold at batchSize=8") {
    // the sf0.001 corpus vocabulary exhausts at 89 merges, so the
    // 256-merge scaling figure runs on a deterministic synthetic
    // corpus: 600 Zipf-weighted words over a 26-letter alphabet
    val rnd = new scala.util.Random(0xb9e)
    val words = (1 to 600).map { i =>
      val len = 5 + rnd.nextInt(6)
      val w = (1 to len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      (w + " ") * (1 + 2000 / i)
    }
    val df = words.toDF("text")
    val (m, _) = Bpe.train(df, "text", numMerges = 256, batchSize = 8)
    val rounds = Bpe.lastTrainRounds.get
    assert(m.size == 256, s"corpus exhausted at ${m.size} merges")
    assert(rounds <= 64,
      s"expected ~256/8 rounds at batchSize=8, got $rounds")
    info(s"256 merges in $rounds rounds at batchSize=8 " +
      f"(${256.0 / rounds}%.1f merges/round)")
  }

  test("leakageSafeSplit co-assigns near-dup clusters and splits singletons by id") {
    import graft.ext.Sampling
    // cluster {3, 18, 27}: label 3 → 3 % 10 = 3 → train, ALL members
    // co-assigned regardless of their own ids (18 alone would be
    // validation-decile 8, 27 test-decile 7→train anyway — 18 is the
    // member that would leak under id-keyed splitting)
    val ids = Seq(3L, 18L, 27L, 8L, 9L, 10L)
    val df = ids.toDF("doc_id")
    val pairs = Seq((3L, 18L), (18L, 27L)).toDF("id_a", "id_b")
    val got = Sampling.leakageSafeSplit(df, "doc_id", pairs)
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got == Map(
      3L -> ((3L, "train")), 18L -> ((3L, "train")), 27L -> ((3L, "train")),
      8L -> ((8L, "validation")), 9L -> ((9L, "test")),
      10L -> ((10L, "train"))))
  }
}
