package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Greedy longest-match wordpiece tokenization as a native codegen
 * expression — the real-subword counterpart of `token_stats`' whitespace
 * count (WordPiece greedy matching per Wu et al. 2016 / the BERT
 * reference tokenizer; same algorithm, vocabulary-parameterized).
 *
 * Each normalized word (the SAME normalization as `norm_tokens`, so
 * word boundaries agree with every other text kernel) is split by
 * repeatedly taking the LONGEST vocabulary piece matching at the
 * current offset; continuation positions (offset > 0) match only
 * `##`-prefixed entries, word-initial positions only plain entries. A
 * position with no match makes the WHOLE word `[UNK]` (the reference
 * behavior — partial emissions would make counts depend on where the
 * failure sat).
 *
 * Determinism: matching depends only on (word, vocabulary); the vocab
 * ships with the expression (broadcast in the closure, one hash-set
 * probe per candidate length), so the pieces are identical on every
 * executor, every run, and in the DuckDB oracle replay (a bounded
 * recursive walk over the same vocabulary VALUES list —
 * `tokenize_subword` in ExtQueries).
 *
 * Scale shape: one JIT-compiled call per row inside whole-stage
 * codegen, zero shuffle, O(word_len × max_piece_len) per word. Token
 * BUDGETS derived from this (shard packing, length bucketing) are real
 * subword counts; the whitespace `token_stats` count remains the
 * default for the relative quality signals where absolute budgets
 * don't matter (`TextOps.subwordCount` is the opt-in).
 */
object Subword {

  /** Unknown-word sentinel (never a vocabulary entry). */
  val Unk = "[UNK]"

  /**
   * Built-in demonstration vocabulary: full ASCII letter/digit singles
   * (word-initial and continuation) guarantee every ASCII word
   * tokenizes without `[UNK]`, plus common English affixes/morphemes so
   * realistic words split into few pieces. A production vocab (e.g. a
   * learned 32k wordpiece list) drops in through the same expression —
   * nothing below depends on this list's content, only on its
   * (stem, continuation) entries being distinct.
   */
  val defaultVocab: Seq[String] = {
    val singles = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
    val morphemes = Seq(
      "the", "and", "ing", "ion", "tion", "ation", "ed", "er", "es",
      "est", "ly", "al", "ic", "ous", "ment", "ness", "able", "ible",
      "ant", "ent", "ive", "ize", "ise", "ful", "less", "pre", "pro",
      "con", "com", "dis", "un", "re", "in", "ex", "sub", "inter",
      "over", "under", "out", "up", "anti", "de", "en", "non", "mis",
      "semi")
    val stems = (singles ++ morphemes).distinct
    stems ++ stems.map("##" + _)
  }

  /**
   * Compiled vocabulary: per (continuation?, stem length) hash sets, so
   * the greedy step probes lengths longest-first with one substring
   * hash each. Serializable — the expression carries it to executors.
   */
  final class Matcher(vocab: Seq[String]) extends Serializable {
    require(vocab.nonEmpty, "subword vocabulary must not be empty")
    private def build(stems: Seq[String]): Array[java.util.HashSet[String]] = {
      val maxLen = if (stems.isEmpty) 0 else stems.map(_.length).max
      val byLen = Array.fill(maxLen + 1)(new java.util.HashSet[String]())
      stems.foreach(s => byLen(s.length).add(s))
      byLen
    }
    private val (contEntries, initEntries) = vocab.partition(_.startsWith("##"))
    require(vocab.distinct.size == vocab.size,
      "subword vocabulary entries must be distinct")
    // index 0 = word-initial stems, 1 = continuation stems (## stripped)
    private[Subword] val sets: Array[Array[java.util.HashSet[String]]] =
      Array(build(initEntries), build(contEntries.map(_.substring(2))))

    /** Longest stem in class `cont` matching `word` at `pos`; 0 if none. */
    private[Subword] def longestMatch(word: String, pos: Int, cont: Int): Int = {
      val byLen = sets(cont)
      var len = math.min(byLen.length - 1, word.length - pos)
      while (len >= 1) {
        if (!byLen(len).isEmpty &&
          byLen(len).contains(word.substring(pos, pos + len))) return len
        len -= 1
      }
      0
    }
  }

  /** Greedy wordpiece split of one normalized word. */
  private def splitWord(word: String, m: Matcher,
      out: java.util.ArrayList[Any]): Unit = {
    val start = out.size()
    var pos = 0
    while (pos < word.length) {
      val cont = if (pos == 0) 0 else 1
      val len = m.longestMatch(word, pos, cont)
      if (len == 0) {
        // reference behavior: any unmatchable position voids the word
        while (out.size() > start) out.remove(out.size() - 1)
        out.add(UTF8String.fromString(Unk))
        return
      }
      out.add(UTF8String.fromString(
        (if (pos == 0) "" else "##") + word.substring(pos, pos + len)))
      pos += len
    }
  }

  /** The scalar kernel invoked from generated code: pieces of every
    * normalized word of `text`, concatenated in word order. */
  def tokenize(text: UTF8String, m: Matcher): ArrayData = {
    val words = TextExprs.tokenize(text)
    val out = new java.util.ArrayList[Any](words.length * 2)
    var i = 0
    while (i < words.length) { splitWord(words(i), m, out); i += 1 }
    new GenericArrayData(out.toArray)
  }

  case class SubwordTokens(child: Expression,
      vocab: Seq[String] = defaultVocab)
      extends UnaryExpression with ExpectsInputTypes {
    @transient private lazy val matcher = new Matcher(vocab)
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "subword_tokens"
    override def nullSafeEval(input: Any): Any =
      tokenize(input.asInstanceOf[UTF8String], matcher)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val m = ctx.addReferenceObj("subwordMatcher", matcher,
        classOf[Matcher].getName)
      defineCodeGen(ctx, ev,
        c => s"graft.functions.Subword.tokenize($c, $m)")
    }
    override protected def withNewChildInternal(newChild: Expression): SubwordTokens =
      copy(child = newChild)
  }

  /** Registry entry (default vocabulary; a custom vocab constructs
    * `SubwordTokens(expr, vocab)` directly). */
  val injections: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("subword_tokens"),
      new ExpressionInfo(classOf[SubwordTokens].getName, "subword_tokens"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "subword_tokens(text)")
        SubwordTokens(children.head)
      }))

  /** Register on an already-built session (idempotent). */
  def register(spark: SparkSession): Unit =
    injections.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
