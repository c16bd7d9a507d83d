package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, GenericInternalRow, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions (WITH doGenCode — not CodegenFallback) for
 * the text-normalization hot path. The Column-function equivalents
 * (`TextNorm.tokens/shingles`) are built from higher-order functions,
 * whose lambda bodies are evaluated interpreted per element; these
 * expressions run the whole tokenize→shingle pass as one JIT-compiled
 * call per row inside whole-stage codegen.
 *
 * Semantics are BIT-IDENTICAL to the Column versions (spec-asserted on
 * the corpus): lowercase → split on runs of non-letter/digit →
 * non-empty tokens; shingles = distinct space-joined k-windows
 * (first-occurrence order), whole-text shingle for docs shorter than k.
 */
object TextExprs {

  /** Small per-language stopword profiles for the language-ID heuristic
    * (canonical copy — `TextOps.langProfiles` aliases this).
    * Order = deterministic tie-break priority. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "une", "est", "dans", "pour"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在", "他", "有", "这", "个"))

  private val profileSets: Array[java.util.HashSet[String]] =
    langProfiles.map { case (_, words) =>
      val s = new java.util.HashSet[String]()
      words.foreach(s.add)
      s
    }.toArray

  /** Shared scalar kernel: normalized tokens of a UTF8 string. */
  def tokenize(text: UTF8String): Array[String] =
    text.toLowerCase.toString
      .split("[^\\p{L}\\p{N}]+")
      .filter(_.nonEmpty)

  def normTokens(text: UTF8String): ArrayData =
    new GenericArrayData(
      tokenize(text).map(t => UTF8String.fromString(t): Any))

  def tokenShingles(text: UTF8String, k: Int): ArrayData = {
    val toks = tokenize(text)
    val n = math.max(toks.length - (k - 1), 1)
    // distinct, preserving first-occurrence order (== array_distinct)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < n) {
      val end = math.min(i + k, toks.length)
      seen.add(toks.slice(i, end).mkString(" "))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** Struct schema returned by `token_stats`: token-derived scalars plus
    * one hit count per language profile, all from ONE tokenize pass. */
  val tokenStatsType: StructType = StructType(
    Seq(
      StructField("n_tokens", IntegerType, nullable = false),
      StructField("n_distinct", IntegerType, nullable = false),
      StructField("sum_token_len", LongType, nullable = false)) ++
    langProfiles.map { case (lang, _) =>
      StructField(s"h_$lang", IntegerType, nullable = false) })

  /**
   * One-pass token statistics: token count, distinct-token count, summed
   * token length (code points — same unit as Spark's `length()`), and
   * per-profile stopword hit counts (non-distinct, like
   * `size(filter(toks, isin(words)))`). The Column formulation of these
   * needs 6+ interpreted higher-order-function passes per row; this is
   * one JIT-compiled call.
   */
  def tokenStats(text: UTF8String): InternalRow = {
    val toks = tokenize(text)
    val distinct = new java.util.HashSet[String]()
    var sumLen = 0L
    val hits = new Array[Int](profileSets.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      distinct.add(t)
      sumLen += t.codePointCount(0, t.length)
      var p = 0
      while (p < profileSets.length) {
        if (profileSets(p).contains(t)) hits(p) += 1
        p += 1
      }
      i += 1
    }
    val out = new Array[Any](3 + hits.length)
    out(0) = toks.length
    out(1) = distinct.size
    out(2) = sumLen
    var j = 0
    while (j < hits.length) { out(3 + j) = hits(j); j += 1 }
    new GenericInternalRow(out)
  }

  case class NormTokens(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "norm_tokens"
    override def nullSafeEval(input: Any): Any =
      normTokens(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextExprs.normTokens($c)")
    override protected def withNewChildInternal(newChild: Expression): NormTokens =
      copy(child = newChild)
  }

  case class TokenShingles(child: Expression, k: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(k >= 1, "shingle size must be >= 1")
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "token_shingles"
    override def nullSafeEval(input: Any): Any =
      tokenShingles(input.asInstanceOf[UTF8String], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextExprs.tokenShingles($c, $k)")
    override protected def withNewChildInternal(newChild: Expression): TokenShingles =
      copy(child = newChild)
  }

  /**
   * One-pass winnowing fingerprint (semantics identical to the Column
   * formulation in `TextOps.fingerprint`, spec-asserted): positional
   * k-shingles → first 8 hex chars of md5 → min over every w-window →
   * distinct → lexicographic sort. The HOF version evaluates an
   * interpreted md5+slice lambda per shingle per row (~37 s on the
   * sf0.1 corpus); this is one JIT-compiled call (~0.3 s).
   */
  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def winnowFingerprint(text: UTF8String, k: Int, w: Int): ArrayData = {
    val toks = tokenize(text)
    val nSh = math.max(toks.length - (k - 1), 1)
    // per-row getInstance would pay a synchronized JCA provider lookup
    // in the hot path; MessageDigest is not thread-safe, so thread-local
    val md = md5Local.get()
    val hashes = new Array[String](nSh)
    var i = 0
    while (i < nSh) {
      val end = math.min(i + k, toks.length)
      val sb = new java.lang.StringBuilder
      var t = i
      while (t < end) {
        if (t > i) sb.append(' ')
        sb.append(toks(t))
        t += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 8 hex chars = first 4 digest bytes
      val hex = new Array[Char](8)
      var b = 0
      while (b < 4) {
        hex(2 * b) = Character.forDigit((d(b) >> 4) & 0xf, 16)
        hex(2 * b + 1) = Character.forDigit(d(b) & 0xf, 16)
        b += 1
      }
      hashes(i) = new String(hex)
      i += 1
    }
    val nW = math.max(nSh - (w - 1), 1)
    val mins = new java.util.TreeSet[String]()
    var j = 0
    while (j < nW) {
      var m = hashes(j)
      var t = j + 1
      val end = math.min(j + w, nSh)
      while (t < end) { if (hashes(t).compareTo(m) < 0) m = hashes(t); t += 1 }
      mins.add(m)
      j += 1
    }
    val out = new Array[Any](mins.size)
    val it = mins.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  case class WinnowFingerprint(child: Expression, k: Int, w: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(k >= 1 && w >= 1, "shingle size and window must be >= 1")
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "winnow_fingerprint"
    override def nullSafeEval(input: Any): Any =
      winnowFingerprint(input.asInstanceOf[UTF8String], k, w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.TextExprs.winnowFingerprint($c, $k, $w)")
    override protected def withNewChildInternal(
        newChild: Expression): WinnowFingerprint =
      copy(child = newChild)
  }

  case class TokenStats(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = tokenStatsType
    override def prettyName: String = "token_stats"
    override def nullSafeEval(input: Any): Any =
      tokenStats(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextExprs.tokenStats($c)")
    override protected def withNewChildInternal(newChild: Expression): TokenStats =
      copy(child = newChild)
  }

  /**
   * NFKC Unicode normalization (UAX #15 compatibility decomposition +
   * canonical composition, via the JDK's `java.text.Normalizer`) — the
   * kernel real crawled corpora need AHEAD of tokenization: fullwidth
   * ＡＢＣ→ABC, ligature ﬁ→fi, circled ①→1, halfwidth katakana
   * composition, superscript ²→2, so one logical word stops splitting
   * into several vocabulary entries. Deterministic (the JDK tables
   * implement the frozen Unicode normalization stability policy) and
   * idempotent. The `isNormalized` fast path makes the common
   * already-ASCII row allocation-free, so the kernel is safe to leave
   * permanently in a 100 TB ingest path.
   */
  def nfkc(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s,
        java.text.Normalizer.Form.NFKC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC))
  }

  case class NfkcNormalize(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def prettyName: String = "nfkc"
    override def nullSafeEval(input: Any): Any =
      nfkc(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextExprs.nfkc($c)")
    override protected def withNewChildInternal(
        newChild: Expression): NfkcNormalize =
      copy(child = newChild)
  }

  /** The text-function registry entries, shared by per-session
    * `register` and the `GraftExtensions` session-builder injection. */
  val injections: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("norm_tokens"),
      new ExpressionInfo(classOf[NormTokens].getName, "norm_tokens"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "norm_tokens(text)")
        NormTokens(children.head)
      }),
    (FunctionIdentifier("token_shingles"),
      new ExpressionInfo(classOf[TokenShingles].getName, "token_shingles"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "token_shingles(text, k)")
        TokenShingles(children.head,
          VectorExprs.intLit(children(1), "token_shingles k"))
      }),
    (FunctionIdentifier("token_stats"),
      new ExpressionInfo(classOf[TokenStats].getName, "token_stats"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "token_stats(text)")
        TokenStats(children.head)
      }),
    (FunctionIdentifier("winnow_fingerprint"),
      new ExpressionInfo(classOf[WinnowFingerprint].getName, "winnow_fingerprint"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "winnow_fingerprint(text, k, w)")
        WinnowFingerprint(children.head,
          VectorExprs.intLit(children(1), "winnow_fingerprint k"),
          VectorExprs.intLit(children(2), "winnow_fingerprint w"))
      }),
    (FunctionIdentifier("nfkc"),
      new ExpressionInfo(classOf[NfkcNormalize].getName, "nfkc"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "nfkc(text)")
        NfkcNormalize(children.head)
      }))

  /**
   * Register the text functions on a session (idempotent).
   * Registration-on-session keeps the library usable on sessions the
   * caller did not build — the driver contract hands us an
   * already-constructed SparkSession; sessions built by the caller can
   * instead set `spark.sql.extensions=graft.functions.GraftExtensions`.
   */
  def register(spark: SparkSession): Unit =
    injections.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
