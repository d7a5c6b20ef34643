package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document character histogram — VALUE-IDENTICAL (as a
  * multiset) to the exploded form it replaces in
  * [[graft.pipeline.TextAnalysis.docEntropy]]:
  * `explode(sequence(1, length(text)))` → `substr(text, p, 1)` →
  * `groupBy(doc_id, ch).count()`. One row per DISTINCT code point with
  * its count, so the downstream per-doc fold sees ~alphabet-sized arrays
  * instead of corpus-position-sized exchanges. Entry order is first
  * occurrence (deterministic), irrelevant to the order-insensitive
  * integer folds that consume it.
  *
  * Character unit is the CODE POINT (`substr(text, p, 1)` semantics:
  * positions count code points and each slice is one code point).
  * NULL text yields NULL.
  */
case class CharHistogram(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"char_histogram expects a string input, got ${child.dataType}")

  override def dataType: DataType = TextFunctions.histType

  override def nullSafeEval(s: Any): Any =
    TextFunctions.charHistogram(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextFunctions.charHistogram($s);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Native per-document entropy fold — VALUE-IDENTICAL to
  * `aggregate(char_histogram(text), …)` with
  * `lnFp(c) = round(log(c) * EntScale).cast("long")`: returns
  * struct(n = Σ counts, clnc = Σ c·lnFp(c)). Exists because the two
  * interpreted HigherOrderFunction folds (one lambda eval + boxing per
  * distinct char per doc) remained the doc_entropy ×100 floor after the
  * histogram went native. Bit-parity: Spark's `log` IS
  * `java.lang.StrictMath.log` (verified against the 4.1.2 bytecode —
  * `Log$$anonfun` invokes StrictMath.log; codegen emits the same), and
  * `round` on DOUBLE is `BigDecimal.valueOf(x).setScale(0, HALF_UP)`,
  * replicated verbatim in [[TextFunctions.lnFpLong]]. The per-doc closing
  * term `n·lnFp(n) − clnc` stays in Column-land. NULL text yields NULL.
  */
case class CharEntropyFold(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"char_entropy_fold expects a string input, got ${child.dataType}")

  override def dataType: DataType = TextFunctions.entropyType

  override def nullSafeEval(s: Any): Any =
    TextFunctions.charEntropyFold(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextFunctions.charEntropyFold($s);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Native token-n-gram MD5 hash vector — VALUE-IDENTICAL to building the
  * n-gram STRING (tokens joined by one space) and taking
  * `C.md5Long(gram)` = `conv(substring(md5(gram), 1, 15), 16, 10)`:
  * one 60-bit long per n-gram of the whitespace tokens of `text`
  * ([[graft.pipeline.TextAnalysis.tokens]] semantics: split on the single
  * space char, empties dropped), duplicates preserved in order.
  *
  * The scan is byte-level: 0x20 never occurs inside a UTF-8 multibyte
  * sequence, so token ranges are byte ranges, and MD5-of-joined-string
  * equals streaming the token ranges with a 0x20 byte between them — no
  * token string, no gram string, no hex/conv round-trip is ever
  * materialized. Shared kernel of the shingle index (n = 3: the
  * MinHash-LSH chain and decontamination) and the DSIR feature hasher
  * (n = 1 and 2) — the corpus-sized md5Long battery those queries paid
  * per gram. NULL text yields NULL (explode of the old NULL-propagated
  * transform emitted no rows; explode(NULL) emits none either).
  */
case class TokenGramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "gram arity must be >= 1")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"token_gram_hashes expects a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    TextFunctions.tokenGramHashes(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextFunctions.tokenGramHashes($s, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Native marker-word counter — VALUE-IDENTICAL to
  * `size(filter(tokens(text), t => t.isin(markers)))` evaluated for each
  * marker GROUP: one tokenizing pass counting token OCCURRENCES that hit
  * each group (groups are flattened as `groups(i)` arrays; output is one
  * long per group, in order). Replaces [[graft.pipeline.TextAnalysis.langId]]'s
  * per-language interpreted filter lambdas. NULL text yields NULL
  * (size(null-filter) was null per score, and the whole-row null array
  * propagates identically through the argmax CASE).
  */
case class MarkerCounts(child: Expression, groups: Seq[Seq[String]])
    extends UnaryExpression {
  require(groups.nonEmpty && groups.forall(_.nonEmpty))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"marker_counts expects a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // the flattened marker table is plan-constant; build the lookup once
  @transient private lazy val table: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    groups.zipWithIndex.foreach { case (ms, gi) =>
      ms.foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(gi) else prev :+ gi)
      }
    }
    m
  }

  override def nullSafeEval(s: Any): Any =
    TextFunctions.markerCounts(s.asInstanceOf[UTF8String], table, groups.size)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // erased raw type: Janino's generics support is unreliable, and a
    // generic cast here risks a codegen compile failure + silent
    // interpreted fallback (ADVICE r14)
    val tableRef = ctx.addReferenceObj("markerTable", table,
      "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextFunctions.markerCounts($s, $tableRef, ${groups.size});")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Native one-round BPE merge + adjacent-symbol-pair emission —
  * VALUE-IDENTICAL (as a multiset, per input row) to the
  * [[graft.pipeline.TextAnalysis.bpeMergeApply]] window algebra it
  * replaces: per whitespace token of `text`
  * ([[graft.pipeline.TextAnalysis.tokens]] semantics — split on the
  * single space char, empties dropped), greedily merge the elected pair
  * (m1, m2) left-to-right over CODE POINTS (overlap runs resolve to the
  * even offsets: "aaa" under (a,a) → (aa)(a)), then emit every adjacent
  * pair of the resulting symbol stream as struct(s1, s2). The relational
  * form paid one (doc, token, char)-exploded exchange plus three window
  * passes (run-start max, consumed lag, pair lead) per corpus character;
  * this is one fused byte-scan per document, embarrassingly parallel at
  * any scale. m1/m2 with more than one code point never match (the
  * `substr(w, p, 1) = m1` semantics of the relational form). NULL text
  * yields NULL (the caller's explode drops it, like the exploded form's
  * no-rows).
  */
case class BpeMergeAdjPairs(text: Expression, m1: Expression, m2: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = text
  override def second: Expression = m1
  override def third: Expression = m2

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(text, m1, m2).forall(_.dataType == StringType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bpe_merge_adj_pairs expects string inputs, got " +
        s"(${text.dataType}, ${m1.dataType}, ${m2.dataType})")

  override def dataType: DataType = TextFunctions.bpePairType

  override def nullSafeEval(t: Any, a: Any, b: Any): Any =
    TextFunctions.bpeMergeAdjPairs(t.asInstanceOf[UTF8String],
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, a, b) =>
      s"${ev.value} = graft.functions.TextFunctions.bpeMergeAdjPairs($t, $a, $b);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(text = newFirst, m1 = newSecond, m2 = newThird)
}

/** Native SimHash — VALUE-IDENTICAL to the grouped vote form it replaces
  * in [[graft.pipeline.Dedup.simhashCore]] (explode tokens → md5Long per
  * occurrence → 48 conditional-sum columns → sign assembly), folded in
  * one pass per row with no token exchange. NULL for NULL text AND for a
  * tokenless doc (the grouped form emitted no row there — the caller
  * filters nulls to keep that contract).
  */
case class SimhashBits(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 60, "simhash bits must be in [1, 60]")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash expects a string input, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(s: Any): Any =
    TextFunctions.simhashFold(s.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("simBoxed")
    // hand-rolled null handling: a NON-null input can still yield a null
    // output (tokenless doc), which nullSafeCodeGen cannot express
    ev.copy(code =
      code"""
${childGen.code}
boolean ${ev.isNull} = true;
long ${ev.value} = -1L;
if (!${childGen.isNull}) {
  java.lang.Long $boxed =
    graft.functions.TextFunctions.simhashFold(${childGen.value}, $bits);
  if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.longValue(); }
}""")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Native Gopher-battery statistics — VALUE-IDENTICAL to the array-lambda
  * battery it replaces in [[graft.pipeline.TextAnalysis.gopherRulesCore]]:
  *
  * {{{
  * t            = filter(split(text, " "), x => length(x) > 0)
  * n_words      = size(t)
  * sum_len      = aggregate(t, 0L, (a, x) => a + length(x))
  * n_stop_types = size(array_intersect(t, stopwords))
  * n_alpha      = size(filter(t, x => x.rlike("[a-zA-Z]")))
  * n_bg         = greatest(size(t) − 1, 0)
  * n_bg_dist    = size(array_distinct(arrays_zip(slice(t,1,n−1), slice(t,2,n−1))))
  * }}}
  *
  * in one tokenizing pass over the text (no token array materialized, no
  * per-token regex, no struct-pair allocation — the gopher_rules ×100
  * constant). Token unit: split on the single space char, empties dropped
  * (the [[graft.pipeline.TextAnalysis.tokens]] contract); lengths count
  * code points (SQL `length`); bigram distinctness keys on the exact
  * (t1, t2) string pair via a length-prefixed injective encoding. NULL
  * text yields NULL (the legacy chain's size(null)/aggregate(null)
  * nulls flow the same way).
  */
case class GopherStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"gopher_stats expects a string input, got ${child.dataType}")

  override def dataType: DataType = TextFunctions.gopherType

  override def nullSafeEval(s: Any): Any =
    TextFunctions.gopherStats(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextFunctions.gopherStats($s);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextFunctions {

  val histType: DataType = ArrayType(StructType(Seq(
    StructField("ch", StringType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)

  val gopherType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("n_stop_types", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_bg", LongType, nullable = false),
    StructField("n_bg_dist", LongType, nullable = false)))

  /** Mirror of TextAnalysis.stopwords (pinned by TextNativeSpec). */
  private val gopherStopwords =
    Array("the", "a", "of", "and", "or", "in", "on", "is")

  /** Shared by the interpreted and codegen paths. One pass: tokenize on
    * ' ', per token fold every statistic; adjacent-pair distinctness via
    * a small string set keyed injectively. */
  def gopherStats(text: UTF8String): GenericInternalRow = {
    val s = text.toString
    val len = s.length
    var nWords = 0L
    var sumLen = 0L
    var nAlpha = 0L
    val stopSeen = new Array[Boolean](gopherStopwords.length)
    var pairs: java.util.HashSet[String] = null
    var prev: String = null
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        if (i > start) { // non-empty token
          val tok = s.substring(start, i)
          nWords += 1
          sumLen += tok.codePointCount(0, tok.length)
          var hasAlpha = false
          var j = 0
          while (!hasAlpha && j < tok.length) {
            val c = tok.charAt(j)
            if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) hasAlpha = true
            j += 1
          }
          if (hasAlpha) nAlpha += 1
          var k = 0
          while (k < gopherStopwords.length) {
            if (!stopSeen(k) && gopherStopwords(k) == tok) stopSeen(k) = true
            k += 1
          }
          if (prev != null) {
            if (pairs == null) pairs = new java.util.HashSet[String]()
            pairs.add(prev.length.toString + ":" + prev + tok)
          }
          prev = tok
        }
        start = i + 1
      }
      i += 1
    }
    var nStop = 0L
    var k = 0
    while (k < stopSeen.length) { if (stopSeen(k)) nStop += 1; k += 1 }
    val nBg = math.max(nWords - 1, 0L)
    val nBgDist = if (pairs == null) 0L else pairs.size.toLong
    new GenericInternalRow(Array[Any](nWords, sumLen, nStop, nAlpha, nBg, nBgDist))
  }

  /** `gopher_stats(text)` as a Column. */
  def gopherStats(text: Column): Column =
    GraftColumnBridge.column(GopherStats(GraftColumnBridge.expression(text)))

  /** Shared by the interpreted and codegen paths. ASCII counts live in a
    * flat 128-slot array (the overwhelmingly common case); anything wider
    * falls into a small LinkedHashMap keyed by code point. */
  def charHistogram(text: UTF8String): ArrayData = {
    val s = text.toString
    val len = s.length
    val ascii = new Array[Long](128)
    val asciiFirst = new Array[Int](128) // first-occurrence position for ordering
    var wide: java.util.LinkedHashMap[Integer, Array[Long]] = null
    var i = 0
    var seq = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      if (cp < 128) {
        if (ascii(cp) == 0) asciiFirst(cp) = seq
        ascii(cp) += 1
      } else {
        if (wide == null) wide = new java.util.LinkedHashMap[Integer, Array[Long]]()
        val cell = wide.get(cp)
        if (cell == null) wide.put(cp, Array(1L, seq.toLong)) else cell(0) += 1
      }
      seq += 1
      i += Character.charCount(cp)
    }
    // emit in first-occurrence order across both stores
    val entries = new java.util.ArrayList[(Int, Int, Long)](32) // (firstPos, cp, count)
    var c = 0
    while (c < 128) {
      if (ascii(c) > 0) entries.add((asciiFirst(c), c, ascii(c)))
      c += 1
    }
    if (wide != null) {
      val it = wide.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        entries.add((e.getValue()(1).toInt, e.getKey.intValue(), e.getValue()(0)))
      }
    }
    entries.sort((a, b) => Integer.compare(a._1, b._1))
    val rows = new Array[Any](entries.size())
    var j = 0
    while (j < entries.size()) {
      val (_, cp, cnt) = entries.get(j)
      rows(j) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(new String(Character.toChars(cp))), cnt))
      j += 1
    }
    new GenericArrayData(rows)
  }

  /** `char_histogram(text)` as a Column. */
  def charHistogram(text: Column): Column =
    GraftColumnBridge.column(CharHistogram(GraftColumnBridge.expression(text)))

  val entropyType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("clnc", LongType, nullable = false)))

  /** Mirror of TextAnalysis.EntScale (pinned by TextNativeSpec). */
  private val EntScale = 1000000L

  /** `round(log(c) * EntScale).cast("long")`, bit-for-bit: StrictMath.log
    * (Spark's Log provider), exact long→double multiply (EntScale = 1e6 is
    * double-exact), BigDecimal HALF_UP at scale 0 (Spark's Round on
    * DOUBLE), then the double→long cast of an integral value. */
  private def lnFpLong(c: Long): Long =
    java.math.BigDecimal.valueOf(StrictMath.log(c.toDouble) * EntScale)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  /** Shared by the interpreted and codegen paths: histogram + fold in one
    * pass, no array materialization. */
  def charEntropyFold(text: UTF8String): GenericInternalRow = {
    val s = text.toString
    val len = s.length
    val ascii = new Array[Long](128)
    var wide: java.util.HashMap[Integer, Array[Long]] = null
    var n = 0L
    var i = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (wide == null) wide = new java.util.HashMap[Integer, Array[Long]]()
        val cell = wide.get(cp)
        if (cell == null) wide.put(cp, Array(1L)) else cell(0) += 1
      }
      n += 1
      i += Character.charCount(cp)
    }
    var clnc = 0L
    var c = 0
    while (c < 128) {
      if (ascii(c) > 0) clnc += ascii(c) * lnFpLong(ascii(c))
      c += 1
    }
    if (wide != null) {
      val it = wide.values().iterator()
      while (it.hasNext) { val v = it.next()(0); clnc += v * lnFpLong(v) }
    }
    new GenericInternalRow(Array[Any](n, clnc))
  }

  /** `char_entropy_fold(text)` as a Column. */
  def charEntropyFold(text: Column): Column =
    GraftColumnBridge.column(CharEntropyFold(GraftColumnBridge.expression(text)))

  private val emptyLongs = new GenericArrayData(new Array[Long](0))

  /** Shared by the interpreted and codegen paths. */
  def tokenGramHashes(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    // token byte ranges, split on the space byte (never part of a UTF-8
    // multibyte sequence), empties dropped
    var cap = 16
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var ntok = 0
    var i = 0
    var start = 0
    while (i <= len) {
      if (i == len || bytes(i) == 0x20) {
        if (i > start) {
          if (ntok == cap) {
            cap *= 2
            starts = java.util.Arrays.copyOf(starts, cap)
            ends = java.util.Arrays.copyOf(ends, cap)
          }
          starts(ntok) = start
          ends(ntok) = i
          ntok += 1
        }
        start = i + 1
      }
      i += 1
    }
    val m = ntok - n + 1
    if (m <= 0) return emptyLongs
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = new Array[Byte](16)
    val out = new Array[Long](m)
    var g = 0
    while (g < m) {
      var t = 0
      while (t < n) {
        if (t > 0) md.update(0x20.toByte)
        md.update(bytes, starts(g + t), ends(g + t) - starts(g + t))
        t += 1
      }
      md.digest(dig, 0, 16) // completes AND resets
      val be =
        ((dig(0) & 0xffL) << 56) | ((dig(1) & 0xffL) << 48) |
        ((dig(2) & 0xffL) << 40) | ((dig(3) & 0xffL) << 32) |
        ((dig(4) & 0xffL) << 24) | ((dig(5) & 0xffL) << 16) |
        ((dig(6) & 0xffL) << 8) | (dig(7) & 0xffL)
      out(g) = be >>> 4
      g += 1
    }
    new GenericArrayData(out)
  }

  /** `token_gram_hashes(text, n)` as a Column. */
  def tokenGramHashes(text: Column, n: Int): Column =
    GraftColumnBridge.column(TokenGramHashes(GraftColumnBridge.expression(text), n))

  /** Element type of [[BpeMergeAdjPairs]]: struct(s1, s2) symbol pairs. */
  val bpePairType: DataType = ArrayType(StructType(Seq(
    StructField("s1", StringType, nullable = false),
    StructField("s2", StringType, nullable = false))), containsNull = false)

  private val emptyPairs = new GenericArrayData(new Array[Any](0))

  /** Shared by the interpreted and codegen paths of [[BpeMergeAdjPairs]]. */
  def bpeMergeAdjPairs(text: UTF8String, m1: UTF8String, m2: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    // the merge pattern only ever matches single code points (the
    // relational form compared substr(w, p, 1) to m1/m2)
    val m1b = m1.getBytes
    val m2b = m2.getBytes
    val matchable = m1.numChars == 1 && m2.numChars == 1
    def cpLen(b: Byte): Int = UTF8String.numBytesForFirstByte(b)
    def eq(off: Int, n: Int, pat: Array[Byte]): Boolean = {
      if (pat.length != n) return false
      var k = 0
      while (k < n) { if (bytes(off + k) != pat(k)) return false; k += 1 }
      true
    }
    val out = new java.util.ArrayList[Any](16)
    var i = 0
    var tokStart = 0
    while (i <= len) {
      if (i == len || bytes(i) == 0x20) {
        if (i > tokStart) {
          // greedy merge over code points of the token [tokStart, i)
          var p = tokStart
          var prevS: UTF8String = null
          while (p < i) {
            val n1 = cpLen(bytes(p))
            var symEnd = p + n1
            if (matchable && eq(p, n1, m1b) && symEnd < i) {
              val n2 = cpLen(bytes(symEnd))
              if (symEnd + n2 <= i && eq(symEnd, n2, m2b)) symEnd += n2 // merged
            }
            val sym = UTF8String.fromBytes(bytes, p, symEnd - p)
            if (prevS != null)
              out.add(new GenericInternalRow(Array[Any](prevS, sym)))
            prevS = sym
            p = symEnd
          }
        }
        tokStart = i + 1
      }
      i += 1
    }
    if (out.isEmpty) emptyPairs else new GenericArrayData(out.toArray)
  }

  /** `bpe_merge_adj_pairs(text, m1, m2)` as a Column. */
  def bpeMergeAdjPairs(text: Column, m1: Column, m2: Column): Column =
    GraftColumnBridge.column(BpeMergeAdjPairs(
      GraftColumnBridge.expression(text),
      GraftColumnBridge.expression(m1), GraftColumnBridge.expression(m2)))

  /** `simhash(text, bits)` as a Column. */
  def simhash(text: Column, bits: Int): Column =
    GraftColumnBridge.column(SimhashBits(GraftColumnBridge.expression(text), bits))

  /** `marker_counts(text, groups)` as a Column. */
  def markerCounts(text: Column, groups: Seq[Seq[String]]): Column =
    GraftColumnBridge.column(MarkerCounts(GraftColumnBridge.expression(text), groups))

  /** Shared by the interpreted and codegen paths: count token OCCURRENCES
    * hitting each marker group in one tokenizing pass. */
  def markerCounts(text: UTF8String,
      table: java.util.HashMap[String, Array[Int]], nGroups: Int): ArrayData = {
    val s = text.toString
    val len = s.length
    val counts = new Array[Long](nGroups)
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        if (i > start) {
          val gis = table.get(s.substring(start, i))
          if (gis != null) {
            var g = 0
            while (g < gis.length) { counts(gis(g)) += 1; g += 1 }
          }
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** SimHash fold shared by the interpreted and codegen paths: every
    * token OCCURRENCE votes ±1 on each of the low `bits` bits of its
    * 60-bit md5Long hash; bit set iff the vote sum is positive. Returns
    * null (boxed) for a tokenless doc — the grouped form emitted no row
    * there, and [[graft.pipeline.Dedup.simhashCore]] filters the nulls to
    * keep that contract. */
  def simhashFold(text: UTF8String, bits: Int): java.lang.Long = {
    val hs = tokenGramHashes(text, 1)
    val m = hs.numElements()
    if (m == 0) return null
    val votes = new Array[Int](bits)
    var i = 0
    while (i < m) {
      val h = hs.getLong(i)
      var b = 0
      while (b < bits) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) sim |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sim)
  }
}
