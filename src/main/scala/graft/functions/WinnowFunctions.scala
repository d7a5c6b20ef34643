package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native k-gram MD5 hash vector — VALUE-IDENTICAL to the expression form
  * it replaces in [[graft.pipeline.TextAnalysis.docWinnowCore]]:
  * `transform(sequence(1, length(text) − k + 1),
  *    p -> cast(conv(substring(md5(substring(text, p, k)), 1, 15), 16, 10) as bigint))`
  * — per gram, the first 15 hex digits (60 bits) of the MD5 of the gram's
  * UTF-8 bytes. The DuckDB oracle mirrors the md5 form unchanged, so
  * hashes at every SF are untouched.
  *
  * Exists because the expression form runs one interpreted
  * HigherOrderFunction lambda per gram, each allocating a substring
  * Column eval, a 32-char hex string, and a `conv` parse — measured as
  * the doc_winnow ×100 Spark cliff (1240 s, the suite's slowest map-only
  * query). This loop reuses one MessageDigest and reads the 60 bits
  * straight from the digest bytes ([[WinnowFunctions.gramHashes]]).
  * Gram slicing is by CODE POINT (`UTF8String.substring`), the same
  * semantics as SQL `substring`. NULL text yields NULL (wrap in
  * `coalesce(..., array())` to match the old `IF(length(text) >= k, …,
  * array())` which maps NULL to empty).
  */
case class GramMd5Hashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "gram length must be >= 1")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"gram_md5_hashes expects a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, false)

  override def nullSafeEval(s: Any): Any =
    WinnowFunctions.gramHashes(s.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.WinnowFunctions.gramHashes($s, $k);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Native robust-winnowing window selection — VALUE-IDENTICAL to the
  * aggregate-lambda form it replaces in `docWinnowCore`: for each of the
  * `size(hs) − w + 1` sliding windows, the RIGHTMOST position of the
  * window minimum (ties keep the later index, the `<=` fold); a doc
  * shorter than w grams selects its global rightmost minimum; positions
  * are 1-based, distinct, ascending. O(n·w) with one boolean mark array —
  * no per-window struct allocation, no interpreted fold.
  */
case class WinnowSelect(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, "window must be >= 1")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_select expects array<bigint>, got $t")
    }

  override def dataType: DataType = ArrayType(IntegerType, false)

  override def nullSafeEval(hs: Any): Any =
    WinnowFunctions.select(hs.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs =>
      s"${ev.value} = graft.functions.WinnowFunctions.select($hs, $w);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Native digest-input string for the winnow fingerprint — VALUE-IDENTICAL
  * to `array_join(transform(sel, p -> concat(p, ':', element_at(hs, p))),
  * ',')`: "pos:hash" joined by commas, empty string for an empty
  * selection (array_join's empty-array value). One StringBuilder pass
  * instead of an interpreted lambda + per-element string Columns.
  */
case class WinnowDigestString(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_digest expects (array<bigint>, array<int>), got $l / $r")
    }

  override def dataType: DataType = StringType

  override def nullSafeEval(hs: Any, sel: Any): Any =
    WinnowFunctions.digestString(hs.asInstanceOf[ArrayData], sel.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (hs, sel) =>
      s"${ev.value} = graft.functions.WinnowFunctions.digestString($hs, $sel);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object WinnowFunctions {
  private val emptyLongs = new GenericArrayData(new Array[Long](0))
  private val emptyInts = new GenericArrayData(new Array[Int](0))

  /** Shared by the interpreted and codegen paths. Positions in `sel` are
    * 1-based indexes into `hs` (the [[select]] contract). */
  def digestString(hs: ArrayData, sel: ArrayData): UTF8String = {
    val m = sel.numElements()
    if (m == 0) return UTF8String.EMPTY_UTF8
    val sb = new java.lang.StringBuilder(m * 24)
    var i = 0
    while (i < m) {
      if (i > 0) sb.append(',')
      val p = sel.getInt(i)
      sb.append(p).append(':').append(hs.getLong(p - 1))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Shared by the interpreted and codegen paths — one JIT-compiled loop.
    * 60-bit value = big-endian bytes 0–7 of the MD5 digest shifted right
    * 4, which is exactly `conv(substring(hex, 1, 15), 16, 10)`: 15
    * nibbles = bytes 0–6 plus the high nibble of byte 7.
    *
    * Zero per-gram allocation: the doc's UTF-8 bytes are materialized
    * once with a code-point→byte-offset index (gram p's bytes are
    * bytes[off(p), off(p+k)) — exactly `substring(p, p+k).getBytes`),
    * the digest fills a reused 16-byte buffer (digest(buf, off, len)
    * auto-resets), and only the output long array is allocated. Measured
    * against the per-gram substring/getBytes/digest() form as ~2× on the
    * doc_winnow/dedup_substring gram scans.
    */
  def gramHashes(s: UTF8String, k: Int): ArrayData = {
    val n = s.numChars()
    if (n < k) return emptyLongs
    val bytes = s.getBytes
    // code-point start offsets; off(n) = total bytes
    val off = new Array[Int](n + 1)
    var b = 0
    var c = 0
    while (c < n) {
      off(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    off(n) = bytes.length
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = new Array[Byte](16)
    val out = new Array[Long](n - k + 1)
    var p = 0
    while (p <= n - k) {
      md.update(bytes, off(p), off(p + k) - off(p))
      md.digest(dig, 0, 16) // completes AND resets the digest
      val be =
        ((dig(0) & 0xffL) << 56) | ((dig(1) & 0xffL) << 48) |
        ((dig(2) & 0xffL) << 40) | ((dig(3) & 0xffL) << 32) |
        ((dig(4) & 0xffL) << 24) | ((dig(5) & 0xffL) << 16) |
        ((dig(6) & 0xffL) << 8) | (dig(7) & 0xffL)
      out(p) = be >>> 4
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Shared by the interpreted and codegen paths. */
  def select(hs: ArrayData, w: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return emptyInts
    val arr = hs.toLongArray()
    if (n < w) { // global rightmost argmin, 1-based
      var mp = 0
      var mh = arr(0)
      var i = 1
      while (i < n) {
        if (arr(i) <= mh) { mh = arr(i); mp = i }
        i += 1
      }
      return new GenericArrayData(Array(mp + 1))
    }
    val selected = new Array[Boolean](n)
    var cnt = 0
    var st = 0
    while (st + w <= n) {
      var mp = st
      var mh = arr(st)
      var i = st + 1
      while (i < st + w) {
        if (arr(i) <= mh) { mh = arr(i); mp = i }
        i += 1
      }
      if (!selected(mp)) { selected(mp) = true; cnt += 1 }
      st += 1
    }
    val out = new Array[Int](cnt)
    var i = 0
    var j = 0
    while (i < n) { // ascending by construction — matches array_sort
      if (selected(i)) { out(j) = i + 1; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** `gram_md5_hashes(text, k)` as a Column. */
  def gramMd5Hashes(text: Column, k: Int): Column =
    GraftColumnBridge.column(GramMd5Hashes(GraftColumnBridge.expression(text), k))

  /** `winnow_select(hs, w)` as a Column. */
  def winnowSelect(hs: Column, w: Int): Column =
    GraftColumnBridge.column(WinnowSelect(GraftColumnBridge.expression(hs), w))

  /** `winnow_digest(hs, sel)` as a Column. */
  def winnowDigest(hs: Column, sel: Column): Column =
    GraftColumnBridge.column(WinnowDigestString(
      GraftColumnBridge.expression(hs), GraftColumnBridge.expression(sel)))
}
