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

object TextFunctions {

  val histType: DataType = ArrayType(StructType(Seq(
    StructField("ch", StringType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)

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
}
