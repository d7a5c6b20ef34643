package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two float-array columns with a double
  * accumulator, summed in ascending index order.
  *
  * Exists because the composable form —
  * `aggregate(zip_with(a, b, _ * _), 0d, _ + _)` — runs as interpreted
  * HigherOrderFunction lambdas (per-element closure dispatch + boxing,
  * outside whole-stage codegen). This expression emits a tight primitive
  * loop via `doGenCode`, keeping vector similarity inside codegen; it is
  * the hot inner op of every pairwise similarity operator
  * ([[graft.pipeline.Knn]]). Same op order ⇒ bit-identical results to the
  * lambda form and the DuckDB oracle.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // accept both containsNull variants (parquet-derived columns are often
    // array<float NOT NULL>); element nulls are rejected at eval time below
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i))
        throw new IllegalArgumentException(
          "vec_dot: null array elements are not defined for a dot product")
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "vec_dot: null array elements are not defined for a dot product");
         |  }
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VecFunctions {
  /** `vec_dot(a, b)` as a Column. */
  def vecDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      FloatVecDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** `pq_encode(embedding, cb)` as a Column ([[PqEncode]]). */
  def pqEncode(emb: Column, cb: Column, m: Int, k: Int, subDim: Int): Column =
    GraftColumnBridge.column(
      PqEncode(GraftColumnBridge.expression(emb), GraftColumnBridge.expression(cb), m, k, subDim))
}

/** Product-quantization encoder: `embedding` (array<float>, m·subDim dims)
  * against a (j, k)-sorted codebook array of `struct(j, k, cvec, cc)`
  * entries (`cc` = ‖cvec‖², [[graft.pipeline.Knn]]'s `pqCodebookToArray`
  * layout) → the m nearest-code indices, one per subspace, as array<int>.
  *
  * Argmin of squared L2 per subspace, computed exactly as the expression
  * form it replaced — dist = (svv − 2.0·dot) + cc with every dot a
  * double-accumulated ascending-index loop ([[FloatVecDot]]'s order), ties
  * to the lowest code via strict `<` — so codes, downstream ADC sums, and
  * the DuckDB-oracle hashes are unchanged. (−0.0 ties cannot arise:
  * IEEE-754 `a + (−a)` is +0.0, so dist is never −0.0.)
  *
  * Exists because the unrolled expression form — per subspace a
  * `greatest()` over PqK structs each containing a dot — generated
  * ~100 KB of fused Java for PqM × PqK = 128 candidates, blowing Janino's
  * 64 KB method limit: every stage it appeared in (PQ training AND the
  * IVFPQ scan) silently fell back to interpreted execution. One compact
  * static-call site keeps whole-stage codegen alive at any (m, k).
  */
case class PqEncode(left: Expression, right: Expression, m: Int, k: Int, subDim: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val embOk = left.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val cbOk = right.dataType match {
      case ArrayType(_: org.apache.spark.sql.types.StructType, _) => true
      case _ => false
    }
    if (embOk && cbOk) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects (array<float>, array<struct>), got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType, false)

  override def nullSafeEval(a: Any, b: Any): Any =
    PqEncode.encode(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], m, k, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PqEncode.encode($a, $b, $m, $k, $subDim);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object PqEncode {
  /** Shared by the interpreted and codegen paths — one JIT-compiled loop. */
  def encode(emb: ArrayData, cb: ArrayData, m: Int, kk: Int, subDim: Int): ArrayData = {
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val base = j * subDim
      var svv = 0.0
      var i = 0
      while (i < subDim) {
        val x = emb.getFloat(base + i).toDouble
        svv += x * x
        i += 1
      }
      var best = Double.PositiveInfinity
      var bestK = 0
      var k = 0
      while (k < kk) {
        val ent = cb.getStruct(j * kk + k, 4)
        val cvec = ent.getArray(2)
        var dot = 0.0
        var i2 = 0
        while (i2 < subDim) {
          dot += emb.getFloat(base + i2).toDouble * cvec.getFloat(i2).toDouble
          i2 += 1
        }
        val dist = (svv - 2.0 * dot) + ent.getDouble(3)
        if (dist < best) { best = dist; bestK = k }
        k += 1
      }
      codes(j) = bestK
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }
}
