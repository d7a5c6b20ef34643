package graft.plans

import graft.functions.FloatVecDot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native expressions
  * for SQL users. Activate with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or call
  * [[GraftExtensions.register]] on an existing session) — after which
  * `SELECT vec_dot(a.embedding, b.embedding)` runs the codegen'd
  * [[FloatVecDot]] directly in Spark SQL.
  *
  * The reference has no SQL surface at all (SURVEY.md §3); this is the
  * idiomatic Spark attachment point so the engine's custom kernels are
  * available to every frontend (SQL, DataFrame, Connect) without imports.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.vecDotDescriptor)
  }
}

object GraftExtensions {
  private[graft] val vecDotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
    (children: Seq[Expression]) => FloatVecDot(children(0), children(1)))

  /** Imperative registration on a live session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      vecDotDescriptor._1, vecDotDescriptor._2, vecDotDescriptor._3)
}
