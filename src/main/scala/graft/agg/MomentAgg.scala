package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Buffer/result of [[MomentAgg]]: the flattened dim × dim outer-product
  * sum as one primitive long array (wrapped in a product so the encoder
  * surfaces it as an `array<bigint>` struct field, not opaque binary). */
case class MomentBuf(cells: Array[Long])

/** Exact integer second-moment accumulator: folds quantized vectors
  * (length-`dim` long arrays) into the flattened dim × dim outer-product
  * sum cells[i·dim + j] = Σ_v x_i · x_j.
  *
  * This is the dense-covariance kernel of [[graft.pipeline.Knn.embeddingPca]]
  * in the shape Spark executes best: an object-hash aggregate whose buffer
  * lives as ONE primitive long array per task (the [[BloomDistinct]]
  * pattern), updated in a tight j-inner loop — no dim²-row explode, no
  * interpreted higher-order lambdas (the pathology
  * [[graft.functions.FloatVecDot]] documents). Addition is associative and
  * commutative over exact BIGINTs, so partial buffers merge in any order
  * and the result is bit-identical to the row-explode formulation and to
  * the DuckDB pair-join oracle.
  *
  * Scale shape: per-task state is dim² longs (32 KiB at dim 64) however
  * many vectors the task folds; the shuffle moves one buffer per task.
  */
class MomentAgg(dim: Int) extends Aggregator[Array[Long], MomentBuf, MomentBuf] {
  override def zero: MomentBuf = MomentBuf(new Array[Long](dim * dim))

  override def reduce(b: MomentBuf, xs: Array[Long]): MomentBuf = {
    val cells = b.cells
    var i = 0
    while (i < dim) {
      val xi = xs(i)
      val base = i * dim
      var j = 0
      while (j < dim) { cells(base + j) += xi * xs(j); j += 1 }
      i += 1
    }
    b
  }

  override def merge(a: MomentBuf, b: MomentBuf): MomentBuf = {
    val (ac, bc) = (a.cells, b.cells)
    var k = 0
    while (k < ac.length) { ac(k) += bc(k); k += 1 }
    a
  }

  override def finish(b: MomentBuf): MomentBuf = b
  override def bufferEncoder: Encoder[MomentBuf] = Encoders.product[MomentBuf]
  override def outputEncoder: Encoder[MomentBuf] = Encoders.product[MomentBuf]
}
