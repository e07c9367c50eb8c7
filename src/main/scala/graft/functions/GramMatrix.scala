package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One-pass Gram (second-moment) matrix of a vector column: a typed
  * Aggregator whose buffer is the running dim×dim sum of outer
  * products. This is the 100 TB shape for X'X: each task folds its
  * rows into a local d² buffer (map-side partial aggregation), and
  * the shuffle moves ONE d²-double buffer per partition — for d=64
  * that is 32 KiB per task regardless of row count, vs the ~4096×
  * row blowup a posexplode-twice formulation would shuffle. The
  * driver-side consumer (PCA / whitening, [[graft.operators.Vectors]])
  * then works on a d×d matrix, never on corpus-scale data.
  *
  * Accumulation is in double; the merge order varies with
  * partitioning, so consumers must round before any cross-engine
  * comparison (Text.roundPortable — the same contract every float
  * aggregate in the repo follows).
  */
class GramMatrix(dim: Int)
    extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {

  override def zero: Array[Double] = new Array[Double](dim * dim)

  override def reduce(b: Array[Double], v: Seq[Double]): Array[Double] = {
    if (v != null && v.length == dim) {
      val arr = v.toArray
      var j = 0
      while (j < dim) {
        val xj = arr(j)
        val row = j * dim
        var k = j // fill the upper triangle only; mirrored in finish
        while (k < dim) {
          b(row + k) += xj * arr(k)
          k += 1
        }
        j += 1
      }
    }
    b
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def finish(r: Array[Double]): Seq[Double] = {
    // mirror the upper triangle so consumers read a full symmetric
    // matrix without index gymnastics
    var j = 0
    while (j < dim) {
      var k = j + 1
      while (k < dim) { r(k * dim + j) = r(j * dim + k); k += 1 }
      j += 1
    }
    r.toSeq
  }

  override def bufferEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

object GramMatrix {
  /** Column form: gram(v) over an array<double> column; returns the
    * flattened row-major dim×dim matrix in a single row. */
  def apply(dim: Int, c: Column): Column = udaf(new GramMatrix(dim)).apply(c)
}
