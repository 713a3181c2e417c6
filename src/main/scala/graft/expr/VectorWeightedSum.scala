package graft.expr

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Σᵢ sᵢ·xᵢ over (float-vector, double-weight) rows — the matrix-vector
  * product step of distributed power iteration / Oja updates, as ONE
  * typed aggregate. Folding the scale into the aggregator's reduce loop
  * avoids materializing a scaled copy of every row's array first (an
  * interpreted higher-order `transform` per row — the allocation THEN
  * aggregate shape costs ~2× the aggregate alone). Accumulates in
  * double; buffer is one fixed-dim double array per group, so map-side
  * combine keeps shuffle traffic at O(groups), not O(rows). */
object VectorWeightedSum
    extends Aggregator[(Seq[Float], Double), Array[Double], Seq[Double]] {

  override def zero: Array[Double] = Array.empty[Double]

  /** Ragged guard as in [[VectorMean]]: grow to the max seen length
    * rather than crash the task on a corrupt row. */
  private def grown(acc: Array[Double], n: Int): Array[Double] =
    if (acc.length >= n) acc else java.util.Arrays.copyOf(acc, n)

  override def reduce(b: Array[Double], a: (Seq[Float], Double)): Array[Double] = {
    val (x, s) = a
    if (x == null) b
    else {
      val acc = grown(b, x.length)
      var i = 0
      while (i < x.length) { acc(i) += x(i) * s; i += 1 }
      acc
    }
  }

  override def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
    if (x.isEmpty) y
    else if (y.isEmpty) x
    else {
      val acc = grown(x, y.length)
      var i = 0
      while (i < y.length) { acc(i) += y(i); i += 1 }
      acc
    }
  }

  override def finish(b: Array[Double]): Seq[Double] = b.toSeq

  override def bufferEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()

  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}
