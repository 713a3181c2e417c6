package graft.expr

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Element-wise mean of float vectors (embedding centroid per group) —
  * the custom typed aggregate SURVEY.md §4 anticipates. Accumulates in
  * double: at 100 TB a float32 accumulator would lose precision after
  * ~2^24 rows per group; the buffer is one 64-dim double array + count
  * per group, so partial aggregation (map-side combine) keeps shuffle
  * traffic at O(groups), not O(rows). */
object VectorMean extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), a: Seq[Float]): (Array[Double], Long) = {
    if (a == null) b
    else {
      val acc = if (b._1.isEmpty) new Array[Double](a.length) else b._1
      var i = 0
      while (i < a.length) { acc(i) += a(i); i += 1 }
      (acc, b._2 + 1)
    }
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    if (x._1.isEmpty) y
    else if (y._1.isEmpty) x
    else {
      var i = 0
      while (i < x._1.length) { x._1(i) += y._1(i); i += 1 }
      (x._1, x._2 + y._2)
    }
  }

  override def finish(b: (Array[Double], Long)): Seq[Double] =
    if (b._2 == 0L) Seq.empty else b._1.map(_ / b._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}
