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

  /** Embeddings are fixed-dimension by contract; a ragged vector (data
    * corruption) must not crash the task — the accumulator grows to the
    * max seen length and shorter inputs contribute to their prefix. */
  private def grown(acc: Array[Double], n: Int): Array[Double] =
    if (acc.length >= n) acc else java.util.Arrays.copyOf(acc, n)

  override def reduce(b: (Array[Double], Long), a: Seq[Float]): (Array[Double], Long) = {
    if (a == null) b
    else {
      val acc = grown(b._1, a.length)
      var i = 0
      while (i < a.length) { acc(i) += a(i); i += 1 }
      (acc, b._2 + 1)
    }
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    if (x._1.isEmpty) y
    else if (y._1.isEmpty) x
    else {
      val acc = grown(x._1, y._1.length)
      var i = 0
      while (i < y._1.length) { acc(i) += y._1(i); i += 1 }
      (acc, x._2 + y._2)
    }
  }

  override def finish(b: (Array[Double], Long)): Seq[Double] =
    if (b._2 == 0L) Seq.empty else b._1.map(_ / b._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}
