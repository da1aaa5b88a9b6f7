package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (§2.11 surface): element-wise mean of float vectors.
  *
  * Buffer is (sum-vector, count); merge is element-wise add — the shape
  * Spark needs for map-side partial aggregation, so at 100 TB each
  * partition collapses its rows into one 64-double buffer before the
  * shuffle and the reducer merges |partitions| buffers per group.
  */
object VectorMean extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    val sums = if (b._1.isEmpty) new Array[Double](v.length) else b._1
    var i = 0
    while (i < v.length && i < sums.length) {
      sums(i) += v(i)
      i += 1
    }
    (sums, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      val out = new Array[Double](a._1.length)
      var i = 0
      while (i < out.length) { out(i) = a._1(i) + b._1(i); i += 1 }
      (out, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.empty else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
