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

  // Ragged inputs are tolerated, not truncated: buffers grow to the
  // longest vector seen and absent trailing dims contribute 0 to the sum
  // (they still divide by the full row count in finish). Growth only
  // copies when a longer vector actually arrives, so the fixed-dim common
  // case stays allocation-free per row.
  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    val sums =
      if (b._1.length >= v.length) b._1
      else java.util.Arrays.copyOf(b._1, v.length)
    var i = 0
    while (i < v.length) {
      sums(i) += v(i)
      i += 1
    }
    (sums, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    val (longer, shorter) =
      if (a._1.length >= b._1.length) (a._1, b._1) else (b._1, a._1)
    var i = 0
    while (i < shorter.length) { longer(i) += shorter(i); i += 1 }
    (longer, a._2 + b._2)
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.empty else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
