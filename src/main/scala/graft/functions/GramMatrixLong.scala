package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: exact integer Gram matrix Σ q·qᵀ (upper triangle, row-major
  * over the full D×D layout) plus per-dimension column sums and the row
  * count — the one-pass sufficient statistics for covariance/PCA prep
  * over an embedding column.
  *
  * The buffer is a single flat Array[Long] of D² + D + 1 slots
  * ([gram | colsums | n]); reduce is the tight j ≥ i double loop in JVM
  * code — ~D²/2 multiply-adds per row with zero allocation — and merge is
  * element-wise add, exactly the shape Spark needs for map-side partial
  * aggregation: at 100 TB every partition collapses to one 33 KB buffer
  * before the shuffle and the reducer merges |partitions| buffers. All
  * arithmetic is exact BIGINT (inputs quantized to 10³ by the caller:
  * |q| ≤ 600 ⇒ per-row product ≤ 3.6·10⁵, safe past 10¹² rows).
  *
  * Inputs shorter than D contribute only their own dims (absent trailing
  * dims are zero); longer inputs fold their first D dims — D is the
  * contract dimension of the embeddings table (64).
  */
object GramMatrixLong extends Aggregator[Seq[Long], Array[Long], (Seq[Long], Seq[Long], Long)] {

  val D = 64
  private val G = D * D

  override def zero: Array[Long] = new Array[Long](G + D + 1)

  override def reduce(b: Array[Long], v: Seq[Long]): Array[Long] = {
    if (v != null) {
      val a = v.toArray
      val m = math.min(D, a.length)
      var i = 0
      while (i < m) {
        val qi = a(i)
        val row = i * D
        var j = i
        while (j < m) { b(row + j) += qi * a(j); j += 1 }
        b(G + i) += qi
        i += 1
      }
      b(G + D) += 1L
    }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(r: Array[Long]): (Seq[Long], Seq[Long], Long) =
    (r.view.slice(0, G).toSeq, r.view.slice(G, G + D).toSeq, r(G + D))

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[(Seq[Long], Seq[Long], Long)] =
    ExpressionEncoder[(Seq[Long], Seq[Long], Long)]()
}
