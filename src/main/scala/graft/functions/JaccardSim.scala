package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Exact set-Jaccard over two bigint arrays: |A∩B| / |A∪B| with both
  * inputs treated as SETS (duplicates collapse; element order is
  * irrelevant).
  *
  * This is the NAIVE similarity predicate a user writes in a brute
  * near-dup join — `jaccard_sim(a.hs, b.hs) >= 0.8` over per-document
  * shingle-hash arrays — and the expression `plans.JaccardLshRewrite`
  * pattern-matches to rescue that join out of its O(N²)
  * BNLJ/CartesianProduct plan into the MinHash-banded equi-join
  * `LlmOps.dedupNear` hand-writes. It is also the exact verification
  * filter the rescued plan keeps, so it must be correct on arbitrary
  * (unsorted, duplicate-carrying) inputs, unlike
  * `sorted_intersect_count`, whose sortedness precondition the
  * optimizer could not guarantee for user-written arrays.
  *
  * Mechanics: both sides are copied to primitive long[] and sorted
  * (no boxing, no hash set); one merge pass counts distinct
  * intersection and union sizes. Per-pair cost O((m+n)·log(m+n)) — at
  * 100 TB this runs only on LSH candidates, never all pairs.
  * Both empty → 0.0 by definition (avoids a 0/0 that ANSI SQL and
  * DuckDB each resolve differently). Null input → null; null elements
  * unsupported (hash arrays are dense).
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaccard_sim expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaccard_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaccardSim.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}

object JaccardSim {

  private def sortedDistinct(a: ArrayData): Array[Long] = {
    val n = a.numElements()
    val arr = new Array[Long](n)
    var i = 0
    while (i < n) { arr(i) = a.getLong(i); i += 1 }
    java.util.Arrays.sort(arr)
    // in-place dedup of the sorted run
    var w = 0
    i = 0
    while (i < n) {
      if (w == 0 || arr(i) != arr(w - 1)) { arr(w) = arr(i); w += 1 }
      i += 1
    }
    if (w == n) arr else java.util.Arrays.copyOf(arr, w)
  }

  /** Static entry shared by interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val x = sortedDistinct(a)
    val y = sortedDistinct(b)
    if (x.length == 0 && y.length == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < x.length && j < y.length) {
      val c = java.lang.Long.compare(x(i), y(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    inter.toDouble / (x.length + y.length - inter).toDouble
  }
}
