package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst intersection-size over two ASCENDING-SORTED bigint
  * arrays — the verification kernel of every set-similarity join
  * (Jaccard = |∩| / (|A| + |B| − |∩|)).
  *
  * Why an Expression: the built-in `size(array_intersect(a, b))` builds
  * a hash set AND an output array per row, then throws the array away to
  * take its size. The similarity joins keep signature arrays pre-sorted
  * (dedupNgram sorts once at signature build), so the intersection SIZE
  * is a single allocation-free two-pointer merge over the unsafe array
  * data — at 100 TB the verify step runs over millions of candidate
  * pairs and this is the difference between a merge loop and a per-pair
  * hash build. Generates a tight primitive loop inside whole-stage
  * codegen (plan-asserted in CustomSurfaceSpec).
  *
  * Both inputs MUST be sorted ascending (as
  * `sort_array(array_distinct(...))` produces). The function is also
  * registered on the public SQL surface, so the precondition is
  * ENFORCED, not assumed: a full monotonicity sweep precedes the merge
  * (in-merge checks alone miss inversions past the pointer where the
  * shorter side runs out) — still branch-predictable long compares with
  * zero allocation, and a wrong-input call fails loudly instead of
  * silently undercounting. Null input → null (BinaryExpression
  * default); null elements unsupported (signature arrays are dense).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_intersect_count"

  private def unsorted(): Nothing =
    throw new IllegalArgumentException(
      "sorted_intersect_count: input arrays must be sorted ascending")

  private def checkAscending(a: ArrayData): Unit = {
    val n = a.numElements()
    var i = 1
    while (i < n) {
      if (a.getLong(i) < a.getLong(i - 1)) unsorted()
      i += 1
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    checkAscending(x); checkAscending(y)
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xi = x.getLong(i)
      val yj = y.getLong(j)
      if (xi == yj) { c += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      val c = ctx.freshName("c")
      val k = ctx.freshName("k")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |for (int $k = 1; $k < $nx; $k++) {
         |  if ($a.getLong($k) < $a.getLong($k - 1)) {
         |    throw new IllegalArgumentException(
         |      "sorted_intersect_count: input arrays must be sorted ascending");
         |  }
         |}
         |for (int $k = 1; $k < $ny; $k++) {
         |  if ($b.getLong($k) < $b.getLong($k - 1)) {
         |    throw new IllegalArgumentException(
         |      "sorted_intersect_count: input arrays must be sorted ascending");
         |  }
         |}
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xi = $a.getLong($i);
         |  long $yj = $b.getLong($j);
         |  if ($xi == $yj) { $c++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
