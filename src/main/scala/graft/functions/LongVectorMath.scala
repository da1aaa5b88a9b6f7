package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native integer-vector kernels over `array<bigint>` columns — the exact
  * (fixed-point) twins of [[CosineSimilarity]]'s float kernel.
  *
  * Why Expressions: Spark's higher-order functions
  * (`aggregate(zip_with(...))`) evaluate their lambdas INTERPRETED, one
  * boxed element at a time, and allocate the zipped intermediate array
  * per row — measured 71 s for the k-means assign at the 10× scale probe
  * (3.1 M rows × 64 dims) where this codegen'd primitive loop runs the
  * identical exact-integer arithmetic in ~2 s. Both kernels enforce
  * equal lengths loudly (a silent min-length fold would miscount) and
  * stay inside whole-stage codegen.
  *
  * Overflow discipline (callers' quantization bounds): squared distance
  * at the 10⁶ fixed-point scale is ≤ 64·(1.2·10⁶)² ≈ 9.3·10¹³ and the
  * 10³-scale dot is ≤ 64·(6·10²)² ≈ 2.4·10⁷ — both far inside Long.
  */
private[graft] trait LongVectorKernel extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  protected def lengthError(nx: Int, ny: Int): Nothing =
    throw new IllegalArgumentException(
      s"$prettyName: array lengths differ ($nx vs $ny)")
}

/** Σ (a_i − b_i)² over two equal-length bigint arrays. */
case class SquaredDistanceLong(left: Expression, right: Expression)
    extends LongVectorKernel {

  override def prettyName: String = "squared_distance"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    if (nx != ny) lengthError(nx, ny)
    var i = 0; var s = 0L
    while (i < nx) {
      val d = x.getLong(i) - y.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val dd = ctx.freshName("dd")
      val s = ctx.freshName("s")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |if ($nx != $ny) {
         |  throw new IllegalArgumentException(
         |    "squared_distance: array lengths differ (" + $nx + " vs " + $ny + ")");
         |}
         |long $s = 0L;
         |for (int $i = 0; $i < $nx; $i++) {
         |  long $dd = $a.getLong($i) - $b.getLong($i);
         |  $s += $dd * $dd;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredDistanceLong =
    copy(left = newLeft, right = newRight)
}

/** Σ a_i·b_i over two equal-length bigint arrays. */
case class DotProductLong(left: Expression, right: Expression)
    extends LongVectorKernel {

  override def prettyName: String = "dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    if (nx != ny) lengthError(nx, ny)
    var i = 0; var s = 0L
    while (i < nx) {
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val s = ctx.freshName("s")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |if ($nx != $ny) {
         |  throw new IllegalArgumentException(
         |    "dot_long: array lengths differ (" + $nx + " vs " + $ny + ")");
         |}
         |long $s = 0L;
         |for (int $i = 0; $i < $nx; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)
}
