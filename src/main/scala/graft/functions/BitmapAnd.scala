package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Byte-wise AND of two bitmap payloads — the INTERSECTION half Spark's
  * bitmap family lacks: the engine ships `bitmap_construct_agg` /
  * `bitmap_or_agg` / `bitmap_count` (build, union, cardinality) but no
  * way to intersect two bitmaps, which is the whole point of keeping
  * per-segment bitmaps around (audience overlap, retention cohorts,
  * cross-split membership) — set intersection becomes a register-width
  * AND over bucket-aligned 4 KB partials instead of a count-distinct
  * self-join over the raw keys.
  *
  * Result length is the MINIMUM of the two input lengths: a bit set
  * past the shorter payload exists in only one side, so it cannot be
  * in the intersection (Spark's bitmaps are fixed 4 KB per bucket, but
  * the function is total over arbitrary binary). Null input → null.
  */
case class BitmapAnd(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bitmap_and expects (binary, binary), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = BinaryType

  override def prettyName: String = "bitmap_and"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitmapAnd.compute(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BitmapAnd.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapAnd =
    copy(left = newLeft, right = newRight)
}

object BitmapAnd {
  /** Static entry shared by interpreted eval and generated code. */
  def compute(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val n = math.min(a.length, b.length)
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = (a(i) & b(i)).toByte; i += 1 }
    out
  }
}
