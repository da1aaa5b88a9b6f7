package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native 32-bit SimHash fold over two 16-bit hash families.
  *
  * Semantics are EXACTLY the higher-order-function formulation in
  * `LlmExtended.simhashExpr` (equivalence is spec-asserted): for each
  * half, bit b of the fingerprint is set iff the majority of that
  * family's hashes have bit b set (strictly positive counter), the
  * second half shifted left 16. Pure integer math, so the DuckDB oracle
  * — which replicates the HOF formulation — is unaffected.
  *
  * Why a native Expression: the HOF formulation allocates a 16-element
  * counter array per shingle per row (`aggregate` × `zip_with`) and
  * evaluates interpreted lambdas ~52·16 times per document; this
  * expression runs one tight primitive loop inside whole-stage codegen.
  * Same reasoning as `CosineSimilarity` — hot-path vector math is the
  * place custom Catalyst code pays for itself.
  */
case class SimHash32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash32 expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash32"

  private def half(arr: ArrayData, shift: Int): Long = {
    val c = new Array[Int](16)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val v = arr.getLong(i)
      var b = 0
      while (b < 16) {
        c(b) += (if (((v >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 16) {
      if (c(b) > 0) fp += (1L << (b + shift))
      b += 1
    }
    fp
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    half(a.asInstanceOf[ArrayData], 0) + half(b.asInstanceOf[ArrayData], 16)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def halfCode(arr: String, shift: Int, out: String): String = {
        val c = ctx.freshName("c")
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val v = ctx.freshName("v")
        val bb = ctx.freshName("b")
        s"""
           |int[] $c = new int[16];
           |int $n = $arr.numElements();
           |for (int $i = 0; $i < $n; $i++) {
           |  long $v = $arr.getLong($i);
           |  for (int $bb = 0; $bb < 16; $bb++) {
           |    $c[$bb] += ((($v >> $bb) & 1L) == 1L) ? 1 : -1;
           |  }
           |}
           |for (int $bb = 0; $bb < 16; $bb++) {
           |  if ($c[$bb] > 0) $out += (1L << ($bb + $shift));
           |}
         """.stripMargin
      }
      s"""
         |${ev.value} = 0L;
         |${halfCode(a, 0, ev.value.toString)}
         |${halfCode(b, 16, ev.value.toString)}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimHash32 =
    copy(left = newLeft, right = newRight)
}
