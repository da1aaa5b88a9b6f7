package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

  /** Whether the STATIC type admits null elements. ArrayData.getLong
    * silently returns garbage for a null slot, so every kernel guards —
    * but only when the type says a null can exist: parquet/transform
    * arrays are routinely containsNull=true even when no value ever is,
    * and the check must cost nothing on provably-non-null inputs. */
  protected def elemsNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _                => true
  }

  protected def nullElemError(): Nothing =
    throw new IllegalArgumentException(s"$prettyName: null array element")

  /** Codegen fragment guarding element `i` of array variable `a` (empty
    * when the static type already forbids null elements). */
  protected def nullGuard(nullable: Boolean, a: String, i: String): String =
    if (!nullable) ""
    else
      s"""if ($a.isNullAt($i)) {
         |  throw new IllegalArgumentException("$prettyName: null array element");
         |}""".stripMargin
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
      if (x.isNullAt(i) || y.isNullAt(i)) nullElemError()
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
         |  ${nullGuard(elemsNullable(left), a, i)}
         |  ${nullGuard(elemsNullable(right), b, i)}
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
      if (x.isNullAt(i) || y.isNullAt(i)) nullElemError()
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
         |  ${nullGuard(elemsNullable(left), a, i)}
         |  ${nullGuard(elemsNullable(right), b, i)}
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)
}

/** Unnormalized fast Walsh-Hadamard transform of a 64-long bigint
  * array: y = H·x with H[j][k] = (−1)^popcount(j&k), computed by the
  * 6-stage butterfly (64·6 adds) instead of the 64×64 matrix fold
  * (4096 multiply-adds) — and codegen'd, because the SQL-HOF spelling
  * of even the naive fold measured ~285 s at the 10× probe tier
  * (interpreted lambdas, boxed elements) where this loop is a scan-cost
  * rounding error. Unnormalized keeps every coordinate an exact BIGINT
  * (‖y‖² = 64·‖x‖² — callers divide energy readouts by 64 once, on
  * positive totals). Overflow: |y_i| ≤ 64·max|x| — callers' lattice
  * bounds (≤ ~10⁹ here) stay far inside Long. */
case class Fwht64(child: Expression) extends UnaryExpression {

  override def prettyName: String = "fwht64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fwht64 expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != 64)
      throw new IllegalArgumentException(
        s"fwht64: expected 64 elements, got ${x.numElements()}")
    val v = new Array[Long](64)
    var i = 0
    while (i < 64) {
      if (x.isNullAt(i))
        throw new IllegalArgumentException("fwht64: null array element")
      v(i) = x.getLong(i); i += 1
    }
    var h = 1
    while (h < 64) {
      var base = 0
      while (base < 64) {
        var j = base
        while (j < base + h) {
          val a0 = v(j); val b0 = v(j + h)
          v(j) = a0 + b0; v(j + h) = a0 - b0
          j += 1
        }
        base += 2 * h
      }
      h *= 2
    }
    new GenericArrayData(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val v = ctx.freshName("v")
      val h = ctx.freshName("h")
      val base = ctx.freshName("base")
      val j = ctx.freshName("j")
      val a0 = ctx.freshName("a0")
      val b0 = ctx.freshName("b0")
      val i = ctx.freshName("i")
      s"""
         |if ($a.numElements() != 64) {
         |  throw new IllegalArgumentException(
         |    "fwht64: expected 64 elements, got " + $a.numElements());
         |}
         |long[] $v = new long[64];
         |for (int $i = 0; $i < 64; $i++) {
         |  ${if (child.dataType.asInstanceOf[ArrayType].containsNull)
              s"""if ($a.isNullAt($i)) {
                 |  throw new IllegalArgumentException("fwht64: null array element");
                 |}""".stripMargin
            else ""}
         |  $v[$i] = $a.getLong($i);
         |}
         |for (int $h = 1; $h < 64; $h *= 2) {
         |  for (int $base = 0; $base < 64; $base += 2 * $h) {
         |    for (int $j = $base; $j < $base + $h; $j++) {
         |      long $a0 = $v[$j]; long $b0 = $v[$j + $h];
         |      $v[$j] = $a0 + $b0; $v[$j + $h] = $a0 - $b0;
         |    }
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($v);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Fwht64 =
    copy(child = newChild)
}

/** ColBERT-style MaxSim over two 64-long bigint arrays viewed as 8
  * token vectors × 8 dims (contiguous slices): Σ_{i<8} max_{j<8}
  * ⟨q[8i..), d[8j..)⟩ — 512 multiply-adds fused in one codegen'd loop
  * (the SQL-HOF spelling interprets three nested lambdas per row).
  * Overflow: each 8-dim lattice dot ≤ 8·(2·10⁶)² ≈ 3.2·10¹³, the sum
  * of 8 maxima ≤ 2.6·10¹⁴ — far inside Long. */
case class MaxSim8(left: Expression, right: Expression)
    extends LongVectorKernel {

  override def prettyName: String = "maxsim8"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != 64 || y.numElements() != 64)
      throw new IllegalArgumentException(
        s"maxsim8: expected 64 elements, got " +
          s"(${x.numElements()}, ${y.numElements()})")
    var p = 0
    while (p < 64) {
      if (x.isNullAt(p) || y.isNullAt(p)) nullElemError()
      p += 1
    }
    var total = 0L
    var i = 0
    while (i < 8) {
      var best = Long.MinValue
      var j = 0
      while (j < 8) {
        var dot = 0L
        var k = 0
        while (k < 8) {
          dot += x.getLong(i * 8 + k) * y.getLong(j * 8 + k)
          k += 1
        }
        if (dot > best) best = dot
        j += 1
      }
      total += best
      i += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val total = ctx.freshName("total")
      val best = ctx.freshName("best")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val p = ctx.freshName("p")
      val guards = (elemsNullable(left), elemsNullable(right)) match {
        case (false, false) => ""
        case (ln, rn) =>
          s"""for (int $p = 0; $p < 64; $p++) {
             |  ${nullGuard(ln, a, p)}
             |  ${nullGuard(rn, b, p)}
             |}""".stripMargin
      }
      s"""
         |if ($a.numElements() != 64 || $b.numElements() != 64) {
         |  throw new IllegalArgumentException(
         |    "maxsim8: expected 64 elements, got (" + $a.numElements()
         |      + ", " + $b.numElements() + ")");
         |}
         |$guards
         |long $total = 0L;
         |for (int $i = 0; $i < 8; $i++) {
         |  long $best = Long.MIN_VALUE;
         |  for (int $j = 0; $j < 8; $j++) {
         |    long $dot = 0L;
         |    for (int $k = 0; $k < 8; $k++) {
         |      $dot += $a.getLong($i * 8 + $k) * $b.getLong($j * 8 + $k);
         |    }
         |    if ($dot > $best) $best = $dot;
         |  }
         |  $total += $best;
         |}
         |${ev.value} = $total;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MaxSim8 =
    copy(left = newLeft, right = newRight)
}
