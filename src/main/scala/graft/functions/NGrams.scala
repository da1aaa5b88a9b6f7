package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst table function (the UDTF surface of SURVEY.md §2.11):
  * `ngrams(tokens, n)` generates one (pos, gram) row per word n-gram.
  *
  * Why a `Generator` and not explode-over-transform: the generator emits
  * rows directly from the unsafe ArrayData without first materializing an
  * intermediate array-of-strings per row — for a 100 TB corpus the
  * transform+explode formulation allocates every n-gram twice (once in
  * the built array, once in the exploded row), a generator allocates it
  * once. It also demonstrates the full extension path for table
  * functions: expression → `injectFunction` → `LATERAL VIEW`/`SELECT`
  * generator planning (`GenerateExec`, plan-asserted in
  * CustomSurfaceSpec).
  *
  * `n` must be a foldable positive integer — the output schema of a
  * generator is fixed at analysis time.
  */
case class NGrams(child: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, n)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n.foldable && n.dataType == IntegerType =>
      val nv = n.eval().asInstanceOf[Int]
      if (nv >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"ngrams: n must be >= 1, got $nv")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"ngrams expects (array<string>, const int), got ${other.simpleString}")
  }

  private lazy val nv: Int = n.eval().asInstanceOf[Int]
  private val space = UTF8String.fromString(" ")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) Nil
    else {
      val a = arr.asInstanceOf[ArrayData]
      val len = a.numElements()
      if (len < nv) Nil
      else (0 to len - nv).iterator.flatMap { i =>
        // a window containing a null element is skipped explicitly:
        // getUTF8String on a null UnsafeArrayData slot is undefined
        // behavior, and concatWs would otherwise silently shorten the
        // gram. split() never produces nulls, but user arrays can.
        val words = new Array[UTF8String](nv)
        var j = 0
        var hasNull = false
        while (j < nv && !hasNull) {
          if (a.isNullAt(i + j)) hasNull = true
          else words(j) = a.getUTF8String(i + j)
          j += 1
        }
        if (hasNull) None
        else Some(InternalRow(i, UTF8String.concatWs(space, words: _*)))
      }
    }
  }

  override def prettyName: String = "ngrams"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NGrams =
    copy(child = newChildren(0), n = newChildren(1))
}
