package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native MinHash signature: k per-seed minima over an array of base
  * hashes, in one pass.
  *
  * Semantics are EXACTLY the per-seed HOF formulation
  * `array_min(transform(hs, x -> xxhash64(x, iL)))` for i in 0..k−1
  * (equivalence is spec-asserted): Spark's two-argument xxhash64 folds
  * its children through a running seed — hashLong(i, hashLong(x, 42)) —
  * so the kernel hashes each element once with seed 42 and then re-mixes
  * that value with each seed index, taking the running minimum. An empty
  * input yields k nulls, matching array_min over an empty array.
  *
  * Why a native Expression: the HOF form walks the hash array k=32
  * times through interpreted lambdas, allocating a transformed array per
  * seed per row; this is one |hs|·k primitive loop with a k-long
  * accumulator — the signature build was the dominant map cost of the
  * MinHash-LSH dedup path.
  */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) if right.foldable =>
        val kv = right.eval(null)
        if (kv != null && kv.asInstanceOf[Int] >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure("minhash_sig expects a constant k >= 1")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects (array<bigint>, const int), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  private lazy val k: Int = right.eval(null).asInstanceOf[Int]

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(arr: Any, kv: Any): Any =
    MinHashSig.compute(arr.asInstanceOf[ArrayData], kv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"${ev.value} = graft.functions.MinHashSig.compute($a, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSig =
    copy(left = newLeft, right = newRight)
}

object MinHashSig {
  private val Seed = 42L

  /** Static entry shared by interpreted eval and generated code. */
  def compute(hs: ArrayData, k: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](k))
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      // a null element mirrors the HOF form exactly: xxhash64 SKIPS null
      // children, so the running hash stays at the initial seed and only
      // the seed index folds in (the internal caller, xx_ngram_hashes,
      // never produces nulls — this is the general-SQL-surface contract)
      val h0 =
        if (hs.isNullAt(i)) Seed else XXH64.hashLong(hs.getLong(i), Seed)
      var s = 0
      while (s < k) {
        val v = XXH64.hashLong(s.toLong, h0)
        if (v < mins(s)) mins(s) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
