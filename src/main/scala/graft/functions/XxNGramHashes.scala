package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.Platform

/** Native xxhash64 over word k-grams: one long per window position, in
  * position order (length n−k+1; empty when n < k).
  *
  * Semantics are EXACTLY
  * `transform(sequence(1, size(toks) - k + 1),
  *    i -> xxhash64(concat_ws(' ', slice(toks, i, k))))`
  * (equivalence is spec-asserted): each window joins its non-null words
  * with single spaces — concat_ws skips nulls — and the joined UTF-8
  * bytes hash through Spark's own XXH64 with the xxhash64 expression's
  * seed (42). Callers layer `array_distinct` / `sort_array` /
  * `array_min` on top exactly as they did over the HOF form, so every
  * DuckDB oracle (which keeps string gram keys) is unaffected.
  *
  * Why a native Expression: the HOF form allocates a sliced array, a
  * concat'd UTF8String, and ~k interpreted lambda frames per window
  * position; this kernel decodes each word's bytes once and re-joins
  * windows into one reused buffer — the same per-row primitive-loop
  * rationale as PolyShingles, applied to the xxhash64 gram family
  * (decontaminate, substring dedup, MinHash shingles, n-gram Jaccard,
  * repetition gates).
  */
case class XxNGramHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        val kv = right.eval(null)
        if (kv != null && kv.asInstanceOf[Int] >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "xx_ngram_hashes expects a constant k >= 1")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"xx_ngram_hashes expects (array<string>, const int), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  private lazy val k: Int = right.eval(null).asInstanceOf[Int]

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "xx_ngram_hashes"

  override protected def nullSafeEval(arr: Any, kv: Any): Any =
    XxNGramHashes.compute(arr.asInstanceOf[ArrayData], kv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"${ev.value} = graft.functions.XxNGramHashes.compute($a, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): XxNGramHashes =
    copy(left = newLeft, right = newRight)
}

object XxNGramHashes {
  private val Seed = 42L

  /** Static entry shared by interpreted eval and generated code. */
  def compute(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val wb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      wb(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Long](n - k + 1)
    var buf = new Array[Byte](64)
    i = 0
    while (i <= n - k) {
      // concat_ws(' ', ...) over the window: nulls are skipped and the
      // separator lands between PRESENT words — including empty strings,
      // which contribute no bytes but still count as present
      var len = 0
      var present = 0
      var j = i
      while (j < i + k) {
        val w = wb(j)
        if (w != null) {
          val need = len + w.length + 1
          if (need > buf.length)
            buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
          if (present > 0) { buf(len) = ' '.toByte; len += 1 }
          System.arraycopy(w, 0, buf, len, w.length)
          len += w.length
          present += 1
        }
        j += 1
      }
      out(i) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, Seed)
      i += 1
    }
    new GenericArrayData(out)
  }
}
