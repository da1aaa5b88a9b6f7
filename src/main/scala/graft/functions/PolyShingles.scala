package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native distinct poly-31 hash array over word 3-shingles.
  *
  * Semantics are EXACTLY the higher-order-function formulation in
  * `LlmExtended.shingleHashExpr` (equivalence is spec-asserted):
  * each word char-folds once to (h, p) = (poly-31 hash, 31^len) mod
  * 1e9+7 over its Unicode CODE POINTS (split('x','') is code-point-wise
  * and ascii() returns the full code point — verified against Spark
  * 4.1.2), empty words are the (0, 1) identity, shingle i composes
  * h(w_i · ' ' · w_{i+1} · ' ' · w_{i+2}) via four modular multiply-adds
  * over the word summaries (' ' = code point 32), and the result is
  * deduplicated keeping FIRST-OCCURRENCE order — the array_distinct
  * contract. Fewer than 3 words ⇒ empty array. All products stay below
  * M² ≈ 1e18 < 2⁶³.
  *
  * Why a native Expression: the HOF tree allocates a struct per word and
  * runs ~6 interpreted lambda evaluations per character; this is one
  * primitive JVM pass per row (measured 6 s → well under 1 s for the
  * 50 k-doc probe corpus). The DuckDB oracles keep the naive per-shingle
  * char-fold formulation and are unaffected.
  */
case class PolyShingles(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_shingles expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "poly_shingles"

  override protected def nullSafeEval(input: Any): Any =
    PolyShingles.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyShingles.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): PolyShingles =
    copy(child = newChild)
}

/** POSITIONAL twin of poly_shingles: the same per-shingle poly-31 hash,
  * one per position WITHOUT deduplication — position i of the output is
  * the hash of shingle (w_i, w_{i+1}, w_{i+2}). Winnowing-style
  * fingerprint selection (llm_dedup_winnow) needs the positional
  * sequence: its window minima are taken over CONSECUTIVE shingles, so
  * dropping repeats would silently merge windows. Equivalence contract:
  * array_distinct(poly_shingles_seq(t)) == poly_shingles(t)
  * (spec-asserted). */
case class PolyShinglesSeq(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_shingles_seq expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "poly_shingles_seq"

  override protected def nullSafeEval(input: Any): Any =
    PolyShingles.computeSeq(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyShingles.computeSeq($c);")

  override protected def withNewChildInternal(newChild: Expression): PolyShinglesSeq =
    copy(child = newChild)
}

object PolyShingles {
  private val M = 1000000007L

  /** Static entry shared by interpreted eval and generated code. */
  def compute(toks: ArrayData): ArrayData = computeImpl(toks, distinct = true)

  /** Positional (non-distinct) twin — poly_shingles_seq. */
  def computeSeq(toks: ArrayData): ArrayData = computeImpl(toks, distinct = false)

  private def computeImpl(toks: ArrayData, distinct: Boolean): ArrayData = {
    val n = toks.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Long])
    val h = new Array[Long](n)
    val p = new Array[Long](n)
    var i = 0
    while (i < n) {
      // a null token hashes like '' (the identity) — split() never emits
      // nulls, so this is belt-and-braces, matching ascii(NULL) guards
      val w = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      var hw = 0L
      var pw = 1L
      if (w != null) {
        val s = w.toString
        var idx = 0
        while (idx < s.length) {
          val cp = s.codePointAt(idx)
          idx += Character.charCount(cp)
          hw = (hw * 31 + cp) % M
          pw = (pw * 31) % M
        }
      }
      h(i) = hw
      p(i) = pw
      i += 1
    }
    val out = new Array[Long](n - 2)
    val seen =
      if (distinct) new java.util.HashSet[java.lang.Long](math.max(8, (n - 2) * 2))
      else null
    var k = 0
    i = 0
    while (i < n - 2) {
      var s = (h(i) * 31 + 32) % M
      s = (s * p(i + 1) + h(i + 1)) % M
      s = (s * 31 + 32) % M
      s = (s * p(i + 2) + h(i + 2)) % M
      if (seen == null || seen.add(s)) { out(k) = s; k += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }
}
