package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) — the canonicalization
  * step Spark's string family lacks entirely: "café" composed (U+00E9)
  * and decomposed (e + U+0301) are DIFFERENT byte strings to every
  * hash, join key, and dedup signature in the engine, so a corpus mixing
  * encoders silently splits identical documents. One pass through
  * `java.text.Normalizer` (the JDK's ICU-derived implementation; DuckDB
  * side uses its own `nfc_normalize` — both implement UAX #15, and the
  * llm_text_normalize op's CROSS-ENGINE contract is pinned on the ASCII
  * fixture where every form is the identity, with non-ASCII behavior
  * spec-asserted against JDK-computed goldens).
  *
  * The form argument must be a constant — the normalizer form is a
  * plan-time property, not data. Null string → null.
  */
case class UnicodeNormalize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) if right.foldable =>
        val f = right.eval(null)
        if (f != null && UnicodeNormalize.forms.contains(f.toString)) {
          TypeCheckResult.TypeCheckSuccess
        } else {
          TypeCheckResult.TypeCheckFailure(
            s"unicode_normalize form must be one of " +
              s"${UnicodeNormalize.forms.mkString("/")}, got $f")
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize expects (string, const string form), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  private lazy val form: java.text.Normalizer.Form =
    java.text.Normalizer.Form.valueOf(right.eval(null).toString)

  override def dataType: DataType = StringType

  override def prettyName: String = "unicode_normalize"

  override protected def nullSafeEval(s: Any, f: Any): Any =
    UnicodeNormalize.compute(s.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("form", form,
      classOf[java.text.Normalizer.Form].getName)
    nullSafeCodeGen(ctx, ev, (s, _) =>
      s"${ev.value} = graft.functions.UnicodeNormalize.compute($s, $formRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UnicodeNormalize =
    copy(left = newLeft, right = newRight)
}

object UnicodeNormalize {
  val forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Static entry shared by interpreted eval and generated code.
    * Fast path: Normalizer.isNormalized is O(n) with no allocation and
    * true for every ASCII string — the normalize allocation runs only
    * on rows that actually need it. */
  def compute(s: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }
}
