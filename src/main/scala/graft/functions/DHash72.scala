package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Native difference-hash (dHash) over a binary blob: the 64-bit
  * perceptual fingerprint for the multimodal dedup family
  * (llm_dedup_phash — the image twin of llm_dedup_simhash).
  *
  * Semantics (exact integer, engine-replayable): the blob is "resized"
  * to a 9×8 grid by splitting its UNSIGNED bytes into 72 equal
  * segments — segment g covers byte offsets [g·len/72, (g+1)·len/72)
  * (integer division) — with pixel g = segment mean at 10⁴ fixed point
  * (sum·10⁴ div seglen). Then the classic dHash: bit b of each 32-bit
  * half is set iff pixel(r·9+c+1) > pixel(r·9+c) for r = b div 8
  * (+4 for the low half), c = b mod 8 — 8 horizontal comparisons × 8
  * rows = 64 bits. Returns array<bigint> [hi, lo]; NULL for blobs
  * shorter than 72 bytes (no 9×8 downsample exists — a real image
  * decode always yields ≥ 9×8 pixels).
  *
  * The byte-segment mean is the deterministic stand-in for a grayscale
  * resize: a production pipeline decodes real image bytes (the
  * llm_media_decode mapPartitions seat) and feeds this same kernel its
  * pixel rows. The DuckDB oracle replays the identical formula from
  * hex digits.
  *
  * Why a native Expression: the HOF formulation (transform over 72
  * segment aggregates over a transform'd byte array) is inlined by
  * CollapseProject into every reference site — the 64 bit-comparisons
  * each re-derive the full pixel array, which re-derives the byte
  * array: O(64·72·len) per row, measured minutes-for-seconds at
  * sf0.01. This is one primitive JVM pass (O(len + 72·9)) inside
  * whole-stage codegen — the same argument as SimHash32/PolyShingles.
  */
case class DHash72(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dhash72 expects binary, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "dhash72"

  override protected def nullSafeEval(input: Any): Any =
    DHash72.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.DHash72.compute($c);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): DHash72 =
    copy(child = newChild)
}

object DHash72 {

  /** Static entry shared by interpreted eval and generated code.
    * Returns null when the blob is shorter than 72 bytes. */
  def compute(blob: Array[Byte]): ArrayData = {
    val len = blob.length
    if (len < 72) return null
    val px = new Array[Long](72)
    var g = 0
    while (g < 72) {
      val s = (g.toLong * len / 72).toInt
      val e = ((g + 1).toLong * len / 72).toInt
      var sum = 0L
      var i = s
      while (i < e) { sum += (blob(i) & 0xff); i += 1 }
      px(g) = sum * 10000L / (e - s)
      g += 1
    }
    var hi = 0L
    var lo = 0L
    var b = 0
    while (b < 32) {
      val r = b / 8
      val c = b % 8
      if (px(r * 9 + c + 1) > px(r * 9 + c)) hi |= (1L << b)
      if (px((r + 4) * 9 + c + 1) > px((r + 4) * 9 + c)) lo |= (1L << b)
      b += 1
    }
    new GenericArrayData(Array[Any](hi, lo))
  }
}
