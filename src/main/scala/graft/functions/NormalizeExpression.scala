package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for web corpora — the step before any
  * hashing/dedup/tokenization sees the text: the same visible string
  * arrives from different sources precomposed (é = U+00E9) or decomposed
  * (e + U+0301), and without canonical normalization exact dedup treats
  * them as different documents.
  *
  *  - NFC canonical composition always (java.text.Normalizer — JDK
  *    built-in, no external libs);
  *  - `stripAccents = true` additionally removes combining marks
  *    (NFD → drop Mn codepoints → NFC), the fold used for accent-blind
  *    matching. Non-decomposable letters (ø, æ, ß) pass through — this
  *    is canonical-mark removal, not ICU transliteration, matching
  *    DuckDB's `strip_accents` on the Latin range so the gate can oracle
  *    it.
  *
  * Map-side scalar; supplementary codepoints handled (codepoint
  * iteration, not char). Full codegen via the shared static kernel, so
  * the text_clean/text_unicode projections stay in whole-stage codegen. */
case class NormalizeText(child: Expression, stripAccents: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"normalize_text expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "normalize_text"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String], stripAccents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.NormalizeText.normalize($v, $stripAccents)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  /** The normalization kernel, shared by eval and generated code. */
  def normalize(input: UTF8String, stripAccents: Boolean): UTF8String = {
    import java.text.Normalizer
    val s = input.toString
    val nfc = Normalizer.normalize(s, Normalizer.Form.NFC)
    val out =
      if (!stripAccents) nfc
      else {
        val nfd = Normalizer.normalize(nfc, Normalizer.Form.NFD)
        val sb = new java.lang.StringBuilder(nfd.length)
        nfd.codePoints().forEach { cp =>
          if (Character.getType(cp) != Character.NON_SPACING_MARK)
            sb.appendCodePoint(cp)
        }
        Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
      }
    UTF8String.fromString(out)
  }
}
