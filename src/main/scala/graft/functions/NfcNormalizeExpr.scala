package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical composition (NFC) of a string column — the
  * normalization a text pipeline MUST apply before any hash-based
  * operator sees the bytes: the same visible text arrives from the web
  * as either precomposed codepoints (é = U+00E9) or base + combining
  * marks (e + U+0301), and md5/MinHash/SimHash/winnowing all hash BYTES,
  * so un-normalized duplicates silently evade every dedup family.
  *
  * Codegen'd wrapper over `java.text.Normalizer` (public JDK, Unicode
  * UAX #15). The fast path costs one `isNormalized` scan: real corpora
  * are overwhelmingly already-NFC, and Normalizer.isNormalized is a
  * cheap quick-check pass that avoids allocating anything for them.
  * Cross-engine contract: equals DuckDB's `nfc_normalize(x)` (utf8proc)
  * — both implement the same Unicode canonical composition, which is
  * what keeps the oracle row value-exact. SQL names `graft_nfc` /
  * `graft_nfkc` (`compat = true` folds ligature/width/fraction
  * presentation forms on top of canonical composition). DuckDB exposes
  * no NFKC function, so the NFKC query's oracle is a hand-derived
  * literal table from the Unicode decomposition data (the multimodal
  * pixel-literal pattern) rather than an independent computation.
  */
case class NfcNormalizeExpr(child: Expression, compat: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  private def fn = if (compat) "nfkc" else "nfc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_$fn requires a string input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    if (compat) NfcNormalizeExpr.nfkc(input.asInstanceOf[UTF8String])
    else NfcNormalizeExpr.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalizeExpr.$fn($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[NfcNormalizeExpr].getName, "graft_nfc")
  val infoNfkc: ExpressionInfo = new ExpressionInfo(
    classOf[NfcNormalizeExpr].getName, "graft_nfkc")

  /** NFC-normalize; returns the INPUT object untouched when the string is
    * already normalized (the dominant case — no allocation, no copy). */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** NFKC (compatibility composition): folds ligatures/width/fraction
    * presentation forms (ﬁ → fi, ！ → !, ½ → 1⁄2) on top of canonical
    * composition — the aggressive form retrieval pipelines use. */
  def nfkc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFKC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFKC))
  }
}
