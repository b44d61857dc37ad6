package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize(str)` — Unicode NFC (canonical composition) as a
  * codegen'd scalar Catalyst expression.
  *
  * Why: text normalization is the FIRST stage of every real corpus
  * pipeline (composed vs decomposed accents — "é" vs "e"+U+0301 —
  * hash differently, so every dedup/fingerprint/shingle operator here
  * silently misses pairs on mixed-normalization corpora). Spark has no
  * builtin; a Scala UDF would box every row and fence off whole-stage
  * codegen, while this expression inlines a static call into the
  * generated code and stays inside the codegen span (the engine's
  * stated extension preference: native Expression > UDF).
  *
  * NFC (not NFKC) deliberately: canonical composition is lossless and
  * idempotent; compatibility folding (ligatures, width) changes
  * content and belongs to an explicit caller decision.
  *
  * Cross-engine: DuckDB's `nfc_normalize` implements the same Unicode
  * normal form, so oracle parity is the standard itself (NFC is
  * stabilized — normalization of assigned codepoints never changes
  * across Unicode versions).
  *
  * The already-normalized fast path (the overwhelmingly common case —
  * all-ASCII is normalized by definition) returns the INPUT UTF8String:
  * no java.lang.String round-trip allocation.
  */
@ExpressionDescription(
  usage = "_FUNC_(str) - Returns str in Unicode Normalization Form C.")
case class NfcNormalize(child: Expression)
  extends UnaryExpression {

  // manual check (the TopKByScore pattern) — ExpectsInputTypes'
  // AbstractDataType is private[sql]
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize argument must be string, got " +
        child.dataType.catalogString)

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  /** Static kernel shared by interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val j = s.toString
    if (java.text.Normalizer.isNormalized(j, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(j, java.text.Normalizer.Form.NFC))
  }
}
