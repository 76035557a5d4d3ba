package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode-normalization scalar expression for text-curation pipelines.
 *
 * Web-crawled corpora mix composed (NFC) and decomposed (NFD) encodings of
 * the same visible text — "é" as U+00E9 vs U+0065 U+0301 — which silently
 * defeats exact dedup (different byte strings, identical content) and
 * inflates token counts. Canonicalizing to NFC before fingerprinting is a
 * standard first step of an LLM ingest pipeline, and the reference's
 * ASCII-only key handling (MerkonDatabase.cs:30 compares raw strings)
 * makes it a capability extension, not a port.
 *
 * Implemented as a codegen'd Catalyst expression (not a UDF) so it stays
 * inside whole-stage codegen in scan-heavy ingest plans: the generated
 * code calls the static [[NfcNormalize.normalize]] helper directly, with
 * no closure dispatch or row boxing. The helper short-circuits on the
 * common case — `Normalizer.isNormalized` is a cheap scan that avoids
 * allocating for already-NFC (in practice: almost all) input, so at 100 TB
 * the op costs one ASCII-fast-path pass per string, not a rewrite.
 *
 * Registered as SQL function `nfc_normalize` by [[graft.GraftExtensions]]
 * (same name and semantics as DuckDB's `nfc_normalize`, which is the
 * oracle for `text_normalize_nfc`).
 */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.catalogString}")
    }

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.normalize(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry point shared by interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
