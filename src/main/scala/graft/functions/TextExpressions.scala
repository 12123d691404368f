package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization — a genuine
  * Spark gap: text pipelines need canonical composition before hashing or
  * dedup (a decomposed "é" = `e` + U+0301 and the precomposed U+00E9 are
  * byte-different but canonically equal, so every hash-keyed dedup op
  * silently misses such pairs), and Spark ships no normalizer builtin
  * while DuckDB has `nfc_normalize` (which serves as the oracle).
  *
  * `doGenCode` emits a direct `java.text.Normalizer` call, keeping the
  * projection inside WholeStageCodegen; ASCII-only strings take the
  * Normalizer's O(n) quick-check path with no allocation beyond the
  * round-trip, so the common case stays cheap.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_nfc expects string, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(java.text.Normalizer.normalize($c.toString(), " +
        "java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
