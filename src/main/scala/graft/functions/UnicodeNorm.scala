package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode NFC normalization — the first rewrite of any text
  * pipeline that ingests real-world encodings: composes combining
  * sequences (`e` + U+0301 → `é`) so that equality, hashing, dedup
  * fingerprints, and tokenizers see one canonical byte form. Without it,
  * visually identical documents hash apart and survive every dedup pass.
  *
  * A per-row scalar (no shuffle, no state), so it scales with the scan;
  * `Normalizer.isNormalized` short-circuits the common all-ASCII /
  * already-composed row without allocating, which on a mostly-NFC corpus
  * makes the pass nearly free. Stays inside WholeStageCodegen via a
  * static call — no UDF serialization, no Row boxing.
  *
  * Mirrors DuckDB's `nfc_normalize` (the oracle) exactly: both defer to
  * the same Unicode canonical-composition tables.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects STRING, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  def apply(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))

  /** Static kernel shared by eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
