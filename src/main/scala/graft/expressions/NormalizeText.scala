package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Catalyst expression — the
  * canonicalization step a text-dedup key needs before hashing: the same
  * visible text arrives from the web in composed (U+00E9 `é`) and
  * decomposed (`e` + U+0301) forms, which hash differently unless
  * normalized. Spark ships no normalizer builtin; a UDF would box every
  * row on the dedup hot path, so this is expression path (b) from the
  * build plan (custom Expression with `doGenCode`).
  *
  * NFC (not NFKC) so the oracle can replicate byte-for-byte: DuckDB
  * exposes `nfc_normalize` with identical semantics — both sides
  * implement UAX #15 canonical composition.
  */
object NormalizeText {

  /** Pure normalize; called from interpreted and generated code. Fast
    * path: `Normalizer.isNormalized` is O(n) with no allocation, and
    * real-world corpora are overwhelmingly already-NFC. */
  def nfc(s: String): String =
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  /** Column-level entry point. */
  def nfc_normalize(s: Column): Column =
    Bridge.column(NormalizeTextExpr(Bridge.expression(s)))
}

case class NormalizeTextExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      NormalizeText.nfc(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.expressions.NormalizeText.nfc($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): NormalizeTextExpr =
    copy(child = newChild)
}
