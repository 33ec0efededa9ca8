package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column as a native Catalyst
  * expression — `nfc_normalize(text)`, callable from `spark.sql` via
  * [[GraftExtensions]] exactly like DuckDB's built-in of the same name.
  *
  * Why custom (builder preference order (b)): Spark has NO built-in
  * Unicode-normalization function, and the alternative — a Scala UDF
  * over `java.text.Normalizer` — breaks whole-stage codegen and pays
  * Row boxing per value. This expression participates in codegen via a
  * static call and short-circuits on the overwhelmingly common case: a
  * cheap `Normalizer.isNormalized` probe (one pass, no allocation)
  * skips the rebuild for text that is already NFC — at 100 TB of mostly
  * ASCII web text the normalize pass allocates nothing for ~all rows.
  *
  * Canonical-equivalence dedup is the use case: exact-hash dedup
  * ([[graft.operators.Dedup]]) treats `é` (U+00E9) and `e`+U+0301 as
  * different documents unless text is NFC-normalized first — the
  * standard first step of every web-corpus pipeline (the reference
  * normalizes on ingest; here it is a first-class engine function).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  protected override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** NFC-normalize one value. `isNormalized` is a no-allocation scan;
    * only rows that actually contain decomposed sequences pay the
    * String round-trip. */
  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) text
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }
}
