package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_normalize(str, 'NFC'|'NFD'|'NFKC'|'NFKD')` — Unicode
  * normalization as a native codegen'd expression (the text-cleaning
  * pass every multilingual training corpus runs before tokenization and
  * fingerprinting: composed vs decomposed accents, fullwidth forms and
  * compatibility ligatures otherwise make byte-identical text hash and
  * dedup differently). Wraps `java.text.Normalizer` — the JDK's ICU-
  * derived implementation of UAX #15, stable public behavior — in the
  * same Expression + doGenCode shape as [[DotProduct]] so the call
  * stays inside whole-stage codegen (no UDF).
  *
  * The form is a FOLDABLE string literal, resolved once at analysis;
  * NFC is the cross-engine oracle-checkable form (DuckDB ships
  * `nfc_normalize`); the compatibility forms are spec-verified.
  * Null in ⇒ null out. */
case class GraftNormalize(left: Expression, right: Expression)
  extends BinaryExpression {

  private def child: Expression = left
  private def formExpr: Expression = right

  private lazy val formName: Option[String] = formExpr.eval() match {
    case s: UTF8String => Some(s.toString.toUpperCase(java.util.Locale.ROOT))
    case _ => None
  }
  private lazy val form: java.text.Normalizer.Form =
    java.text.Normalizer.Form.valueOf(formName.get)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_normalize expects a STRING, got ${child.dataType.sql}")
    else if (!formExpr.foldable || formExpr.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        "graft_normalize form must be a string literal")
    else if (!formName.exists(Set("NFC", "NFD", "NFKC", "NFKD")))
      TypeCheckResult.TypeCheckFailure(
        s"graft_normalize form must be one of NFC/NFD/NFKC/NFKD")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any, formIn: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, form))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, _) => {
      // the form is a literal — bake the enum constant into the code
      val f = s"java.text.Normalizer.Form.${form.name()}"
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($s.toString(), $f));""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftNormalize =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_normalize"
}
