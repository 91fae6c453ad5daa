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

/** `graft_shingles(text, n, distinct)` — the tokenize → n-gram →
  * (optionally) first-occurrence-dedup kernel behind
  * `TextFunctions.wordShingles` / `wordNgrams`, as ONE native per-row
  * expression. The composed form
  * (`array_distinct(filter(zip_with(zip_with(filter(split(lower(...`)
  * evaluates its higher-order lambdas per ELEMENT through the
  * interpreted HOF machinery and re-tokenizes per reference in the
  * zip_with fold — profiled as the single hottest CPU kernel of the
  * bench (the minhash/jaccard stage spent ~55 s of task CPU at sf0.1,
  * dominated by shingling, not hashing). This expression makes the same
  * values in one compiled pass per row (the `graft_hilbert` precedent:
  * hot per-row HOF folds become native expressions when they top the
  * bench).
  *
  * SEMANTIC TWIN CONTRACT (spec-pinned in `ShinglesExprSpec` against the
  * composed form on randomized unicode inputs): tokens are
  * `filter(split(lower(text), "\\s+"), length > 0)` — the SAME
  * UTF8String.toLowerCase and java.util.regex split the built-ins use —
  * windows of `n` consecutive tokens joined by one space, in order;
  * `distinct = true` keeps first occurrences only (array_distinct
  * semantics). `< n` tokens ⇒ empty array; null text ⇒ null. */
case class GraftShingles(first: Expression, second: Expression,
                         third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  private def textExpr: Expression = first
  private def nExpr: Expression = second
  private def distinctExpr: Expression = third

  private lazy val n: Int = nExpr.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case _ => -1
  }
  private lazy val dedup: Boolean = distinctExpr.eval() match {
    case b: Boolean => b
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (textExpr.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_shingles expects a STRING, got ${textExpr.dataType.sql}")
    else if (!nExpr.foldable ||
        !Seq[DataType](org.apache.spark.sql.types.IntegerType,
          org.apache.spark.sql.types.LongType).contains(nExpr.dataType) ||
        n < 1)
      TypeCheckResult.TypeCheckFailure(
        "graft_shingles n must be an integer literal >= 1")
    else if (!distinctExpr.foldable ||
        distinctExpr.dataType != org.apache.spark.sql.types.BooleanType)
      TypeCheckResult.TypeCheckFailure(
        "graft_shingles distinct must be a boolean literal")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(text: Any, nIn: Any, dIn: Any): Any =
    GraftShingles.compute(text.asInstanceOf[UTF8String], n, dedup)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _, _) => {
      s"""${ev.value} = graft.expressions.GraftShingles.compute(
         |  $t, $n, $dedup);""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): GraftShingles =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_shingles"
}

object GraftShingles {
  // the exact pattern the composed form compiles inside StringSplit
  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** One pass: lowercase (UTF8String.toLowerCase — the Lower built-in's
    * own kernel), regex-split, drop empties, join each n-window on one
    * space, optional first-occurrence dedup. Mirrors the byte-level
    * round-trips of the composed chain (split stringifies for the regex
    * exactly as UTF8String.split does). */
  def compute(text: UTF8String, n: Int, distinct: Boolean):
      org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val parts = ws.split(text.toLowerCase.toString, -1)
    var m = 0
    var i = 0
    while (i < parts.length) {        // compact non-empty tokens in place
      if (parts(i).nonEmpty) { parts(m) = parts(i); m += 1 }
      i += 1
    }
    val nOut = m - n + 1
    if (nOut <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](0))
    val out = new java.util.ArrayList[Any](nOut)
    val seen = if (distinct) new java.util.HashSet[String](nOut * 2) else null
    val sb = new java.lang.StringBuilder(64)
    i = 0
    while (i < nOut) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(parts(i + j))
        j += 1
      }
      val s = sb.toString
      if (seen == null || seen.add(s)) out.add(UTF8String.fromString(s))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}
