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

/** `graft_md5long(str)` — the md5-prefix 60-bit long
  * (`Dedup.Md5Hasher.md5Long`) as ONE native expression:
  * `(('0x'||hex[1..7])::LONG << 32) | ('0x'||hex[9..16])::LONG`
  * computed straight from the digest bytes — no hex string, no
  * substring, no base-16 parse, and the MessageDigest is reused per
  * thread (the built-in `md5` allocates one per row via
  * commons-codec). Value-identical to the composed form by bit
  * arithmetic: hex chars 1–7 are bytes 0–2 plus the high nibble of
  * byte 3; hex chars 9–16 are bytes 4–7 unsigned.
  * `Md5LongExprSpec` pins equality against the composed built-ins.
  * Null in ⇒ null out. */
case class GraftMd5Long(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_md5long expects a STRING, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    GraftMd5Long.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expressions.GraftMd5Long.compute($s);")

  override protected def withNewChildInternal(
      newChild: Expression): GraftMd5Long = copy(child = newChild)

  override def prettyName: String = "graft_md5long"
}

object GraftMd5Long {
  private[expressions] val digests =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  def compute(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val b = md.digest(s.getBytes)
    // hex[0..6] = b0, b1, b2, high nibble of b3 (28 bits)
    val hi = ((b(0) & 0xFFL) << 20) | ((b(1) & 0xFFL) << 12) |
      ((b(2) & 0xFFL) << 4) | ((b(3) & 0xFFL) >>> 4)
    // hex[8..15] = b4..b7 as an unsigned 32-bit value
    val lo = ((b(4) & 0xFFL) << 24) | ((b(5) & 0xFFL) << 16) |
      ((b(6) & 0xFFL) << 8) | (b(7) & 0xFFL)
    (hi << 32) | lo
  }
}

/** `graft_md5prefix(str, hexChars)` — the long value of the FIRST
  * `hexChars` md5 hex characters, i.e. the native twin of
  * `conv(substring(md5(s), 1, hexChars), 16, 10)` computed straight from
  * the digest bytes: no hex string, no substring, no base-16 parse, and
  * the MessageDigest is reused per thread (the built-in `md5` allocates
  * one per row). This is the per-row kernel behind every md5-derived
  * bucket/noise stream (`Sampling.stableBucket`, `Dsir.featureBucket`,
  * Gumbel noise, DP noise) — per-TOKEN hot in the DSIR feature hasher.
  * `hexChars` must be a foldable INT in [1, 15] (≤ 60 bits, so the value
  * can never overflow a signed long and any BIGINT engine recomputes it
  * exactly). `Md5PrefixExprSpec` pins equality against the composed
  * built-ins. Null in ⇒ null out. */
case class GraftMd5Prefix(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_md5prefix expects a STRING, got ${left.dataType.sql}")
    else if (right.dataType != org.apache.spark.sql.types.IntegerType ||
        !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_md5prefix expects a foldable INT hexChars")
    else right.eval() match {
      case n: java.lang.Integer if n >= 1 && n <= 15 =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_md5prefix hexChars must be in [1, 15], got $other")
    }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(s: Any, n: Any): Any =
    GraftMd5Prefix.compute(s.asInstanceOf[UTF8String],
      n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n) =>
      s"${ev.value} = graft.expressions.GraftMd5Prefix.compute($s, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftMd5Prefix =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_md5prefix"
}

object GraftMd5Prefix {
  def compute(s: UTF8String, hexChars: Int): Long = {
    val md = GraftMd5Long.digests.get()
    md.reset()
    val b = md.digest(s.getBytes)
    // nibble i of the digest IS hex char i (high nibble first)
    var v = 0L
    var i = 0
    while (i < hexChars) {
      val byte = b(i >> 1) & 0xFF
      v = (v << 4) | (if ((i & 1) == 0) byte >>> 4 else byte & 0xF)
      i += 1
    }
    v
  }
}
