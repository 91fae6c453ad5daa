package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** `graft_hilbert(x, y, bits)` — 2-D Hilbert-curve distance of (x, y) on a
  * 2^bits × 2^bits grid, as a native codegen'd Catalyst expression.
  *
  * Why not the `aggregate` HOF fold ([[graft.operators.Layout]]'s
  * reference implementation): higher-order functions evaluate interpreted
  * (outside WholeStageCodegen) and materialize a `sequence(bits-1, 0, -1)`
  * array per ROW just to drive the loop — on a corpus-wide layout pass
  * that interpreter overhead IS the runtime (layout_hilbert was a top-5
  * bench cost). This compiles to a 16-iteration tight loop over two longs
  * with a 16-entry DFA table.
  *
  * Semantics contract: BIT-IDENTICAL to the HOF fold (`hilbertValueHof`)
  * and to the classic rotate-and-recurse xy2d loop — same DFA table
  * (index = state·4 + xBit·2 + yBit, value = digit·4 + nextState),
  * MSB-first, pinned by `LayoutSpec`/`DotProductSpec`-style parity tests.
  * Inputs must be non-negative and fit `bits` bits (the Layout.zValue
  * contract); `bits` must be a foldable literal in [1, 31].
  *
  * Nulls: any null input → null (TernaryExpression null-safe contract). */
case class HilbertIndex(first: Expression, second: Expression,
                        third: Expression) extends TernaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable

  /** index = state·4 + xBit·2 + yBit → digit·4 + nextState; derived from
    * (and property-tested against) the classic xy2d algorithm — the same
    * table as `Layout.hilbertTable`, duplicated here because generated
    * code cannot reach a `private[graft]` member (parity pinned by spec). */
  private val table: Array[Long] =
    Array(1L, 4L, 14L, 8L, 0L, 15L, 5L, 9L, 10L, 6L, 12L, 3L, 11L, 13L, 7L, 2L)

  override def checkInputDataTypes(): TypeCheckResult = {
    def intLike(dt: DataType) = dt == LongType || dt == IntegerType
    if (!intLike(first.dataType) || !intLike(second.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_hilbert expects integral x/y, got ${first.dataType.sql}, " +
          second.dataType.sql)
    else if (!third.foldable || !intLike(third.dataType))
      TypeCheckResult.TypeCheckFailure("graft_hilbert bits must be an " +
        "integral literal")
    else {
      val b = bitsValue
      if (b >= 1 && b <= 31) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"bits=$b outside [1, 31]")
    }
  }

  private lazy val bitsValue: Int = third.eval() match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => sys.error(s"non-integral bits literal: $other")
  }

  private def toLong(v: Any): Long = v match {
    case i: Int  => i.toLong
    case l: Long => l
  }

  override def nullSafeEval(xv: Any, yv: Any, bv: Any): Any = {
    val x = toLong(xv); val y = toLong(yv)
    var d = 0L
    var state = 0L
    var i = bitsValue - 1
    while (i >= 0) {
      val idx = (state * 4 + ((x >> i) & 1L) * 2 + ((y >> i) & 1L)).toInt
      val p = table(idx)
      d = (d << 2) | (p >> 2)
      state = p & 3L
      i -= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val tab = ctx.addReferenceObj("hilbertTable", table, "long[]")
    nullSafeCodeGen(ctx, ev, (x, y, _) => {
      val d = ctx.freshName("d")
      val st = ctx.freshName("st")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      s"""
         |long $d = 0L;
         |long $st = 0L;
         |for (int $i = $bitsValue - 1; $i >= 0; $i--) {
         |  long $p = $tab[(int) ($st * 4L + (((long) $x >> $i) & 1L) * 2L
         |      + (((long) $y >> $i) & 1L))];
         |  $d = ($d << 2) | ($p >> 2);
         |  $st = $p & 3L;
         |}
         |${ev.value} = $d;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): HilbertIndex =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_hilbert"
}
