package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** `graft_dot(a, b)` — double-precision dot product of two numeric arrays,
  * as a native codegen'd Catalyst expression.
  *
  * Why not `aggregate(zip_with(...))`: higher-order functions evaluate
  * interpreted (outside WholeStageCodegen) and allocate an intermediate
  * array per row — on an all-pairs similarity join that is the entire
  * runtime. This expression compiles to a tight primitive loop.
  *
  * Arithmetic contract (differential-oracle parity): each element is
  * widened to double, products are accumulated sequentially left-to-right —
  * bit-identical to both the HOF fold it replaces and DuckDB's
  * `list_sum(list_transform(...))`.
  *
  * Nulls: null array → null result (BinaryExpression null-safe contract);
  * LENGTH-MISMATCHED arrays → null, matching the HOF fold (whose zip_with
  * null-padding nulls the whole sum) — a dimension mismatch in embeddings
  * surfaces instead of being silently truncated to min(len). Null ELEMENTS
  * are treated as 0.0 — embedding vectors don't contain null components;
  * documented divergence from the HOF version (which nulls the whole
  * result).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true // mismatched lengths yield null

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects numeric arrays, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  private def get(a: ArrayData, dt: DataType, i: Int): Double = dt match {
    case FloatType   => if (a.isNullAt(i)) 0.0 else a.getFloat(i).toDouble
    case DoubleType  => if (a.isNullAt(i)) 0.0 else a.getDouble(i)
    case IntegerType => if (a.isNullAt(i)) 0.0 else a.getInt(i).toDouble
    case LongType    => if (a.isNullAt(i)) 0.0 else a.getLong(i).toDouble
    case _           => 0.0
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val y = r.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val lt = elemType(left); val rt = elemType(right)
      val n = x.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += get(x, lt, i) * get(y, rt, i)
        i += 1
      }
      acc
    }
  }

  private def genGet(dt: DataType, arr: String, i: String): String = {
    val accessor = dt match {
      case FloatType   => s"(double) $arr.getFloat($i)"
      case DoubleType  => s"$arr.getDouble($i)"
      case IntegerType => s"(double) $arr.getInt($i)"
      case LongType    => s"(double) $arr.getLong($i)"
      case _           => "0.0"
    }
    s"($arr.isNullAt($i) ? 0.0 : $accessor)"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ${genGet(elemType(left), a, i)} * ${genGet(elemType(right), b, i)};
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}
