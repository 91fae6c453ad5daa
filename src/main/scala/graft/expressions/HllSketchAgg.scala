package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `graft_hll_regs(hash60, m)` — HyperLogLog register sketch as a TRUE
  * Spark partial aggregate (`TypedImperativeAggregate`): the buffer is
  * the m-byte register array itself, map-side partials fold rows into
  * registers locally, and the shuffle carries ONE m-byte blob per group
  * instead of the frame formulation's up-to-m `(group, reg, rho)` rows
  * (and needs no per-group `distinct` at all — duplicates cannot raise
  * a register max).
  *
  * Register semantics are BIT-IDENTICAL to the frame-based
  * [[graft.functions.Hll.registers]] (the cross-engine oracle twin):
  * the input is the same md5-prefix 60-bit hash (`Dedup.Md5Hasher`),
  * register = low log2(m) bits, rho = (60−p+1) − bitlen(hash >>> p)
  * clamped at `Hll.RhoCap`, zero registers read 0. `eval` returns the
  * full register array (`array<int>`, length m) so the estimator math
  * stays in one shared place ([[graft.functions.Hll.estimateFromRegs]]).
  *
  * merge = element-wise max — the HLL mergeability property, which is
  * exactly Spark's partial/final aggregate contract, so the sketch
  * composes with `rollup`/`cube`/grouping sets for free (vocab_hll's
  * `__all` row is the rollup grand total — one pass, no second scan).
  *
  * `m` must be a power-of-2 literal in [16, 4096] (the [[graft.functions.Hll]]
  * domain); rho ≤ 31 always fits the byte buffer. Null hashes are
  * skipped (SQL aggregate null semantics). */
case class HllSketchAgg(
    child: Expression,
    mExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  // Option so a foldable-but-null m (e.g. CAST(NULL AS INT)) surfaces as
  // a TypeCheckFailure in checkInputDataTypes instead of a runtime error
  private lazy val mOpt: Option[Int] = mExpr.eval() match {
    case i: Int  => Some(i)
    case l: Long => Some(l.toInt)
    case _       => None
  }
  private lazy val m: Int =
    mOpt.getOrElse(sys.error("graft_hll_regs: m rejected by analysis"))
  private lazy val p: Int = 63 - java.lang.Long.numberOfLeadingZeros(m.toLong)
  private lazy val rhoCap: Int = graft.functions.Hll.RhoCap

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_hll_regs expects a BIGINT hash, got ${child.dataType.sql}")
    else if (!mExpr.foldable ||
      (mExpr.dataType != IntegerType && mExpr.dataType != LongType))
      TypeCheckResult.TypeCheckFailure(
        "graft_hll_regs m must be an integral literal")
    else if (mOpt.isEmpty)
      TypeCheckResult.TypeCheckFailure(
        "graft_hll_regs m must be a non-null integral literal")
    else if (m < 16 || m > 4096 || (m & (m - 1)) != 0)
      TypeCheckResult.TypeCheckFailure(s"m=$m not a power of 2 in [16,4096]")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val reg = (h & (m - 1)).toInt
      val w = h >>> p
      // bitlen(w) = 64 − nlz(w); matches length(bin(w)) in both engines
      val rho =
        if (w == 0L) 60 - p + 1
        else 60 - p + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      val clamped = math.min(rho, rhoCap).toByte
      if (clamped > buffer(reg)) buffer(reg) = clamped
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = {
    // primitive fast path: no per-register boxing (m ints at once)
    val ints = new Array[Int](buffer.length)
    var i = 0
    while (i < buffer.length) { ints(i) = buffer(i).toInt; i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(ints)
  }

  // the register array IS its own wire format
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, mExpr)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = newChildren(0), mExpr = newChildren(1))

  override def prettyName: String = "graft_hll_regs"
}
