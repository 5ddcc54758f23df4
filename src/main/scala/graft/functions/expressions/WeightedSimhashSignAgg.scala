package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.ImperativeAggregate
import org.apache.spark.sql.types._

/** Weighted-SimHash signature in ONE fixed-width aggregate — replaces
  * the r15-and-earlier form of `Dedup.weightedSimhash`'s per-document
  * groupBy carrying 32 SEPARATE `sum(when(bit_j, w).otherwise(-w))`
  * DECIMAL(38,12) buffers (each update = 32 when-branches and 32
  * BigDecimal adds per (doc, term) row — the measured x99/x170 cold
  * build cost).
  *
  * Exactness contract (bit-for-bit vs the decimal form, pinned by an
  * ExtSpec property test): the per-term weight is tf·idf with idf
  * quantized once to DECIMAL(28,12), i.e. an EXACT integer at scale
  * 10^-12. The caller passes that integer (`idfScaled` = unscaled idf)
  * and tf as longs; the product tf·idfScaled is computed in 128-bit
  * (Math.multiplyHigh) and accumulated per bit as an exact signed
  * 128-bit sum — the same integers the decimal sums hold (decimal(38,12)
  * sums are exact unscaled-integer sums at the same scale). The
  * signature bit j is set iff that bit's total is STRICTLY positive,
  * matching `when(sum > 0, 1<<j)`. Headroom: |Σ| < 2^127 ≈ 1.7e26 at
  * scale 12 — beyond it the decimal form overflows precision 38 to null
  * (bit silently 0) first, so the int128 form strictly dominates the
  * exact range.
  *
  * Physical shape: 2·bits LongType buffer slots — a fixed-width
  * UnsafeRow buffer, so the aggregate runs in HashAggregateExec with
  * map-side partial merge (NOT ObjectHashAggregate with its 128-key
  * sort fallback). Null inputs do not occur at the call site (inner
  * join of tf and idf); they are skipped defensively like sum(). */
case class WeightedSimhashSignAgg(
    h: Expression, tf: Expression, idfScaled: Expression, bits: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends ImperativeAggregate {

  require(bits >= 1 && bits <= 60,
    s"weightedSimhashSignAgg: bits=$bits not in [1,60]")

  override def children: Seq[Expression] = Seq(h, tf, idfScaled)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "weighted_simhash_sign_agg"

  override def aggBufferSchema: StructType =
    StructType(aggBufferAttributes.map(a =>
      StructField(a.name, a.dataType, a.nullable)))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(h = newChildren(0), tf = newChildren(1), idfScaled = newChildren(2))

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)

  override val aggBufferAttributes: Seq[AttributeReference] =
    (0 until bits).flatMap(j => Seq(
      AttributeReference(s"hi$j", LongType, nullable = false)(),
      AttributeReference(s"lo$j", LongType, nullable = false)()))

  override val inputAggBufferAttributes: Seq[AttributeReference] =
    aggBufferAttributes.map(_.newInstance())

  override def initialize(buffer: InternalRow): Unit = {
    var i = 0
    while (i < 2 * bits) {
      buffer.setLong(mutableAggBufferOffset + i, 0L)
      i += 1
    }
  }

  /** 128-bit add of (ahi, alo) += (bhi, blo); lo is the unsigned low
    * word. Carry = unsigned overflow of the low add. */
  @inline private def addInto(buffer: InternalRow, base: Int, j: Int,
      bhi: Long, blo: Long): Unit = {
    val iLo = base + 2 * j + 1
    val iHi = base + 2 * j
    val alo = buffer.getLong(iLo)
    val newLo = alo + blo
    // unsigned carry-out of alo + blo (Hacker's Delight 2-13)
    val carry = ((alo & blo) | ((alo | blo) & ~newLo)) >>> 63
    buffer.setLong(iLo, newLo)
    buffer.setLong(iHi, buffer.getLong(iHi) + bhi + carry)
  }

  override def update(buffer: InternalRow, input: InternalRow): Unit = {
    val hv = h.eval(input)
    val tfv = tf.eval(input)
    val iv = idfScaled.eval(input)
    if (hv == null || tfv == null || iv == null) return
    val hash = hv.asInstanceOf[Long]
    val a = tfv.asInstanceOf[Long]
    val b = iv.asInstanceOf[Long]
    // signed 128-bit product tf·idfScaled and its negation
    val pLo = a * b
    val pHi = Math.multiplyHigh(a, b)
    val nLo = -pLo
    val nHi = if (pLo == 0L) -pHi else ~pHi
    var j = 0
    while (j < bits) {
      if (((hash >>> j) & 1L) == 1L)
        addInto(buffer, mutableAggBufferOffset, j, pHi, pLo)
      else
        addInto(buffer, mutableAggBufferOffset, j, nHi, nLo)
      j += 1
    }
  }

  override def merge(buffer: InternalRow, inputBuffer: InternalRow): Unit = {
    var j = 0
    while (j < bits) {
      addInto(buffer, mutableAggBufferOffset, j,
        inputBuffer.getLong(inputAggBufferOffset + 2 * j),
        inputBuffer.getLong(inputAggBufferOffset + 2 * j + 1))
      j += 1
    }
  }

  override def eval(buffer: InternalRow): Any = {
    var sig = 0L
    var j = 0
    while (j < bits) {
      val hi = buffer.getLong(mutableAggBufferOffset + 2 * j)
      val lo = buffer.getLong(mutableAggBufferOffset + 2 * j + 1)
      // strictly positive 128-bit value: hi > 0, or hi == 0 with a
      // non-zero (unsigned) low word
      if (hi > 0L || (hi == 0L && lo != 0L)) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
