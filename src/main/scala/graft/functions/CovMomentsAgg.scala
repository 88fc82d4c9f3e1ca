package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StructField, StructType}

/** Covariance moments (n, Σx, Σx·xᵀ) as ONE native aggregate — the
  * treeAggregate-shaped alternative to q318's per-row d² explode
  * (ann/PcaPower.covariance): the explode path drives every of the
  * n·d² outer-product cells through the aggregation hash machinery
  * (a row + a hash probe each), which is exact-decimal and
  * oracle-friendly but prohibitive CPU at d ≥ 256 (590k cells/row at
  * d=768). Here the outer product accumulates into a flat
  * double[d·d] inside `update` — a tight fused loop per row, zero
  * intermediate rows — and partials merge elementwise, so the plan
  * keeps Spark's partial/final aggregation (the treeAggregate
  * shape) with a d²-sized buffer instead of a d²-rows-per-input
  * stream.
  *
  * Trade (why the exact path stays the oracle-gated default): sums
  * are IEEE doubles, and partial-merge order is scheduler-dependent
  * — bit-level nondeterminism ~1 ulp. PcaPower re-quantizes each
  * covariance entry to 9dp before iterating, which absorbs it for
  * any well-conditioned input (spec-pinned agreement on the
  * fixture), but a cross-engine oracle cannot gate on "usually
  * equal". Engine-local fast path, exact path for parity.
  *
  * Buffer: ~8·(d+d²) bytes (d=768 → 4.7 MB) — executor-memory
  * bounded, never driver-collected (the moments row flows into the
  * covariance-table projection).
  */
object CovMoments {

  /** (n, s1[d], s2[d·d] row-major) over a float/double vector
    * column; inputs are 6dp-rounded first (the q318 scan
    * quantization, so both covariance paths see identical inputs).
    */
  def covMoments(v: Column): Column =
    column(CovMomentsAgg(expression(v)).toAggregateExpression())
}

final class CovBuffer(
    var n: Long,
    var s1: Array[Double],
    var s2: Array[Double])

case class CovMomentsAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CovBuffer] with UnaryLike {

  private lazy val elemFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"covMoments needs array<float|double>, got $other")
  }

  override def createAggregationBuffer(): CovBuffer =
    new CovBuffer(0L, null, null)

  override def update(buf: CovBuffer, input: InternalRow): CovBuffer = {
    val raw = child.eval(input)
    if (raw == null) return buf
    val a = raw.asInstanceOf[ArrayData]
    val d = a.numElements()
    if (d == 0) return buf
    if (buf.s1 == null) {
      buf.s1 = new Array[Double](d)
      buf.s2 = new Array[Double](d * d)
    }
    require(buf.s1.length == d,
      s"ragged vectors: ${buf.s1.length} vs $d")
    // 6dp quantization at the scan, matching the exact-decimal path
    val x = new Array[Double](d)
    var i = 0
    while (i < d) {
      val v = if (elemFloat) a.getFloat(i).toDouble else a.getDouble(i)
      // round-half-away-from-zero at 6dp, as Spark's round() does
      x(i) = if (v >= 0) math.floor(v * 1e6 + 0.5) / 1e6
        else -math.floor(-v * 1e6 + 0.5) / 1e6
      buf.s1(i) += x(i)
      i += 1
    }
    i = 0
    while (i < d) {
      val xi = x(i)
      val row = i * d
      var j = 0
      while (j < d) { buf.s2(row + j) += xi * x(j); j += 1 }
      i += 1
    }
    buf.n += 1
    buf
  }

  override def merge(buf: CovBuffer, other: CovBuffer): CovBuffer = {
    if (other.s1 == null) return buf
    if (buf.s1 == null) {
      buf.s1 = other.s1.clone(); buf.s2 = other.s2.clone()
      buf.n = other.n
      return buf
    }
    require(buf.s1.length == other.s1.length,
      s"ragged vectors: ${buf.s1.length} vs ${other.s1.length}")
    var i = 0
    while (i < buf.s1.length) { buf.s1(i) += other.s1(i); i += 1 }
    i = 0
    while (i < buf.s2.length) { buf.s2(i) += other.s2(i); i += 1 }
    buf.n += other.n
    buf
  }

  override def eval(buf: CovBuffer): Any =
    if (buf.s1 == null) null
    else InternalRow(buf.n, new GenericArrayData(buf.s1),
      new GenericArrayData(buf.s2))

  override def serialize(buf: CovBuffer): Array[Byte] = {
    val d = if (buf.s1 == null) 0 else buf.s1.length
    val bb = java.nio.ByteBuffer.allocate(16 + 8 * (d + d * d))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(buf.n).putInt(d).putInt(0)
    if (d > 0) {
      buf.s1.foreach(bb.putDouble)
      buf.s2.foreach(bb.putDouble)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CovBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = bb.getLong()
    val d = bb.getInt(); bb.getInt()
    if (d == 0) new CovBuffer(n, null, null)
    else {
      val s1 = Array.fill(d)(bb.getDouble())
      val s2 = Array.fill(d * d)(bb.getDouble())
      new CovBuffer(n, s1, s2)
    }
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s1", ArrayType(DoubleType, containsNull = false)),
    StructField("s2", ArrayType(DoubleType, containsNull = false))))
  override def nullable: Boolean = true
  override def prettyName: String = "cov_moments"
  override def withNewMutableAggBufferOffset(o: Int): CovMomentsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CovMomentsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CovMomentsAgg =
    copy(child = c)
}
