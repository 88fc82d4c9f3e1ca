package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, DoubleType, FloatType, LongType, StructField, StructType}
import org.apache.spark.sql.types.Decimal

/** Covariance moments (n, Σx, Σx·xᵀ) as ONE native aggregate — the
  * treeAggregate-shaped alternative to q318's per-row d² explode
  * (ann/PcaPower.covariance): the explode path drives every of the
  * n·d² outer-product cells through the aggregation hash machinery
  * (a row + a hash probe each), which is prohibitive CPU at d ≥ 256
  * (590k cells/row at d=768). Here the outer product accumulates
  * into flat arrays inside `update` — a tight fused loop per row,
  * zero intermediate rows — and partials merge elementwise, so the
  * plan keeps Spark's partial/final aggregation (the treeAggregate
  * shape) with a d²-sized buffer instead of a d²-rows-per-input
  * stream.
  *
  * EXACT-INTEGER accumulation (r11 — what turned q329 oracle-gated):
  * inputs are 6dp-quantized with Spark `round()`'s own HALF_UP
  * BigDecimal semantics, so each component is an integer k = x·10⁶
  * and each outer-product cell an integer k_i·k_j at scale 10⁻¹².
  * Sums of integers are order-independent, so the moments are
  * BIT-IDENTICAL to the exact-decimal explode path regardless of
  * partition count or merge order — the r10 version accumulated IEEE
  * doubles, whose partial-merge order cost ~1 ulp and made the path
  * non-gateable cross-engine. The hot loop stays primitive: per-cell
  * longs, with a per-row headroom check that flushes into a 128-bit
  * (two-long) overflow lane long before a long could wrap; the
  * 128-bit totals surface as exact DECIMAL(38,6)/(38,12) arrays.
  *
  * Input domain: |x| ≤ 3000 after 6dp quantization (|k| ≤ 3·10⁹, so
  * a single k_i·k_j fits a long) — enforced loudly; embeddings are
  * unit-ish, orders inside the bound. Totals are exact for any row
  * count whose moments fit 38 decimal digits (n ≈ 10¹⁴ unit-norm
  * rows before Σx·xᵀ nears the cap — far past 100 TB).
  *
  * Buffer: 24·(d+d²) bytes of longs (d=768 → 14 MB) — executor-
  * memory bounded, never driver-collected (the moments row flows
  * into the covariance-table projection).
  */
object CovMoments {

  /** (n, s1[d] decimal(38,6), s2[d·d] decimal(38,12) row-major) over
    * a float/double vector column; inputs are 6dp-rounded first with
    * Spark round()'s HALF_UP-on-BigDecimal semantics, so both
    * covariance paths (and the DuckDB oracle) see identical inputs.
    */
  def covMoments(v: Column): Column =
    column(CovMomentsAgg(expression(v)).toAggregateExpression())
}

/** Mutable moments accumulator: `acc*` are the primitive-long hot
  * lanes (quantized units: 10⁻⁶ for s1, 10⁻¹² for s2), `hi*`/`lo*`
  * the 128-bit two's-complement flushed totals (lo unsigned).
  * `headroom` is the remaining guaranteed-no-overflow budget of the
  * hot lanes: every row consumes maxK² of it, and a row that would
  * exhaust it triggers a flush first.
  */
final class CovBuffer(
    var n: Long,
    var headroom: Long,
    var acc1: Array[Long],
    var acc2: Array[Long],
    var hi1: Array[Long],
    var lo1: Array[Long],
    var hi2: Array[Long],
    var lo2: Array[Long]) {

  def width: Int = if (acc1 == null) 0 else acc1.length

  def alloc(d: Int): Unit = {
    acc1 = new Array[Long](d); acc2 = new Array[Long](d * d)
    hi1 = new Array[Long](d); lo1 = new Array[Long](d)
    hi2 = new Array[Long](d * d); lo2 = new Array[Long](d * d)
    headroom = Long.MaxValue
  }

  /** Add signed `v` into the 128-bit cell (hi(i), lo(i)). */
  @inline private def add128(
      hi: Array[Long], lo: Array[Long], i: Int, v: Long): Unit = {
    val l = lo(i)
    val nl = l + v
    // carry out of the unsigned low-half addition
    val carry = ((l & v) | ((l | v) & ~nl)) >>> 63
    lo(i) = nl
    hi(i) += (v >> 63) + carry
  }

  /** Move the hot lanes into the 128-bit totals and reset headroom. */
  def flush(): Unit = {
    if (acc1 == null) return
    var i = 0
    while (i < acc1.length) {
      if (acc1(i) != 0L) { add128(hi1, lo1, i, acc1(i)); acc1(i) = 0L }
      i += 1
    }
    i = 0
    while (i < acc2.length) {
      if (acc2(i) != 0L) { add128(hi2, lo2, i, acc2(i)); acc2(i) = 0L }
      i += 1
    }
    headroom = Long.MaxValue
  }

  /** Fold `other`'s (flushed) 128-bit totals into this one's. */
  def merge128(other: CovBuffer): Unit = {
    var i = 0
    while (i < hi1.length) {
      val l = lo1(i); val ol = other.lo1(i)
      val nl = l + ol
      lo1(i) = nl
      hi1(i) += other.hi1(i) + (((l & ol) | ((l | ol) & ~nl)) >>> 63)
      i += 1
    }
    i = 0
    while (i < hi2.length) {
      val l = lo2(i); val ol = other.lo2(i)
      val nl = l + ol
      lo2(i) = nl
      hi2(i) += other.hi2(i) + (((l & ol) | ((l | ol) & ~nl)) >>> 63)
      i += 1
    }
    n += other.n
  }

  /** The exact 128-bit total of cell i as a BigInteger. */
  def total(hi: Array[Long], lo: Array[Long], i: Int): java.math.BigInteger =
    java.math.BigInteger.valueOf(hi(i)).shiftLeft(64)
      .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo(i))))
}

case class CovMomentsAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CovBuffer] with UnaryLike {

  /** |k| cap keeping a single k_i·k_j inside a long (3e9² = 9e18 <
    * 2⁶³−1): |x| ≤ 3000 after 6dp quantization. */
  private val KMax = 3000000000L

  /** Worst-case |y − exact·10⁶| of the fast path's y = v·1e6 at the
    * |x| = KMax·1e-6 domain edge, derived FROM KMax so a future
    * domain bump re-derives it (ADVICE r11 — the old comment claimed
    * 1e-9, the true edge bound is ~4.6e-7): one double-product
    * rounding (≤ ulp(KMax)/2 ≈ 2.4e-7) plus the shortest-decimal
    * repr error of v itself scaled by 1e6 (≤ ulp(KMax·1e-6)/2·1e6 ≈
    * 2.3e-7). */
  private val FastPathErrBound: Double =
    Math.ulp(KMax.toDouble) / 2 + Math.ulp(KMax * 1e-6) / 2 * 1e6

  /** Tie-boundary guard band (in units of one 1e-6 quantum): y
    * within TieBand of a .5 boundary defers to the exact BigDecimal
    * rule. Must strictly exceed [[FastPathErrBound]] or a fast-path
    * round could disagree with the exact rule OUTSIDE the deferred
    * band — asserted here so a band shrink or domain bump cannot
    * silently cross it (today's margin is ~2.2×). */
  private val TieBand: Double = 1e-6
  require(TieBand > FastPathErrBound,
    s"CovMoments tie band $TieBand must exceed the fast-path error " +
      s"bound $FastPathErrBound derived from KMax=$KMax")

  private lazy val elemFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"covMoments needs array<float|double>, got $other")
  }

  override def createAggregationBuffer(): CovBuffer =
    new CovBuffer(0L, 0L, null, null, null, null, null, null)

  override def update(buf: CovBuffer, input: InternalRow): CovBuffer = {
    val raw = child.eval(input)
    if (raw == null) return buf
    val a = raw.asInstanceOf[ArrayData]
    val d = a.numElements()
    if (d == 0) return buf
    if (buf.acc1 == null) buf.alloc(d)
    require(buf.width == d, s"ragged vectors: ${buf.width} vs $d")
    // 6dp quantization with Spark round()'s exact semantics
    // (BigDecimal.valueOf(double).setScale(6, HALF_UP) — HALF_UP on
    // the double's SHORTEST-DECIMAL repr). The BigDecimal chain costs
    // ~80ns/element (measured +48% q329 wall at sf1), so the hot path
    // uses primitive floor arithmetic and defers to BigDecimal ONLY
    // when v·10⁶ lands within TieBand of a .5 tie boundary: outside
    // that band both rules pick the same nearest integer (combined
    // decimal-repr + product error ≤ FastPathErrBound < TieBand,
    // asserted above), inside it the exact rule decides (incl.
    // HALF_UP's away-from-zero ties).
    val k = new Array[Long](d)
    var maxK = 0L
    var i = 0
    while (i < d) {
      val v = if (elemFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = v * 1e6
      val r = Math.floor(y + 0.5d)
      val frac = y - (r - 0.5d)
      val ki =
        if (frac > TieBand && frac < 1.0d - TieBand && Math.abs(y) < 4.5e15)
          r.toLong
        else java.math.BigDecimal.valueOf(v)
          .setScale(6, java.math.RoundingMode.HALF_UP)
          .unscaledValue().longValueExact()
      require(ki <= KMax && ki >= -KMax,
        s"covMoments supports |x| <= 3000 (6dp-quantized |k| <= $KMax); got $v")
      k(i) = ki
      val ab = math.abs(ki)
      if (ab > maxK) maxK = ab
      i += 1
    }
    // every cell's per-row increment is bounded by maxK² (and s1's by
    // maxK ≤ maxK² for maxK ≥ 1), so charging maxK² per row against
    // the shared headroom guarantees no hot-lane long ever wraps
    val rowBound = maxK * maxK
    if (buf.headroom < rowBound) buf.flush()
    buf.headroom -= rowBound
    i = 0
    while (i < d) {
      buf.acc1(i) += k(i)
      val ki = k(i)
      val row = i * d
      var j = 0
      while (j < d) { buf.acc2(row + j) += ki * k(j); j += 1 }
      i += 1
    }
    buf.n += 1
    buf
  }

  override def merge(buf: CovBuffer, other: CovBuffer): CovBuffer = {
    if (other.acc1 == null) return buf
    other.flush()
    if (buf.acc1 == null) {
      buf.alloc(other.width)
      buf.merge128(other)
      return buf
    }
    require(buf.width == other.width,
      s"ragged vectors: ${buf.width} vs ${other.width}")
    buf.flush()
    buf.merge128(other)
    buf
  }

  override def eval(buf: CovBuffer): Any =
    if (buf.acc1 == null) null
    else {
      buf.flush()
      val d = buf.width
      val s1 = new Array[Any](d)
      var i = 0
      while (i < d) {
        s1(i) = Decimal(new java.math.BigDecimal(
          buf.total(buf.hi1, buf.lo1, i), 6), 38, 6)
        i += 1
      }
      val s2 = new Array[Any](d * d)
      i = 0
      while (i < d * d) {
        s2(i) = Decimal(new java.math.BigDecimal(
          buf.total(buf.hi2, buf.lo2, i), 12), 38, 12)
        i += 1
      }
      InternalRow(buf.n, new GenericArrayData(s1), new GenericArrayData(s2))
    }

  override def serialize(buf: CovBuffer): Array[Byte] = {
    buf.flush()
    val d = buf.width
    val bb = java.nio.ByteBuffer.allocate(16 + 16 * (d + d * d))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(buf.n).putInt(d).putInt(0)
    if (d > 0) {
      buf.hi1.foreach(bb.putLong); buf.lo1.foreach(bb.putLong)
      buf.hi2.foreach(bb.putLong); buf.lo2.foreach(bb.putLong)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CovBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = bb.getLong()
    val d = bb.getInt(); bb.getInt()
    val buf = new CovBuffer(n, 0L, null, null, null, null, null, null)
    if (d > 0) {
      buf.alloc(d)
      buf.n = n
      var i = 0
      while (i < d) { buf.hi1(i) = bb.getLong(); i += 1 }
      i = 0
      while (i < d) { buf.lo1(i) = bb.getLong(); i += 1 }
      i = 0
      while (i < d * d) { buf.hi2(i) = bb.getLong(); i += 1 }
      i = 0
      while (i < d * d) { buf.lo2(i) = bb.getLong(); i += 1 }
    }
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s1", ArrayType(DecimalType(38, 6), containsNull = false)),
    StructField("s2", ArrayType(DecimalType(38, 12), containsNull = false))))
  override def nullable: Boolean = true
  override def prettyName: String = "cov_moments"
  override def withNewMutableAggBufferOffset(o: Int): CovMomentsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CovMomentsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CovMomentsAgg =
    copy(child = c)
}
