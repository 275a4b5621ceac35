package graft.agg

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import graft.functions.RollingHash

/** Bloom filter over long keys as a mergeable `TypedImperativeAggregate` —
  * the RUNTIME-FILTER half of the sketch family (HLL counts, CMS
  * frequencies, KMV set ops; Bloom answers membership). The 100 TB use is
  * the semi-join prune: build the filter over the small (dim) side's join
  * keys — partial bitsets OR together map-side, so the exchange carries
  * `numBits/8` bytes per partition, not the keys — broadcast the one-row
  * result, and drop fact rows that cannot match BEFORE the join's
  * exchange. A filter with false-positive rate p cuts the fact shuffle to
  * ~(selectivity + p) of the scan; false NEGATIVES are impossible, so an
  * exact join after the prune returns exactly the un-pruned answer. This
  * is the pattern Spark's AQE `InjectRuntimeFilter` applies implicitly;
  * making it explicit lets the filter be stored (manifest-style, next to
  * [[graft.sinks.ZOrderTable]] min-max stats), unioned across partitions,
  * and reused across queries.
  *
  * Bits are set by double hashing (Kirsch–Mitzenmacher 2006: probe i =
  * h1 + i·h2 for k probes, no accuracy loss vs k independent hashes) over
  * [[RollingHash.splitMix64]] — deterministic and engine-independent, so a
  * serialized filter is reproducible bit-for-bit.
  *
  * Layout: 4 bytes numHashes (big-endian) then the bitset
  * (`numBits/8` bytes, bit i = byte i>>3, mask 1<<(i&7)). `numBits` is
  * recovered from the array length; [[BloomMightContain]] reads the header
  * per row (two loads — negligible next to the k probes).
  */
case class BloomBitsAgg(child: Expression, numBits: Int, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {
  require(numBits >= 64 && (numBits & 7) == 0,
    s"numBits=$numBits must be a positive multiple of 8")
  require(numHashes >= 1 && numHashes <= 32, s"numHashes=$numHashes out of range")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "bloom_bits"

  override def createAggregationBuffer(): Array[Byte] = {
    val buf = new Array[Byte](4 + numBits / 8)
    buf(0) = (numHashes >>> 24).toByte; buf(1) = (numHashes >>> 16).toByte
    buf(2) = (numHashes >>> 8).toByte; buf(3) = numHashes.toByte
    buf
  }

  override def update(buf: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null) BloomSketch.setBits(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 4
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(off: Int): BloomBitsAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): BloomBitsAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

/** `might_contain(filter, key)` — true iff all k probe bits are set. A
  * codegen `BinaryExpression` so the probe loop runs inside whole-stage
  * codegen on the fact scan (the hot path at 100 TB); k probes, two long
  * mixes, no allocation. */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(bloom: Any, key: Any): Any =
    BloomSketch.mightContain(bloom.asInstanceOf[Array[Byte]],
      key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bloom, key) =>
      s"${ev.value} = graft.agg.BloomSketch.mightContain($bloom, $key);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object BloomSketch {
  /** Second double-hashing stream: splitMix64 of the key xor'd with an
    * arbitrary odd constant, forced odd so probe strides cycle all bits. */
  @inline private def h2(key: Long): Long =
    RollingHash.splitMix64(key ^ 0x9e3779b97f4a7c15L) | 1L

  private[agg] def setBits(buf: Array[Byte], key: Long): Unit = {
    val k = ((buf(0) & 0xff) << 24) | ((buf(1) & 0xff) << 16) |
      ((buf(2) & 0xff) << 8) | (buf(3) & 0xff)
    val numBits = (buf.length - 4) * 8
    val a = RollingHash.splitMix64(key)
    val b = h2(key)
    var i = 0
    var h = a
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h, numBits).toInt
      val idx = 4 + (bit >> 3)
      buf(idx) = (buf(idx) | (1 << (bit & 7))).toByte
      h += b
      i += 1
    }
  }

  /** Static probe (called from generated code — keep signature stable). */
  def mightContain(buf: Array[Byte], key: Long): Boolean = {
    val k = ((buf(0) & 0xff) << 24) | ((buf(1) & 0xff) << 16) |
      ((buf(2) & 0xff) << 8) | (buf(3) & 0xff)
    val numBits = (buf.length - 4) * 8
    val a = RollingHash.splitMix64(key)
    val b = h2(key)
    var i = 0
    var h = a
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h, numBits).toInt
      if ((buf(4 + (bit >> 3)) & (1 << (bit & 7))) == 0) return false
      h += b
      i += 1
    }
    true
  }

  private[graft] val builders: graft.functions.GraftRegistry.Builders = Seq(
    "graft_bloom_bits" -> (exprs => BloomBitsAgg(exprs.head,
      exprs(1).eval(null).toString.toInt,
      exprs(2).eval(null).toString.toInt).toAggregateExpression()),
    "graft_bloom_might_contain" ->
      (exprs => BloomMightContain(exprs.head, exprs(1))))

  def register(spark: SparkSession): Unit =
    graft.functions.GraftRegistry.registerTemp(spark, builders)

  /** Aggregate column: serialized Bloom filter of the long input.
    * Requires `register(spark)`. */
  def bloomBits(c: Column, numBits: Int, numHashes: Int): Column =
    call_function("graft_bloom_bits", c.cast("long"), lit(numBits), lit(numHashes))

  /** Membership probe column. Requires `register(spark)`. */
  def mightContain(bloom: Column, key: Column): Column =
    call_function("graft_bloom_might_contain", bloom, key.cast("long"))
}
