package graft.agg

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.RollingHash

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) as a custom
  * `TypedImperativeAggregate` — the mergeable-state shape that makes
  * approximate distinct counts work at 100 TB: per-partition register
  * arrays combine map-side (Spark's partial aggregation), so the exchange
  * carries m bytes per group instead of the distinct values themselves,
  * and sketches for different days/partitions union by register-max
  * (count-distinct over any ad-hoc slice without rescanning).
  *
  * Spark ships `approx_count_distinct` (HLL++); this sketch exists for the
  * properties that one can't give this engine:
  *  - the REGISTER STATE is the output — storable, unionable, and exactly
  *    reproducible (the gate hash-matches it cross-engine), not just a
  *    final scalar;
  *  - hashing is [[RollingHash.polyHash64]] (Karp–Rabin + splitMix64), so
  *    a SQL oracle replays every register bit-exactly — q62 gates the
  *    whole sketch, which no opaque-murmur implementation allows.
  *
  * Register layout: p index bits (m = 2^p registers), rank = leading-zero
  * count of the remaining 64−p bits + 1 (zero remainder saturates at
  * 64−p+1). `eval` renders the registers as a 2m-char lowercase hex string
  * (bucket-ordered) — deterministic, comparable, and compact enough to
  * store next to the group key.
  */
case class HllRegistersAgg(child: Expression, p: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {
  require(p >= 4 && p <= 16, s"p=$p out of range")
  private val m = 1 << p
  private val windowBits = 64 - p

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "hll_registers"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], row: org.apache.spark.sql.catalyst.InternalRow)
      : Array[Byte] = {
    val v = child.eval(row)
    if (v != null) {
      val h = RollingHash.polyHash64Utf8(v.asInstanceOf[UTF8String])
      val bucket = (h >>> windowBits).toInt
      val w = if (windowBits == 64) h else h & ((1L << windowBits) - 1)
      val rank =
        if (w == 0L) windowBits + 1
        else java.lang.Long.numberOfLeadingZeros(w) - p + 1
      if (rank > buf(bucket)) buf(bucket) = rank.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    val sb = new java.lang.StringBuilder(2 * m)
    var i = 0
    while (i < m) {
      val v = buf(i) & 0xff
      sb.append(Character.forDigit(v >> 4, 16)).append(Character.forDigit(v & 15, 16))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(off: Int): HllRegistersAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): HllRegistersAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

/** Re-aggregation of STORED sketches: unions hex-rendered register
  * strings (the [[HllRegistersAgg]] output) by register max. This is the
  * production slice→range pattern — aggregate each hour/partition ONCE,
  * store the sketch next to the key, and answer any ad-hoc window by
  * merging the covering slices (m bytes each) instead of rescanning the
  * events. Same state, same eval rendering, so slice-merged output is
  * byte-identical to direct aggregation over the union of rows. */
case class HllMergeAgg(child: Expression, p: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {
  require(p >= 4 && p <= 16, s"p=$p out of range")
  private val m = 1 << p

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "hll_merge"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], row: org.apache.spark.sql.catalyst.InternalRow)
      : Array[Byte] = {
    val v = child.eval(row)
    if (v != null) {
      val hex = v.asInstanceOf[UTF8String].toString
      require(hex.length == 2 * m, s"sketch length ${hex.length} != ${2 * m}")
      var i = 0
      while (i < m) {
        val r = (Character.digit(hex.charAt(2 * i), 16) << 4 |
          Character.digit(hex.charAt(2 * i + 1), 16)).toByte
        if (r > buf(i)) buf(i) = r
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    val sb = new java.lang.StringBuilder(2 * m)
    var i = 0
    while (i < m) {
      val v = buf(i) & 0xff
      sb.append(Character.forDigit(v >> 4, 16)).append(Character.forDigit(v & 15, 16))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(off: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): HllMergeAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

object HllSketch {
  private[graft] val builders: graft.functions.GraftRegistry.Builders = Seq(
    "graft_hll_registers" -> (exprs => HllRegistersAgg(exprs.head,
      exprs(1).eval(null).toString.toInt).toAggregateExpression()),
    "graft_hll_merge" -> (exprs => HllMergeAgg(exprs.head,
      exprs(1).eval(null).toString.toInt).toAggregateExpression()))

  def register(spark: SparkSession): Unit =
    graft.functions.GraftRegistry.registerTemp(spark, builders)

  /** Aggregate column: hex-rendered HLL registers of the (stringified)
    * input. Requires `register(spark)`. */
  def hllRegisters(c: Column, p: Int): Column =
    call_function("graft_hll_registers", c.cast("string"),
      org.apache.spark.sql.functions.lit(p))

  /** Aggregate column: register-max union of stored sketch strings.
    * Requires `register(spark)`. */
  def hllMerge(c: Column, p: Int): Column =
    call_function("graft_hll_merge", c,
      org.apache.spark.sql.functions.lit(p))

  /** Parses an `hllRegisters` hex string back to registers. */
  def parseRegisters(hexStr: String): Array[Int] =
    Array.tabulate(hexStr.length / 2)(i =>
      Integer.parseInt(hexStr.substring(2 * i, 2 * i + 2), 16))

  /** Register-max union of sketches (same p). */
  def union(a: Array[Int], b: Array[Int]): Array[Int] =
    a.zip(b).map { case (x, y) => math.max(x, y) }

  /** Standard HLL estimate with the small-range linear-counting branch
    * (Flajolet et al. 2007 §4; no empirical bias table). Approximate BY
    * DESIGN — the gate hashes the registers, this derives the count. */
  def estimate(regs: Array[Int]): Double = {
    val m = regs.length.toDouble
    val alpha =
      if (regs.length == 16) 0.673
      else if (regs.length == 32) 0.697
      else if (regs.length == 64) 0.709
      else 0.7213 / (1 + 1.079 / m)
    val denom = regs.map(r => math.pow(2.0, -r)).sum
    val raw = alpha * m * m / denom
    val zeros = regs.count(_ == 0)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m / zeros) else raw
  }
}
