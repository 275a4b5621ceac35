package graft.agg

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.RollingHash

/** Count-Min sketch (Cormode, Muthukrishnan 2005) as a custom
  * `TypedImperativeAggregate` — approximate per-item frequencies in
  * sublinear space. The properties that matter at 100 TB:
  *
  *  - counters are SUMS, so the sketch is ORDER- and PARTITION-INVARIANT
  *    (unlike Misra–Gries summaries): map-side partials add elementwise,
  *    stored sketches for different slices add elementwise, and the result
  *    is bit-identical however Spark schedules the scan — which is what
  *    lets the q63 gate hash-match the full counter state cross-engine;
  *  - point queries read d cells and take the min — always an
  *    OVERestimate, biased by collisions only.
  *
  * Row hashes derive from [[RollingHash.polyHash64]] over `"r:" + value`
  * (row index as a domain separator), bucket = low log2(w) bits — every
  * step SQL-replayable. `eval` renders nonzero cells as
  * `"idx:count"` pairs (idx = row·w + bucket, ascending, comma-joined) —
  * sparse, deterministic, storable. */
case class CountMinAgg(child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(depth >= 1 && depth <= 16, s"depth=$depth out of range")
  require(width >= 2 && (width & (width - 1)) == 0, s"width=$width not a power of 2")

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "count_min"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], row: org.apache.spark.sql.catalyst.InternalRow)
      : Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var r = 0
      while (r < depth) {
        val h = RollingHash.polyHash64((r + ":" + s).getBytes("UTF-8"))
        buf(r * width + (h & (width - 1)).toInt) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < buf.length) {
      if (buf(i) != 0L) {
        if (sb.length > 0) sb.append(',')
        sb.append(i).append(':').append(buf(i))
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(off: Int): CountMinAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): CountMinAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

/** Re-aggregation of STORED Count-Min sketches: sums the sparse
  * "idx:count" renderings ([[CountMinAgg]] output) cell-wise — counters
  * are sums, so slice sketches ADD into range sketches exactly (the
  * [[HllMergeAgg]] pattern with + instead of max): aggregate each
  * hour/partition once, answer any window by adding its covering slices. */
case class CountMinMergeAgg(child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(depth >= 1 && depth <= 8 && width >= 16)
  private val cells = depth * width

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "count_min_merge"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](cells)

  override def update(buf: Array[Long], row: org.apache.spark.sql.catalyst.InternalRow)
      : Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      if (s.nonEmpty) s.split(',').foreach { kv =>
        val c = kv.indexOf(':')
        val idx = java.lang.Integer.parseInt(kv.substring(0, c))
        require(idx < cells, s"cell $idx out of range for $depth x $width")
        buf(idx) += java.lang.Long.parseLong(kv.substring(c + 1))
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < cells) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < buf.length) {
      if (buf(i) != 0L) {
        if (sb.length > 0) sb.append(',')
        sb.append(i).append(':').append(buf(i))
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(off: Int): CountMinMergeAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): CountMinMergeAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

object CountMinSketch {
  private[graft] val builders: graft.functions.GraftRegistry.Builders = Seq(
    "graft_count_min" -> (exprs => CountMinAgg(exprs.head,
      exprs(1).eval(null).toString.toInt,
      exprs(2).eval(null).toString.toInt).toAggregateExpression()),
    "graft_count_min_merge" -> (exprs => CountMinMergeAgg(exprs.head,
      exprs(1).eval(null).toString.toInt,
      exprs(2).eval(null).toString.toInt).toAggregateExpression()))

  def register(spark: SparkSession): Unit =
    graft.functions.GraftRegistry.registerTemp(spark, builders)

  /** Aggregate column: sparse-rendered CM counters of the (stringified)
    * input. Requires `register(spark)`. */
  def countMin(c: Column, depth: Int, width: Int): Column =
    call_function("graft_count_min", c.cast("string"),
      org.apache.spark.sql.functions.lit(depth),
      org.apache.spark.sql.functions.lit(width))

  /** Aggregate column: cell-wise SUM of stored sketch renders.
    * Requires `register(spark)`. */
  def countMinMerge(c: Column, depth: Int, width: Int): Column =
    call_function("graft_count_min_merge", c,
      org.apache.spark.sql.functions.lit(depth),
      org.apache.spark.sql.functions.lit(width))

  /** Parses an `eval` render back into the dense counter array. */
  def parse(s: String, depth: Int, width: Int): Array[Long] = {
    val buf = new Array[Long](depth * width)
    if (s.nonEmpty) s.split(',').foreach { cell =>
      val Array(i, v) = cell.split(':')
      buf(i.toInt) = v.toLong
    }
    buf
  }

  /** Elementwise sum — slice sketches combine into range sketches. */
  def add(a: Array[Long], b: Array[Long]): Array[Long] =
    a.zip(b).map { case (x, y) => x + y }

  /** Point frequency estimate: min over the d cells — never an
    * underestimate. */
  def query(buf: Array[Long], depth: Int, width: Int, value: String): Long =
    (0 until depth).map { r =>
      val h = RollingHash.polyHash64((r + ":" + value).getBytes("UTF-8"))
      buf(r * width + (h & (width - 1)).toInt)
    }.min
}
