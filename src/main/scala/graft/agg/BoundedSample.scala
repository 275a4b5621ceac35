package graft.agg

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Mergeable bounded uniform sample: keeps the `k` rows with the SMALLEST
  * priority, where the priority is a caller-supplied hash of a row-unique
  * key. With priorities = xxhash64(unique key), the retained set is a
  * uniform random sample of the rows that is (a) MERGEABLE — the k
  * smallest of a union are the k smallest of the per-partition k-smallest,
  * so map-side partials combine losslessly (the bottom-k trick KMV uses
  * for distinct counting, applied to row sampling; Efraimidis–Spirakis
  * 2006 is the weighted generalization already used by q73) — and
  * (b) DETERMINISTIC across partitionings and merge orders: the result is
  * a pure function of the (priority, value) multiset, with exact ties
  * broken by value. No RNG state, so reruns and AQE re-plans render the
  * identical sample — the property the repo's oracle gates require.
  *
  * `eval` renders the sampled VALUES sorted ascending (array<bigint>):
  * position i of m is the i-th order statistic of the sample, which is how
  * [[graft.operators.ExactQuantiles]] turns it into rank brackets.
  */
case class BoundedSampleAgg(value: Expression, priority: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]] {
  require(k >= 1 && k <= (1 << 20), s"k=$k out of range")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(value, priority)
  override def prettyName: String = "bounded_sample"

  // max-heap on (priority, value): the root is the first entry to evict.
  private val ord: Ordering[(Long, Long)] = Ordering.Tuple2[Long, Long]

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty[(Long, Long)](ord)

  override def update(buf: mutable.PriorityQueue[(Long, Long)],
      row: org.apache.spark.sql.catalyst.InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val v = value.eval(row)
    val p = priority.eval(row)
    if (v != null && p != null) {
      val e = (p.asInstanceOf[Long], v.asInstanceOf[Long])
      if (buf.size < k) buf.enqueue(e)
      else if (ord.lt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }
    }
    buf
  }

  override def merge(a: mutable.PriorityQueue[(Long, Long)],
      b: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    b.foreach { e =>
      if (a.size < k) a.enqueue(e)
      else if (ord.lt(e, a.head)) { a.dequeue(); a.enqueue(e) }
    }
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any = {
    val values = buf.iterator.map(_._2).toArray
    java.util.Arrays.sort(values)
    new GenericArrayData(values)
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (p, v) => out.writeLong(p); out.writeLong(v) }
    out.flush(); bos.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val q = createAggregationBuffer()
    var i = 0
    while (i < n) { q.enqueue((in.readLong(), in.readLong())); i += 1 }
    q
  }

  override def withNewMutableAggBufferOffset(off: Int): BoundedSampleAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): BoundedSampleAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(value = c(0), priority = c(1))
}

object BoundedSample {
  private[graft] val builders: graft.functions.GraftRegistry.Builders = Seq(
    "graft_bounded_sample" -> (exprs => BoundedSampleAgg(exprs(0), exprs(1),
      exprs(2).eval(null).toString.toInt).toAggregateExpression()))

  def register(spark: SparkSession): Unit =
    graft.functions.GraftRegistry.registerTemp(spark, builders)

  /** Aggregate column: values (bigint) of the k rows with smallest
    * priority (bigint), rendered sorted ascending. Requires `register`. */
  def boundedSample(value: Column, priority: Column, k: Int): Column =
    call_function("graft_bounded_sample", value.cast("long"),
      priority.cast("long"), lit(k))
}
