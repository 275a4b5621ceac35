package graft.agg

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass mergeable approximate-quantile sketch — the
  * Manku–Rajagopalan–Lindsay / deterministic-KLL compactor hierarchy
  * (MRL, SIGMOD'98; Karnin–Lang–Liberty 2016 describe the same structure
  * with randomized parity — this implementation keeps the DETERMINISTIC
  * even-index compaction, trading KLL's tighter randomized bound for
  * reproducibility, the repo's standing rule that nothing depends on a
  * random draw).
  *
  * Structure: level i holds ≤ k values, each representing 2^i input rows.
  * A full level sorts and keeps the even-indexed half, promoting it to
  * level i+1 — one rank perturbation of ≤ 2^i per compaction, and level i
  * compacts at most n/(k·2^i) times, so the total rank error of any
  * quantile query is bounded by ε·n with ε = O(log₂(n/k)/k). `merge`
  * concatenates level-wise and re-compacts — the summary is mergeable, so
  * map-side partials combine (the property that makes it a one-pass
  * 100 TB percentile: p99 latency per key without a second scan or a
  * value-domain histogram).
  *
  * Where it sits in the family: [[graft.operators.ExactQuantiles]] is
  * EXACT but needs two scans + a driver round-trip; the (key, value)
  * histogram (q48 shape) is exact but O(distinct) state; this sketch is
  * one scan, O(k·log(n/k)) state, ε-approximate. Like Misra–Gries, the
  * rendered CONTENT depends on the merge tree — the CONTRACT is the rank
  * guarantee, pinned empirically in QuantileSketchSpec across
  * permutations and partitionings, never byte equality. Estimates answer
  * from the weighted summary by cumulative-weight rank. */
case class MrlSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.ArrayBuffer[mutable.ArrayBuffer[Long]]] {
  require(k >= 8 && k % 2 == 0 && k <= 65536, s"k=$k must be even, in [8, 65536]")

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "mrl_sketch"

  override def createAggregationBuffer(): mutable.ArrayBuffer[mutable.ArrayBuffer[Long]] =
    mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Long])

  override def update(buf: mutable.ArrayBuffer[mutable.ArrayBuffer[Long]],
      row: org.apache.spark.sql.catalyst.InternalRow): mutable.ArrayBuffer[mutable.ArrayBuffer[Long]] = {
    val v = child.eval(row)
    if (v != null) {
      buf(0) += v.asInstanceOf[Long]
      if (buf(0).length >= k) QuantileSketch.compactUp(buf, 0, k)
    }
    buf
  }

  override def merge(a: mutable.ArrayBuffer[mutable.ArrayBuffer[Long]],
      b: mutable.ArrayBuffer[mutable.ArrayBuffer[Long]]): mutable.ArrayBuffer[mutable.ArrayBuffer[Long]] = {
    var i = 0
    while (i < b.length) {
      while (a.length <= i) a += mutable.ArrayBuffer.empty[Long]
      a(i) ++= b(i)
      i += 1
    }
    i = 0
    while (i < a.length) {
      if (a(i).length >= k) QuantileSketch.compactUp(a, i, k)
      i += 1
    }
    a
  }

  override def eval(buf: mutable.ArrayBuffer[mutable.ArrayBuffer[Long]]): Any =
    UTF8String.fromString(QuantileSketch.render(buf))

  override def serialize(buf: mutable.ArrayBuffer[mutable.ArrayBuffer[Long]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { lvl =>
      out.writeInt(lvl.length)
      lvl.foreach(out.writeLong)
    }
    out.flush(); bos.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[mutable.ArrayBuffer[Long]] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val levels = in.readInt()
    val buf = mutable.ArrayBuffer.fill(levels)(mutable.ArrayBuffer.empty[Long])
    var i = 0
    while (i < levels) {
      val n = in.readInt()
      var j = 0
      while (j < n) { buf(i) += in.readLong(); j += 1 }
      i += 1
    }
    if (buf.isEmpty) buf += mutable.ArrayBuffer.empty[Long]
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): MrlSketchAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): MrlSketchAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

object QuantileSketch {

  /** Sort level i, keep the even-indexed half into level i+1; cascades
    * while the receiving level overflows. Deterministic (even parity). */
  private[agg] def compactUp(
      buf: mutable.ArrayBuffer[mutable.ArrayBuffer[Long]], level: Int,
      k: Int): Unit = {
    var i = level
    while (i < buf.length && buf(i).length >= k) {
      val arr = buf(i).toArray
      java.util.Arrays.sort(arr)
      if (buf.length <= i + 1) buf += mutable.ArrayBuffer.empty[Long]
      var j = 0
      while (j < arr.length - 1) { buf(i + 1) += arr(j); j += 2 }
      // odd leftover stays at this level (weight preserved exactly for
      // all but the compacted pairs)
      buf(i).clear()
      if (arr.length % 2 == 1) buf(i) += arr(arr.length - 1)
      i += 1
    }
  }

  /** Render: `value:weight` pairs sorted by (value, weight), joined by
    * `;` — weights are 2^level. */
  private[agg] def render(
      buf: mutable.ArrayBuffer[mutable.ArrayBuffer[Long]]): String = {
    val pairs = mutable.ArrayBuffer.empty[(Long, Long)]
    var i = 0
    while (i < buf.length) {
      val w = 1L << i
      buf(i).foreach(v => pairs += ((v, w)))
      i += 1
    }
    pairs.sortBy(p => (p._1, p._2))
      .map { case (v, w) => s"$v:$w" }.mkString(";")
  }

  def parse(s: String): Seq[(Long, Long)] =
    if (s.isEmpty) Nil
    else s.split(';').toSeq.map { e =>
      val i = e.indexOf(':')
      (e.substring(0, i).toLong, e.substring(i + 1).toLong)
    }

  /** Quantile estimates from a rendered summary: for percent p, the
    * value whose cumulative weight first reaches ceil(W·p/100). */
  def estimate(summary: String, percents: Seq[Int]): Seq[Long] = {
    val pairs = parse(summary)
    require(pairs.nonEmpty, "empty sketch")
    val total = pairs.map(_._2).sum
    percents.map { p =>
      val target = (total * p + 99L) / 100L
      var cum = 0L
      var ans = pairs.last._1
      val it = pairs.iterator
      var found = false
      while (it.hasNext && !found) {
        val (v, w) = it.next()
        cum += w
        if (cum >= target) { ans = v; found = true }
      }
      ans
    }
  }

  private[graft] val builders: graft.functions.GraftRegistry.Builders = Seq(
    "graft_mrl_sketch" -> (exprs => MrlSketchAgg(exprs.head,
      exprs(1).eval(null).toString.toInt).toAggregateExpression()))

  def register(spark: SparkSession): Unit =
    graft.functions.GraftRegistry.registerTemp(spark, builders)

  /** Aggregate column: MRL summary of the BIGINT input. Requires
    * [[register]]. One scan + map-side partial merge per group; pair with
    * [[estimate]] (or a stored-summary re-merge, the q108 slice→range
    * pattern — [[MrlSketchAgg.merge]] is exactly the fold) to answer
    * percentile queries without a second data pass. */
  def mrlSketch(c: Column, k: Int): Column =
    call_function("graft_mrl_sketch", c.cast("long"), lit(k))
}
