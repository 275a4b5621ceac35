package graft.agg

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary (Misra & Gries 1982; mergeable form
  * per Agarwal, Cormode, Huang, Phillips, Wei, Yi 2012, "Mergeable
  * summaries" — public results) as a `TypedImperativeAggregate`, plus the
  * exact two-pass heavy-hitters operator built on it.
  *
  * The sketch keeps at most `k` (value, counter) pairs. Inserts go into a
  * working map that is PRUNED whenever it exceeds 2k entries: subtract the
  * (k+1)-th largest counter from every entry and drop the non-positive
  * ones (at most k survive — amortized O(1) per row). `merge` sums
  * counters pairwise and prunes the same way, which is exactly the
  * paper's mergeable-MG step, so map-side partials combine freely. The
  * cumulative undercount of any value is < n/(k+1), and a value whose
  * true count exceeds n/(k+1) can never be evicted — the completeness
  * guarantee [[MisraGries.heavyHitters]] builds on.
  *
  * Unlike the repo's other sketches (HLL/Count-Min/KMV/Bloom, which are
  * order- and partition-invariant), MG counter CONTENT depends on the
  * merge tree — two runs may render different summaries. That is why the
  * sketch is a CANDIDATE GENERATOR here, never a gate output: only the
  * guarantee (candidates ⊇ all φ-heavy values) is schedule-independent,
  * and the exact verify pass restores full determinism. `eval` renders
  * `value:count` pairs sorted by value (deterministic given the content).
  */
case class MisraGriesAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {
  require(k >= 1 && k <= 65536, s"k=$k out of range")

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      row: org.apache.spark.sql.catalyst.InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(row)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.update(s, buf.getOrElse(s, 0L) + 1L)
      if (buf.size > 2 * k) MisraGries.prune(buf, k)
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (s, c) => a.update(s, a.getOrElse(s, 0L) + c) }
    if (a.size > k) MisraGries.prune(a, k)
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val m = if (buf.size > k) { MisraGries.prune(buf, k); buf } else buf
    val sb = new java.lang.StringBuilder
    m.toSeq.sortBy(_._1).foreach { case (s, c) =>
      if (sb.length > 0) sb.append('\u001e')
      sb.append(MisraGries.escape(s)).append('\u001f').append(c)
    }
    UTF8String.fromString(sb.toString)
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val b = s.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      m.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(off: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
}

object MisraGries {
  /** Mergeable-MG prune to ≤ k entries: subtract the (k+1)-th largest
    * counter from all, drop the non-positive. No-op at ≤ k entries. */
  private[agg] def prune(m: mutable.HashMap[String, Long], k: Int): Unit = {
    if (m.size <= k) return
    val counts = m.values.toArray
    java.util.Arrays.sort(counts)
    val t = counts(counts.length - (k + 1))
    val dead = m.iterator.filter(_._2 <= t).map(_._1).toArray
    dead.foreach(m.remove)
    m.mapValuesInPlace((_, c) => c - t)
  }

  private[graft] val builders: graft.functions.GraftRegistry.Builders = Seq(
    "graft_misra_gries" -> (exprs => MisraGriesAgg(exprs.head,
      exprs(1).eval(null).toString.toInt).toAggregateExpression()))

  def register(spark: SparkSession): Unit =
    graft.functions.GraftRegistry.registerTemp(spark, builders)

  /** Aggregate column: MG summary of the (stringified) input, rendered as
    * `value<US>count` pairs joined by `<RS>` (0x1f / 0x1e). Requires `register`. */
  def misraGries(c: Column, k: Int): Column =
    call_function("graft_misra_gries", c.cast("string"), lit(k))

  /** Escapes a value for the render: raw 0x1e/0x1f appear ONLY as
    * separators afterwards, so arbitrary input (including the separator
    * bytes themselves) round-trips through parse. */
  private[agg] def escape(s: String): String = {
    val sb = new java.lang.StringBuilder
    s.foreach {
      case '\\'     => sb.append("\\\\")
      case '\u001e' => sb.append("\\R")
      case '\u001f' => sb.append("\\U")
      case c        => sb.append(c)
    }
    sb.toString
  }

  private def unescape(s: String): String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'R' => sb.append('\u001e')
          case 'U' => sb.append('\u001f')
          case e   => sb.append(e)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Parses an `eval` render back into (value, counter) pairs. */
  def parse(s: String): Seq[(String, Long)] =
    if (s.isEmpty) Nil
    else s.split('\u001e').toSeq.map { e =>
      val i = e.lastIndexOf('\u001f')
      (unescape(e.substring(0, i)), e.substring(i + 1).toLong)
    }

  /** EXACT φ-heavy hitters at scale: every value of `value` appearing in
    * at least a 1/`phiDen` fraction of the non-null rows — i.e. count ≥
    * ceil(n/phiDen) — with its exact count. Two passes over `df`:
    *
    *  1. one scan aggregates the MG(k) summary and n (map-side partials,
    *     a single ≤k-entry row to the driver — a bounded action);
    *  2. one scan counts ONLY rows matching the ≤k broadcast candidates —
    *     the map-side semi-filter drops everything else BEFORE the
    *     shuffle, so the exchange carries at most k groups per partition
    *     regardless of the column's true cardinality.
    *
    * `k ≥ phiDen` makes pass 1 lossless for the answer: a φ-heavy value
    * has true count ≥ n/phiDen > n/(k+1) ≥ the maximum possible MG
    * undercount, so it cannot have been evicted. The sketch's
    * order-dependence never reaches the output — candidate SET
    * completeness is guaranteed, spurious candidates die in the exact
    * count, so the result is bit-deterministic (plain GROUP BY/HAVING
    * semantics) while shuffling O(k) instead of O(distinct) — the whole
    * point on a high-cardinality column at 100 TB. The price is the
    * second scan; a plain groupBy is better when |distinct| is small.
    * Output: (value, cnt), exact. */
  def heavyHitters(df: DataFrame, value: Column, phiDen: Int, k: Int): DataFrame = {
    require(phiDen >= 2, s"phiDen=$phiDen must be >= 2")
    require(k >= phiDen,
      s"k=$k < phiDen=$phiDen: MG completeness guarantee needs k >= phiDen")
    val spark = df.sparkSession
    register(spark)
    val v = df.select(value.cast("string").as("value"))
      .where(col("value").isNotNull)
    val head = v.agg(misraGries(col("value"), k).as("mg"),
      count(lit(1)).as("n")).head()
    val n = head.getLong(1)
    val minCount = (n + phiDen - 1) / phiDen // ceil(n/phiDen)
    val cands = parse(head.getString(0)).map(_._1)
    import spark.implicits._
    v.join(broadcast(cands.toDF("value")), "value")
      .groupBy(col("value")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
  }
}
