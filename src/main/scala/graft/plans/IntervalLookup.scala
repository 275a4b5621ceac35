package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Custom whole-operator stack — the (c) tier of the extension ladder
  * (compose ops → custom Expression → custom LogicalPlan + Strategy +
  * SparkPlan): a BROADCAST INTERVAL-LOOKUP JOIN.
  *
  * The problem: enriching a fact stream against a small table of RANGES
  * (IP block → geo, balance band → tier, time window → campaign) has no
  * equi-key, so Catalyst plans `fact JOIN dim ON s <= p AND p < e` as
  * BroadcastNestedLoopJoin — O(|fact|·|dim|) predicate evaluations. With
  * |dim| in the thousands that multiplies a 100 TB scan by 10³–10⁴.
  * This operator broadcasts the dim side as an AUGMENTED INTERVAL TREE
  * (sorted-by-start implicit BST carrying subtree max-end, the classic
  * stabbing-query structure) and probes each fact row in
  * O(log m + matches) — the join cost returns to ~one scan.
  *
  * Semantics: match iff start <= point < end (half-open, the layout
  * convention everywhere else in this library); overlapping intervals
  * all match (k-emit); NULL point / NULL bounds never match; `leftOuter`
  * emits the fact row once with a NULL dim side when nothing matches.
  * Inner and left-outer only — the dim side is the broadcast side by
  * construction.
  *
  * Exposed through [[graft.operators.IntervalLookup.join]] (resolves
  * column references, registers the strategy idempotently) and planned
  * by [[IntervalLookupStrategy]] (also injected by GraftExtensions).
  */
case class IntervalLookupJoin(left: LogicalPlan, right: LogicalPlan,
    point: Expression, start: Expression, end: Expression,
    isLeftOuter: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ (if (isLeftOuter) right.output.map(_.withNullability(true))
      else right.output)
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): IntervalLookupJoin =
    copy(left = newLeft, right = newRight)
}

object IntervalLookupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalLookupJoin(l, r, p, s, e, leftOuter) =>
      BroadcastIntervalJoinExec(p, s, e, leftOuter,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Static augmented interval tree over intervals sorted by start: an
  * implicit balanced BST on the array (node = mid of [lo, hi)) where
  * each node carries its SUBTREE's max end. A stabbing query at p
  * prunes any subtree whose maxEnd <= p and skips right subtrees once
  * starts(mid) > p — O(log m + k). Arrays only: broadcast-friendly,
  * no per-node objects. */
final class IntervalIndex(starts: Array[Long], ends: Array[Long],
    val rows: Array[InternalRow], maxEnd: Array[Long]) extends Serializable {

  def size: Int = starts.length

  /** Indices of all intervals containing p (deterministic traversal
    * order: node, then right subtree, then left). */
  def query(p: Long, out: java.util.ArrayList[Int]): Unit = {
    var stack = List((0, starts.length))
    while (stack.nonEmpty) {
      val (lo, hi) = stack.head; stack = stack.tail
      if (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (maxEnd(mid) > p) { // subtree max end beats p → worth visiting
          stack = (lo, mid) :: stack
          if (starts(mid) <= p) {
            if (ends(mid) > p) out.add(mid)
            stack = (mid + 1, hi) :: stack
          }
        }
      }
    }
  }
}

object IntervalIndex {
  def build(intervals: Array[(Long, Long, InternalRow)]): IntervalIndex = {
    val sorted = intervals.sortBy(t => (t._1, t._2))
    val starts = sorted.map(_._1)
    val ends = sorted.map(_._2)
    val rows = sorted.map(_._3)
    val maxEnd = new Array[Long](sorted.length)
    def fill(lo: Int, hi: Int): Long = {
      if (lo >= hi) Long.MinValue
      else {
        val mid = (lo + hi) >>> 1
        val m = math.max(ends(mid), math.max(fill(lo, mid), fill(mid + 1, hi)))
        maxEnd(mid) = m
        m
      }
    }
    fill(0, sorted.length)
    new IntervalIndex(starts, ends, rows, maxEnd)
  }
}

case class BroadcastIntervalJoinExec(point: Expression, start: Expression,
    end: Expression, isLeftOuter: Boolean, left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {
  require(point.dataType == LongType && start.dataType == LongType &&
    end.dataType == LongType,
    "interval-lookup join operates on LongType point/start/end")

  override def output: Seq[Attribute] =
    left.output ++ (if (isLeftOuter) right.output.map(_.withNullability(true))
      else right.output)

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): BroadcastIntervalJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    // Build side: collected once on the driver (it IS the broadcast
    // side by contract), bounds evaluated here so executors get arrays.
    val bs = BindReferences.bindReference(start, right.output)
    val be = BindReferences.bindReference(end, right.output)
    val intervals = right.executeCollect().flatMap { r =>
      val s = bs.eval(r); val e = be.eval(r)
      if (s == null || e == null) None
      else Some((s.asInstanceOf[Long], e.asInstanceOf[Long], r))
    }
    val bc = sparkContext.broadcast(IntervalIndex.build(intervals))
    val bp = BindReferences.bindReference(point, left.output)
    val attrs = output
    val nRight = right.output.size
    val leftOuter = isLeftOuter
    left.execute().mapPartitions { it =>
      val idx = bc.value
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(attrs, attrs)
      val nullRight = new GenericInternalRow(nRight)
      val hits = new java.util.ArrayList[Int]()
      it.flatMap { l =>
        hits.clear()
        val p = bp.eval(l)
        if (p != null) idx.query(p.asInstanceOf[Long], hits)
        if (hits.isEmpty) {
          if (leftOuter) Iterator.single(proj(joined(l, nullRight)))
          else Iterator.empty
        } else {
          // materialize hit indices now — `joined`/`hits` are reused
          val snapshot = new Array[Int](hits.size())
          var i = 0
          while (i < snapshot.length) { snapshot(i) = hits.get(i); i += 1 }
          snapshot.iterator.map(j => proj(joined(l, idx.rows(j))))
        }
      }
    }
  }
}
