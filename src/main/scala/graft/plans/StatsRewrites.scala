package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Aggregate elimination on a unique grouping key — the single-row-
  * group rewrite (Oracle/SQL Server perform it from PK metadata):
  * `GROUP BY pk` over a duplicate-free subtree makes every group
  * exactly one row, so the whole hash-aggregate exchange is the
  * identity in disguise:
  *
  *   sum(x)/min(x)/max(x)/avg(x)/first(x) → x   (cast to the
  *     aggregate's result type — sum/avg widen),
  *   count(e…) → 1 if no argument can be NULL, else
  *     IF(all args non-null, 1, 0),
  *   DISTINCT flags are vacuous on one row.
  *
  * Eligibility mirrors [[DistinctEliminationRewrite]]: some grouping
  * expression is a plain attribute tracing to a
  * [[ConstraintRegistry]]-unique column of the base scan, and the
  * child is duplicate-free (Project/Filter over one relation). Any
  * aggregate function outside the mapped set, or a FILTER clause,
  * vetoes the node untouched — the rule never guesses.
  *
  * Output attributes keep their exprIds (aliases re-issued with the
  * original ids), so parents above the rewritten node are unaffected.
  * At 100 TB this deletes a full shuffle of the fact table; the
  * machine-emitted "GROUP BY pk" shape is common in BI layers and ORM
  * dialects. Kill switch `spark.graft.aggElimination=false`. */
object AggregateEliminationRewrite extends Rule[LogicalPlan] {
  val flagKey = "spark.graft.aggElimination"

  import ConstraintPlanUtils.{baseOf, duplicateFree}

  private def uniqueGrouping(a: Aggregate): Boolean =
    a.groupingExpressions.exists {
      case attr: Attribute =>
        baseOf(a.child, attr).exists { case (path, col) =>
          ConstraintRegistry.isUnique(path, col) }
      case _ => false
    }

  /** Single-row replacement for an aggregate call, or None to veto. */
  private def singleRow(ae: AggregateExpression): Option[Expression] = {
    if (ae.filter.isDefined) return None
    ae.aggregateFunction match {
      case s: Sum => Some(Cast(s.child, ae.dataType))
      case m: Min => Some(Cast(m.child, ae.dataType))
      case m: Max => Some(Cast(m.child, ae.dataType))
      case a: Average => Some(Cast(a.child, ae.dataType))
      case f: First => Some(Cast(f.child, ae.dataType))
      case l: Last => Some(Cast(l.child, ae.dataType))
      case c: Count =>
        val nullable = c.children.filter(_.nullable)
        if (nullable.isEmpty) Some(Literal(1L))
        else Some(If(nullable.map(IsNotNull).reduce[Expression](And),
          Literal(1L), Literal(0L)))
      case _ => None
    }
  }

  private def rewrite(a: Aggregate): Option[LogicalPlan] = {
    var ok = true
    val projected = a.aggregateExpressions.map {
      case al @ Alias(child, name) =>
        val nc = child.transformUp {
          case ae: AggregateExpression =>
            singleRow(ae) match {
              case Some(e) => e
              case None => ok = false; ae
            }
        }
        Alias(nc, name)(al.exprId, al.qualifier, al.explicitMetadata,
          al.nonInheritableMetadataKeys)
      case attr: Attribute => attr
      case other =>
        // any other NamedExpression shape (rare) — veto
        ok = false; other
    }
    if (ok) Some(Project(projected, a.child)) else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(flagKey, "true").toBoolean) plan
    else plan.transformDown {
      case a: Aggregate
          if a.groupingExpressions.nonEmpty && uniqueGrouping(a) &&
            duplicateFree(a.child) =>
        rewrite(a).getOrElse(a)
    }
}

/** Contradiction folding from declared CHECK ranges — the logical-plan
  * form of zone-map/constraint pruning every warehouse ships: a filter
  * conjunct that contradicts a [[ConstraintRegistry.declareRange]]
  * bound (e.g. `WHERE line_no > 50` on a column declared [1, 7])
  * proves the subtree empty, so it folds to an empty LocalRelation and
  * Catalyst's PropagateEmptyRelation collapses everything above —
  * joins, aggregates, unions — without touching storage.
  *
  * Soundness: the declaration bounds NON-NULL values; a NULL attribute
  * fails every comparison predicate anyway, so the filter output is
  * empty either way. Only integral attribute-vs-literal conjuncts are
  * inspected (through value-preserving widening casts); everything
  * else is ignored — the rule can only ever fold provably-empty
  * subtrees. Kill switch `spark.graft.rangeContradiction=false`. */
object RangeContradictionRewrite extends Rule[LogicalPlan]
    with PredicateHelper {
  val flagKey = "spark.graft.rangeContradiction"

  /** An attribute, possibly under a value-preserving integral widening
    * cast (Catalyst plants those for mixed-width comparisons). */
  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private object Col {
    def unapply(e: Expression): Option[Attribute] = e match {
      case a: Attribute => Some(a)
      case c: Cast => c.child match {
        case a: Attribute
            if integral(a.dataType) && integral(c.dataType) &&
              c.dataType.defaultSize >= a.dataType.defaultSize => Some(a)
        case _ => None
      }
      case _ => None
    }
  }

  private def litLong(l: Literal): Option[Long] = l.value match {
    case null => None
    case i: java.lang.Integer => Some(i.toLong)
    case l2: java.lang.Long => Some(l2)
    case s: java.lang.Short => Some(s.toLong)
    case b: java.lang.Byte => Some(b.toLong)
    case _ => None
  }

  private def contradicts(child: LogicalPlan, cond: Expression): Boolean = {
    def range(a: Attribute): Option[(Long, Long)] =
      ConstraintPlanUtils.baseOf(child, a).flatMap { case (p, c) =>
        ConstraintRegistry.rangeOf(p, c) }
    // each case: the predicate is unsatisfiable for every in-range value
    def ltDead(a: Attribute, v: Long) = range(a).exists(_._1 >= v)
    def gtDead(a: Attribute, v: Long) = range(a).exists(_._2 <= v)
    def leDead(a: Attribute, v: Long) = range(a).exists(_._1 > v)
    def geDead(a: Attribute, v: Long) = range(a).exists(_._2 < v)
    splitConjunctivePredicates(cond).exists {
      case LessThan(Col(a), l: Literal) => litLong(l).exists(ltDead(a, _))
      case GreaterThan(l: Literal, Col(a)) => litLong(l).exists(ltDead(a, _))
      case GreaterThan(Col(a), l: Literal) => litLong(l).exists(gtDead(a, _))
      case LessThan(l: Literal, Col(a)) => litLong(l).exists(gtDead(a, _))
      case LessThanOrEqual(Col(a), l: Literal) =>
        litLong(l).exists(leDead(a, _))
      case GreaterThanOrEqual(l: Literal, Col(a)) =>
        litLong(l).exists(leDead(a, _))
      case GreaterThanOrEqual(Col(a), l: Literal) =>
        litLong(l).exists(geDead(a, _))
      case LessThanOrEqual(l: Literal, Col(a)) =>
        litLong(l).exists(geDead(a, _))
      case EqualTo(Col(a), l: Literal) =>
        litLong(l).exists(v => leDead(a, v) || geDead(a, v))
      case EqualTo(l: Literal, Col(a)) =>
        litLong(l).exists(v => leDead(a, v) || geDead(a, v))
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(flagKey, "true").toBoolean) plan
    else {
      val folded = plan.transformUp {
        case f: Filter if contradicts(f.child, f.condition) =>
          LocalRelation(f.output)
      }
      // extraOptimizations run AFTER the built-in batches, so Catalyst's
      // own empty-relation propagation has already had its turn — re-run
      // it here so the fold collapses joins/aggregates/unions above
      // (their rule knows the subtle cases, e.g. a grouping-free
      // Aggregate over empty still emits one row)
      if (folded fastEquals plan) plan
      else org.apache.spark.sql.catalyst.optimizer
        .PropagateEmptyRelation(folded)
    }
}
