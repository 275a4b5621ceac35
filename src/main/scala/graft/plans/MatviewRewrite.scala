package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Materialized-view QUERY REWRITE — the read side of aggregate
  * materialization (the maintenance side is `sinks/DerivedAggTable`,
  * q54): an `Aggregate` whose grouping is a SUBSET of a registered
  * summary's dimensions and whose aggregates are derivable from its
  * partial sums re-plans onto the (tiny) summary table instead of the
  * base scan — Calcite's aggregate view matching, restricted to the
  * sound core:
  *
  *   SELECT dims', sum(x), count(*) FROM base [WHERE p(dims)] GROUP BY dims'
  *     ⇒ SELECT dims', sum(sum_x), sum(cnt) FROM matview [WHERE p] GROUP BY dims'
  *
  * (sum-of-sums and sum-of-counts re-aggregate losslessly over the
  * coarser grid; dims' ⊆ dims; filters referencing only dims commute
  * with the grouping). At 100 TB this is the difference between a
  * dashboard query costing a full fact scan and costing a scan of a
  * few-thousand-row summary.
  *
  * Soundness guards (each bails to no-rewrite):
  *  - grouping must be non-empty attribute refs within the registered
  *    dims (a GLOBAL aggregate over an empty base differs: count()=0
  *    has no matview row to re-sum — so it is excluded);
  *  - aggregates only `sum(dim-typed col)` registered as a partial sum
  *    and `count(*)`/`count(1)`, DISTINCT never rewrites;
  *  - an optional Filter between Aggregate and base must reference
  *    dims only;
  *  - the child subtree must equal the REGISTERED base projection
  *    (canonicalized comparison), so a rewrite never fires on a plan
  *    that merely looks similar.
  *
  * Freshness is the registrar's contract (pair registration with
  * DerivedAggTable refreshes); `MatviewRegistry.clear()` drops all
  * registrations. Output exprIds of the original Aggregate are
  * preserved through aliases, so parent operators are untouched.
  * Rewrites are logged at the plan level only (the node changes);
  * kill switch `spark.graft.matviewRewrite=false`.
  */
object MatviewRegistry {
  /** A registered summary: `base` is the analyzed plan of the EXACT
    * projection queries are built on; `view` the analyzed plan of the
    * summary table; `dims` dimension column names (same names in both);
    * `sums` base measure name → view partial-sum column name;
    * `countCol` the view's row-count column. */
  final case class Matview(base: LogicalPlan, view: LogicalPlan,
      dims: Set[String], sums: Map[String, String], countCol: String)

  private val entries = new ConcurrentHashMap[LogicalPlan, Matview]()

  def register(base: DataFrame, view: DataFrame, dims: Seq[String],
      sums: Map[String, String], countCol: String): Unit = {
    val b = base.queryExecution.analyzed
    val mv = Matview(b, view.queryExecution.analyzed, dims.toSet, sums,
      countCol)
    entries.put(b.canonicalized, mv)
    // a non-trivial base (e.g. an UpsertTable snapshot view) reaches the
    // rule AFTER the optimizer has reshaped it (WindowGroupLimit, split
    // filters …): the OPTIMIZED form is the canonical key that matches
    // there, so register both
    entries.put(base.queryExecution.optimizedPlan.canonicalized, mv)
  }

  def clear(): Unit = entries.clear()

  private[plans] def lookup(child: LogicalPlan): Option[Matview] =
    Option(entries.get(child.canonicalized))
}

object MatviewRewrite extends Rule[LogicalPlan] {
  val flagKey = "spark.graft.matviewRewrite"

  private def mvAttr(mv: MatviewRegistry.Matview, name: String): Option[Attribute] =
    mv.view.output.find(_.name == name)

  /** Map one result expression of the original Aggregate onto the view,
    * preserving name + exprId. */
  private def mapResult(mv: MatviewRegistry.Matview,
      e: NamedExpression): Option[NamedExpression] = e match {
    // pass-through grouping attribute
    case a: AttributeReference if mv.dims.contains(a.name) =>
      mvAttr(mv, a.name).map(v => Alias(v, a.name)(exprId = a.exprId))
    case al @ Alias(AggregateExpression(Sum(x: AttributeReference, _),
        Complete, false, None, _), name) if mv.sums.contains(x.name) =>
      mvAttr(mv, mv.sums(x.name)).map(v =>
        Alias(sumOf(v), name)(exprId = al.exprId))
    case al @ Alias(AggregateExpression(Count(Seq(Literal(_, _))),
        Complete, false, None, _), name) =>
      mvAttr(mv, mv.countCol).map(v =>
        Alias(sumOf(v), name)(exprId = al.exprId))
    case _ => None
  }

  private def sumOf(v: Attribute): AggregateExpression =
    AggregateExpression(Sum(v), Complete, isDistinct = false)

  private def allDims(mv: MatviewRegistry.Matview, e: Expression): Boolean =
    e.references.forall(a => mv.dims.contains(a.name))

  /** Substitute base dim attrs with view dim attrs inside a filter. */
  private def remapFilter(mv: MatviewRegistry.Matview,
      cond: Expression): Option[Expression] = {
    var ok = true
    val mapped = cond.transform {
      case a: AttributeReference =>
        mvAttr(mv, a.name) match {
          case Some(v) if mv.dims.contains(a.name) => v
          case _ => ok = false; a
        }
    }
    if (ok) Some(mapped) else None
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    // Walk down through pure-pruning Projects (attribute-only lists —
    // the shapes ColumnPruning interleaves) and pushed Filters,
    // attempting the registry match AT EVERY LEVEL — a registered base
    // that is itself a Project/Filter subtree (an UpsertTable snapshot
    // view) must match before its own layers get stripped.
    var child = agg.child
    var conds = List.empty[Expression]
    var hit = MatviewRegistry.lookup(child)
    var walking = hit.isEmpty
    while (walking) child match {
      case Project(l, c) if l.forall(_.isInstanceOf[AttributeReference]) =>
        child = c
        hit = MatviewRegistry.lookup(child)
        walking = hit.isEmpty
      case Filter(c, grand) =>
        conds ::= c; child = grand
        hit = MatviewRegistry.lookup(child)
        walking = hit.isEmpty
      case _ => walking = false
    }
    val cond = conds.reduceOption(And)
    hit.flatMap { mv =>
      val groupsOk = agg.groupingExpressions.nonEmpty &&
        agg.groupingExpressions.forall {
          case a: AttributeReference => mv.dims.contains(a.name)
          case _ => false
        }
      // Deterministic + reference-bearing guard: `allDims` walks the
      // predicate's attribute references, so a reference-FREE condition
      // (e.g. `rand() < 0.1`) passes it vacuously — rewriting a sampling
      // filter onto one-row-per-dim summary rows changes the aggregate.
      // Mirrors UnwrapCastInBinaryComparison's determinism discipline.
      val filterOk = cond.forall(c =>
        c.deterministic && c.references.nonEmpty && allDims(mv, c))
      if (!groupsOk || !filterOk) None
      else {
        val results = agg.aggregateExpressions.map(mapResult(mv, _))
        if (results.exists(_.isEmpty)) None
        else {
          val newGroups = agg.groupingExpressions.map {
            case a: AttributeReference => mvAttr(mv, a.name).get
          }
          val newChild = cond match {
            case Some(c) => remapFilter(mv, c) match {
              case Some(mc) => Filter(mc, mv.view)
              case None => return None
            }
            case None => mv.view
          }
          Some(Aggregate(newGroups, results.map(_.get), newChild))
        }
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(flagKey, "true").toBoolean) plan
    else plan.transformUp {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }
}
