package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Declared table constraints the optimizer may trust. OSS Spark carries
  * no PK/FK metadata, so a star-schema query that joins a dimension it
  * never reads still pays the full shuffle/broadcast — warehouses
  * (Oracle, SQL Server, Trino with `... RELY`) eliminate such joins from
  * declared constraints. This registry is that metadata seam: tables are
  * identified by a path suffix of their scan location (the lake layout's
  * stable name), constraints are declared by the pipeline owner and
  * TRUSTED (RELY semantics — the engine does not re-validate per query;
  * `q202_ref_integrity` is the audit query that checks them offline).
  *
  * Reference behavior: the reference's flat-output jobs join dimension
  * tables unconditionally and rely on config to skip unused enrichments
  * (pipeline/src/main/java/ai/promoted/metrics/logprocessor/job/join
  * config flags); here the optimizer drops provably-unused joins itself.
  */
object ConstraintRegistry {
  /** (location suffix, column name) declared UNIQUE (a primary key). */
  private val uniqueKeys = TrieMap.empty[(String, String), Unit]

  /** (fact suffix, fk col) → (dim suffix, pk col): every non-null fk
    * value matches exactly one dim row AND the fk column is non-null in
    * the fact table (TPC-H-style NOT NULL REFERENCES). */
  private val foreignKeys = TrieMap.empty[(String, String), (String, String)]

  /** (location suffix, column) → inclusive [lo, hi] CHECK range the
    * pipeline owner declares for an integral column (RELY semantics,
    * like the keys). NULLs are permitted by the declaration — a range
    * contradiction still folds to empty because NULL fails every
    * comparison anyway. */
  private val ranges = TrieMap.empty[(String, String), (Long, Long)]

  def declareUnique(pathSuffix: String, col: String): Unit =
    uniqueKeys.put((pathSuffix, col), ())

  def declareRange(pathSuffix: String, col: String, lo: Long, hi: Long)
      : Unit = {
    require(lo <= hi, s"declareRange: lo $lo > hi $hi")
    ranges.put((pathSuffix, col), (lo, hi))
  }

  def rangeOf(pathSuffix: String, col: String): Option[(Long, Long)] =
    ranges.collectFirst {
      case ((s, c), r) if c == col && suffixAtBoundary(pathSuffix, s) => r
    }

  def declareForeignKey(factSuffix: String, fkCol: String,
      dimSuffix: String, pkCol: String): Unit = {
    foreignKeys.put((factSuffix, fkCol), (dimSuffix, pkCol))
    declareUnique(dimSuffix, pkCol)
  }

  /** Suffix match at a path-component boundary: a bare `endsWith` lets a
    * declared suffix "orders" claim ".../customer_orders", and the
    * registry would then eliminate joins/distincts against the wrong
    * table. The character before the matched suffix must be '/' (or the
    * suffix itself starts with '/', or consumes the whole path). */
  private def suffixAtBoundary(path: String, s: String): Boolean =
    path == s || (path.endsWith(s) &&
      (s.startsWith("/") || path.charAt(path.length - s.length - 1) == '/'))

  /** Boundary-safe suffix identity, shared by the sibling registries
    * (masking policies, declared row counts). */
  def suffixOk(path: String, s: String): Boolean = suffixAtBoundary(path, s)

  def isUnique(pathSuffix: String, col: String): Boolean =
    uniqueKeys.keys.exists {
      case (s, c) => c == col && suffixAtBoundary(pathSuffix, s)
    }

  def fkTarget(factSuffix: String, fkCol: String): Option[(String, String)] =
    foreignKeys.collectFirst {
      case ((s, c), tgt) if c == fkCol && suffixAtBoundary(factSuffix, s) => tgt
    }

  def clear(): Unit = {
    uniqueKeys.clear(); foreignKeys.clear(); ranges.clear()
  }
}

private[plans] object ConstraintPlanUtils {
  /** The base-relation location suffix and base attribute name for
    * `attr`, traced through Project/Filter pass-throughs by exprId. */
  def baseOf(plan: LogicalPlan,
      attr: Attribute): Option[(String, String)] = plan match {
    case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      lr.output.find(_.exprId == attr.exprId)
        .flatMap(a => fs.location.rootPaths.headOption
          .map(p => (p.toString, a.name)))
    case p: Project =>
      // only pass-through (non-Alias) of the attr keeps identity
      if (p.projectList.exists(e => e.isInstanceOf[Attribute] &&
          e.exprId == attr.exprId)) baseOf(p.child, attr) else None
    case f: Filter => baseOf(f.child, attr)
    case _ => None
  }

  /** True iff `plan` emits at most one row per base-scan row —
    * Project/Filter chains over a single relation (no joins, explodes,
    * unions), so a base-unique column stays row-unique in the output. */
  def duplicateFree(plan: LogicalPlan): Boolean = plan match {
    case _: LogicalRelation => true
    case p: Project => p.projectList.forall(_.deterministic) &&
      duplicateFree(p.child)
    case f: Filter => duplicateFree(f.child)
    case _ => false
  }
}

/** Join elimination from declared constraints — the rewrite that makes
  * "SELECT fact columns FROM fact JOIN dim ..." cost the same as not
  * writing the join. Two sound cases, both requiring that NO dimension
  * column is referenced above the join:
  *
  *  - LEFT OUTER join on `l.a = r.pk` with `pk` unique on the right
  *    subtree: every left row survives exactly once whether or not it
  *    matches (uniqueness forbids fan-out; outer-ness forbids drops), so
  *    the join is the identity on the left — remove it. Filters/projects
  *    on the right only reduce matches, which is invisible. No FK needed.
  *
  *  - INNER join on `l.fk = r.pk` with a declared FOREIGN KEY and the
  *    right side a bare (unfiltered) scan of the dim: the join keeps
  *    exactly the left rows with non-null fk, each exactly once —
  *    replace with `Filter(IsNotNull(fk), left)`. A filtered dim side
  *    disables this case (it could drop matches).
  *
  * The rule fires on Project/Aggregate parents only — nodes whose own
  * references are a hard upper bound on what the subtree must produce —
  * and matches the join key through intermediate projections by exprId,
  * so it composes with column pruning having already rewritten the tree.
  * At 100 TB the win is structural: a BI layer that always emits the
  * 6-way star join plan pays only for the dimensions a dashboard
  * actually displays. Kill switch `spark.graft.joinElimination=false`.
  */
object JoinEliminationRewrite extends Rule[LogicalPlan] with PredicateHelper {
  val flagKey = "spark.graft.joinElimination"

  import ConstraintPlanUtils.baseOf

  /** True iff `plan` is Project/Filter over a single base scan and `pk`
    * traces to a column declared unique there. Filters are fine: they
    * only thin a unique column further. */
  private def uniqueOn(plan: LogicalPlan, pk: Attribute): Boolean =
    baseOf(plan, pk).exists { case (path, col) =>
      ConstraintRegistry.isUnique(path, col) }

  /** True iff `plan` is an unfiltered scan view of the dim — required
    * for FK-based inner elimination. The one filter allowed is
    * `IsNotNull(pk)` (InferFiltersFromConstraints plants it under every
    * equi-join): a NULL pk can never match any fk, so dropping those
    * rows is invisible to the join. */
  private def unfiltered(plan: LogicalPlan, pk: Attribute): Boolean =
    plan match {
      case _: LogicalRelation => true
      case p: Project => unfiltered(p.child, pk)
      case Filter(cond, child) =>
        splitConjunctivePredicates(cond).forall {
          case IsNotNull(a: Attribute) => a.exprId == pk.exprId
          case _ => false
        } && unfiltered(child, pk)
      case _ => false
    }

  private def tryElim(j: Join, refs: AttributeSet): Option[LogicalPlan] = {
    val cond = j.condition match {
      case Some(EqualTo(a: AttributeReference, b: AttributeReference)) =>
        if (j.left.outputSet.contains(a) && j.right.outputSet.contains(b))
          Some((a, b))
        else if (j.left.outputSet.contains(b) && j.right.outputSet.contains(a))
          Some((b, a))
        else None
      case _ => None
    }
    cond.flatMap { case (la, ra) =>
      if (!refs.subsetOf(j.left.outputSet)) None
      else j.joinType match {
        case LeftOuter if uniqueOn(j.right, ra) =>
          Some(j.left)
        case Inner if unfiltered(j.right, ra) && uniqueOn(j.right, ra) =>
          baseOf(j.left, la).flatMap { case (factPath, fkCol) =>
            baseOf(j.right, ra).flatMap { case (dimPath, pkCol) =>
              ConstraintRegistry.fkTarget(factPath, fkCol) match {
                case Some((dimSuffix, pk))
                    if dimPath.endsWith(dimSuffix) && pk == pkCol =>
                  // RI + fk NOT NULL declared ⇒ the IsNotNull filter is
                  // a formality, but keeps the rewrite exact even if the
                  // declaration over-promises on nullability
                  Some(Filter(IsNotNull(la), j.left))
                case _ => None
              }
            }
          }
        case _ => None
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(flagKey, "true").toBoolean) plan
    else plan.transformDown {
      case p @ Project(_, j: Join) =>
        tryElim(j, p.references).map(nl => p.copy(child = nl)).getOrElse(p)
      case a @ Aggregate(_, _, j: Join, _) =>
        tryElim(j, a.references).map(nl => a.copy(child = nl)).getOrElse(a)
    }
}

/** Distinct elimination from declared unique keys: `SELECT DISTINCT`
  * over rows that provably carry a unique column is the identity — the
  * whole hash-aggregate exchange vanishes. By rewrite time Catalyst has
  * already turned Distinct into `Aggregate(out, out, child)` (grouping =
  * aggregate list = the child's attributes), so the rule matches that
  * shape, requires every expression to be a plain attribute, one of them
  * tracing to a ConstraintRegistry-unique column of the base scan, and
  * the child to be duplicate-free (Project/Filter over one relation —
  * a join fan-out would repeat dim pk values and the distinct would be
  * real). Replaced by a no-op Project preserving output order/ids.
  *
  * The 100 TB case: dedup-by-habit (`.distinct()` sprinkled after
  * projections of keyed tables) costs a full shuffle of the projected
  * data per call; with the pk declared the optimizer deletes them all.
  * Kill switch `spark.graft.distinctElimination=false`.
  */
object DistinctEliminationRewrite extends Rule[LogicalPlan] {
  val flagKey = "spark.graft.distinctElimination"

  import ConstraintPlanUtils.{baseOf, duplicateFree}

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(flagKey, "true").toBoolean) plan
    else plan.transformDown {
      // a distinct-shaped Aggregate: no aggregate functions, output ⊆
      // grouping (column pruning may have dropped the unique key from
      // the output while it still anchors the grouping)
      case a @ Aggregate(grouping, aggs, child, _)
          if grouping.nonEmpty &&
            grouping.forall(_.isInstanceOf[Attribute]) &&
            aggs.forall(_.isInstanceOf[Attribute]) &&
            aggs.map(_.exprId).toSet.subsetOf(
              grouping.map(_.asInstanceOf[Attribute].exprId).toSet) &&
            duplicateFree(child) &&
            grouping.exists(e =>
              baseOf(child, e.asInstanceOf[Attribute]).exists {
                case (path, colName) =>
                  ConstraintRegistry.isUnique(path, colName) }) =>
        Project(aggs, child)
    }
}
