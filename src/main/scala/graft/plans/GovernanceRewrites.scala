package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.StringType

/** Column masking policies — the governance feature warehouses attach
  * to sensitive columns (Snowflake masking policies, BigQuery column
  * ACLs): a column declared masked is rewritten AT THE SCAN, so every
  * query in the session sees only the masked value — projections,
  * filters, joins, aggregates all operate downstream of the mask,
  * exactly like querying through a secure view. Policies are declared
  * against the same path-suffix identity as [[ConstraintRegistry]].
  *
  * Three deterministic policies over STRING columns:
  *  - `redact`: the constant '***' (cardinality destroyed);
  *  - `partial`: first two characters + '***' (prefix analytics
  *    survive);
  *  - `sha256`: lowercase hex SHA-256 of the value — deterministic
  *    tokenization, so joins/grouping on the masked column still
  *    match across tables (both engines produce identical digests,
  *    which is what makes the policy oracle-testable).
  * NULL stays NULL under every policy (a masked NULL leaking "there
  * was a value here" would be worse).
  *
  * Mechanics: each masked scan is wrapped ONCE in a Project that
  * aliases the masked attribute UNDER ITS OWN exprId, so every
  * downstream reference — by name or by id — resolves to the masked
  * expression; the rewrite recurses manually (not transformDown,
  * which would re-wrap the relation it just wrapped). Kill switch
  * `spark.graft.masking=false` models the exempt role. */
object MaskingRegistry {
  /** (location suffix, column) → policy name. */
  private val policies = TrieMap.empty[(String, String), String]

  val Policies = Set("redact", "partial", "sha256")

  def declareMask(pathSuffix: String, col: String, policy: String): Unit = {
    require(Policies.contains(policy), s"unknown masking policy $policy")
    policies.put((pathSuffix, col), policy)
  }

  def policyOf(path: String, col: String): Option[String] =
    policies.collectFirst {
      case ((s, c), p) if c == col && ConstraintRegistry.suffixOk(path, s) => p
    }

  def clear(): Unit = policies.clear()
}

/** Transparent marker around an applied mask expression — evaluates
  * and code-generates as its child. It exists so [[MaskingRewrite]]
  * can tell a raw scan attribute from one it already masked in an
  * earlier fixed-point iteration, even after CollapseProject inlines
  * the mask into downstream expressions (an Alias-based marker dies in
  * that inlining; an expression node survives it). */
case class MaskApplied(child: Expression) extends UnaryExpression {
  override def dataType: org.apache.spark.sql.types.DataType =
    child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
      : Any = child.eval(input)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression)
      : MaskApplied = copy(child = newChild)
}

object MaskingRewrite extends Rule[LogicalPlan] {
  val flagKey = "spark.graft.masking"

  private def maskExpr(a: Attribute, policy: String): Expression =
    policy match {
      case "redact" =>
        If(IsNull(a), Literal.create(null, StringType), Literal("***"))
      case "partial" =>
        Concat(Seq(Substring(a, Literal(1), Literal(2)), Literal("***")))
      case "sha256" =>
        // the analyzer isn't around to insert the string→binary cast
        Sha2(Cast(a, org.apache.spark.sql.types.BinaryType), Literal(256))
    }

  /** Masked aliases get FRESH exprIds (re-issuing the original id under
    * an expression that references that same id makes the plan
    * invalid), and every reference above the scan is substituted to the
    * new attribute — names and types are untouched, so the root schema
    * is stable and plan-change validation passes. */
  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(flagKey, "true").toBoolean) return plan
    // raw exprIds already masked by a previous fixed-point iteration —
    // the MaskApplied marker survives projection collapsing, so a
    // second pass never double-masks
    val done: Set[ExprId] = plan.collect { case n =>
      n.expressions.flatMap(_.collect {
        case m: MaskApplied => m.references.map(_.exprId).toSeq
      }.flatten)
    }.flatten.toSet
    var subst = Map.empty[ExprId, Attribute]
    def go(p: LogicalPlan): LogicalPlan = p match {
      case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.headOption.map(_.toString) match {
          case None => lr
          case Some(path) =>
            var any = false
            val masked = lr.output.map { a =>
              MaskingRegistry.policyOf(path, a.name) match {
                case Some(policy)
                    if a.dataType == StringType && !done(a.exprId) =>
                  val al =
                    Alias(MaskApplied(maskExpr(a, policy)), a.name)()
                  subst += a.exprId -> al.toAttribute
                  any = true
                  al
                case _ => a
              }
            }
            if (any) Project(masked, lr) else lr
        }
      case other =>
        val withNew = other.mapChildren(go)
        if (subst.isEmpty) withNew
        else withNew.transformExpressions {
          case ar: AttributeReference if subst.contains(ar.exprId) =>
            subst(ar.exprId)
        }
    }
    go(plan)
  }
}

/** Broadcast decisions from DECLARED table statistics — the CBO lever
  * OSS Spark leaves to file-size estimation: a lake table whose scan
  * estimate exceeds autoBroadcastJoinThreshold (deep schema, wide
  * files, column pruning invisible to the estimator) still broadcasts
  * fine when the OWNER knows it has 25 rows. `declareRowCount` is that
  * knowledge (RELY semantics, like every other registry entry); joins
  * against a declared-small side get an explicit BROADCAST join hint,
  * which physical planning honors regardless of size estimates.
  *
  * The hint is injected into the Join node's own JoinHint (not a
  * ResolvedHint wrapper — EliminateResolvedHint has already run by
  * extraOptimizations time), only when that side carries no caller
  * hint already, and only for join types Spark can broadcast on that
  * side. Kill switch `spark.graft.statsBroadcast=false`; row threshold
  * `spark.graft.statsBroadcast.maxRows` (default 100000). */
object StatsBroadcastRewrite extends Rule[LogicalPlan] {
  val flagKey = "spark.graft.statsBroadcast"
  val maxRowsKey = "spark.graft.statsBroadcast.maxRows"

  /** (location suffix) → declared row count. */
  private val rowCounts = TrieMap.empty[String, Long]

  def declareRowCount(pathSuffix: String, rows: Long): Unit = {
    require(rows >= 0)
    rowCounts.put(pathSuffix, rows)
  }

  def clearCounts(): Unit = rowCounts.clear()

  private def declaredRows(plan: LogicalPlan): Option[Long] = plan match {
    case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      fs.location.rootPaths.headOption.flatMap { p =>
        rowCounts.collectFirst {
          case (s, n) if ConstraintRegistry.suffixOk(p.toString, s) => n
        }
      }
    case p: Project => declaredRows(p.child)
    case f: Filter => declaredRows(f.child) // filters only shrink
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(flagKey, "true").toBoolean) plan
    else {
      val maxRows = conf.getConfString(maxRowsKey, "100000").toLong
      val bc = Some(HintInfo(strategy = Some(BROADCAST)))
      plan.transformUp {
        case j: Join =>
          val leftSmall = j.hint.leftHint.isEmpty &&
            declaredRows(j.left).exists(_ <= maxRows) && canBuildLeft(j)
          val rightSmall = j.hint.rightHint.isEmpty &&
            declaredRows(j.right).exists(_ <= maxRows) &&
            canBuildRight(j)
          if (!leftSmall && !rightSmall) j
          else j.copy(hint = JoinHint(
            if (leftSmall) bc else j.hint.leftHint,
            if (rightSmall) bc else j.hint.rightHint))
      }
    }

  // Spark can broadcast the right side for inner/left-ish joins and
  // the left side for inner/right-ish joins; mirror JoinSelection's
  // canBuildBroadcastRight/Left predicates conservatively.
  private def canBuildRight(j: Join): Boolean = j.joinType match {
    case org.apache.spark.sql.catalyst.plans.Inner |
         org.apache.spark.sql.catalyst.plans.Cross |
         org.apache.spark.sql.catalyst.plans.LeftOuter |
         org.apache.spark.sql.catalyst.plans.LeftSemi |
         org.apache.spark.sql.catalyst.plans.LeftAnti => true
    case _: org.apache.spark.sql.catalyst.plans.ExistenceJoin => true
    case _ => false
  }

  private def canBuildLeft(j: Join): Boolean = j.joinType match {
    case org.apache.spark.sql.catalyst.plans.Inner |
         org.apache.spark.sql.catalyst.plans.Cross |
         org.apache.spark.sql.catalyst.plans.RightOuter => true
    case _ => false
  }
}
