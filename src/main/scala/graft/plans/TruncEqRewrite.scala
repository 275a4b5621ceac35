package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Semantics-preserving optimizer rule: rewrite
  * `date_trunc(unit, ts) = L` into the sargable range
  * `ts >= L AND ts < L + unit` so the predicate reaches the parquet
  * scan as PushedFilters / partition pruning — the difference between
  * a full 100 TB scan and reading one day.
  *
  * Spark's own UnwrapCastInBinaryComparison does this for casts but
  * NOT for date_trunc equality, which is how analysts actually write
  * day filters; left as-is the TruncTimestamp wraps the column and the
  * data source sees no filter at all.
  *
  * Correctness guards (each bails to the original expression):
  *  - unit must be DAY/HOUR/MINUTE (fixed-length in UTC);
  *  - session timezone must be UTC (truncation is TZ-dependent; the
  *    builders here pin UTC, anything else passes through untouched);
  *  - a literal MISALIGNED to the unit (`date_trunc('day', ts) =
  *    '…T07:00'`) can never match: it folds to `ts < ts`, which has
  *    the identical three-valued truth table (NULL iff ts is NULL,
  *    else FALSE). Aligned rewrites also match NULL-for-NULL: the
  *    range form is NULL exactly where the equality was.
  *
  * Enabled by default under [[graft.GraftExtensions]]; kill switch
  * `spark.graft.rewriteTruncEq=false`.
  */
object TruncEqRewrite extends Rule[LogicalPlan] {
  val flagKey = "spark.graft.rewriteTruncEq"

  private val unitMicros: Map[String, Long] = Map(
    "minute" -> 60L * 1000000L,
    "hour" -> 3600L * 1000000L,
    "day" -> 86400L * 1000000L)

  private def unitOf(fmt: Expression, ts: Expression,
      lit: Literal): Option[Long] = fmt match {
    // ts.deterministic: every rewrite below duplicates `ts` into two
    // bounds (or `ts < ts` for the misaligned case) — a non-deterministic
    // child would be evaluated twice with different draws, changing the
    // predicate. Spark's UnwrapCastInBinaryComparison guards identically.
    case Literal(f: UTF8String, StringType) if lit.value != null &&
        lit.dataType == TimestampType && ts.dataType == TimestampType &&
        ts.deterministic =>
      unitMicros.get(f.toString.toLowerCase(java.util.Locale.ROOT))
    case _ => None
  }

  private def rewrite(fmt: Expression, ts: Expression,
      lit: Literal): Option[Expression] =
    unitOf(fmt, ts, lit).map { unit =>
      val v = lit.value.asInstanceOf[Long]
      if (v % unit == 0)
        And(GreaterThanOrEqual(ts, lit),
          LessThan(ts, Literal(v + unit, TimestampType)))
      else LessThan(ts, ts) // impossible; NULL iff ts is NULL
    }

  /** Inequalities on the truncated value — alignment-aware preimage
    * bounds (floorDiv alignment handles pre-epoch literals; the
    * truncated value is always the multiple-of-unit at or below ts):
    *   trunc(ts) >= L ⇔ ts >= ceilAlign(L)
    *   trunc(ts) >  L ⇔ ts >= floorAlign(L) + unit
    *   trunc(ts) <= L ⇔ ts <  floorAlign(L) + unit
    *   trunc(ts) <  L ⇔ ts <  ceilAlign(L)
    * `litLeft` flips the comparison first. addExact bails on overflow. */
  private def rewriteCmp(cmp: BinaryComparison, fmt: Expression,
      ts: Expression, lit: Literal, litLeft: Boolean): Option[Expression] =
    unitOf(fmt, ts, lit).flatMap { unit =>
      val v = lit.value.asInstanceOf[Long]
      val floorA = Math.floorDiv(v, unit) * unit
      try {
        val ceilA = if (v % unit == 0) v
          else Math.addExact(floorA, unit)
        val nextB = Math.addExact(floorA, unit)
        def ge(b: Long) = GreaterThanOrEqual(ts, Literal(b, TimestampType))
        def lt(b: Long) = LessThan(ts, Literal(b, TimestampType))
        Some(cmp match {
          case _: GreaterThanOrEqual =>
            if (litLeft) lt(nextB) else ge(ceilA) // L >= t ⇔ t <= L
          case _: GreaterThan =>
            if (litLeft) lt(ceilA) else ge(nextB) // L > t ⇔ t < L
          case _: LessThanOrEqual =>
            if (litLeft) ge(ceilA) else lt(nextB) // L <= t ⇔ t >= L
          case _: LessThan =>
            if (litLeft) ge(nextB) else lt(ceilA) // L < t ⇔ t > L
          case _ => return None
        })
      } catch { case _: ArithmeticException => None }
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(flagKey, "true").toBoolean ||
        conf.sessionLocalTimeZone != "UTC") plan
    else plan.transformAllExpressions {
      case eq @ EqualTo(TruncTimestamp(fmt, ts, _), l: Literal) =>
        rewrite(fmt, ts, l).getOrElse(eq)
      case eq @ EqualTo(l: Literal, TruncTimestamp(fmt, ts, _)) =>
        rewrite(fmt, ts, l).getOrElse(eq)
      case cmp @ BinaryComparison(TruncTimestamp(fmt, ts, _), l: Literal)
          if !cmp.isInstanceOf[EqualTo] =>
        rewriteCmp(cmp, fmt, ts, l, litLeft = false).getOrElse(cmp)
      case cmp @ BinaryComparison(l: Literal, TruncTimestamp(fmt, ts, _))
          if !cmp.isInstanceOf[EqualTo] =>
        rewriteCmp(cmp, fmt, ts, l, litLeft = true).getOrElse(cmp)
    }
}
