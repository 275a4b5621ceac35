package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Semantics-preserving optimizer rule: comparisons of
  * `unix_micros/unix_millis/unix_seconds(ts)` against a long literal
  * become sargable comparisons on `ts` itself, so the predicate reaches
  * the parquet scan as PushedFilters / partition pruning.
  *
  * This is the engine's own hot seam: every events query projects
  * `ts_ms = unix_millis(ts)` once at the read
  * (SparkEntry.ev(), ContentMetrics) and filters downstream on the
  * millis column. Catalyst pushes the filter below the projection —
  * producing exactly `unix_millis(ts) < L` at the scan boundary — but
  * Spark has no unwrap rule for the unix_* family (only for casts), so
  * the data source sees no filter and reads every row group. At 100 TB
  * that is the difference between pruning to a day and a full scan.
  *
  * Exactness: Spark's `TimestampToLongBase.nullSafeEval` is
  * `Math.floorDiv(micros, k)` (k = 1 / 1e3 / 1e6). floor-division by a
  * positive constant is monotone with exact preimage bounds, valid for
  * BOTH epoch signs (pre-1970 timestamps included):
  *
  *   floor(us/k) >= L  ⇔  us >= L*k
  *   floor(us/k) <= L  ⇔  us <  (L+1)*k
  *   floor(us/k) =  L  ⇔  L*k <= us < (L+1)*k
  *
  * NULL semantics are preserved: each rewritten comparison is NULL
  * exactly when `ts` is NULL (And(NULL, NULL) = NULL for the equality
  * range). Bound arithmetic uses multiplyExact/addExact and bails to
  * the original expression on overflow rather than wrapping.
  *
  * Bonus seam: when the argument is `cast(ntz AS timestamp)` under the
  * UTC session timezone (the belt-and-braces NTZ normalization at
  * `ev()`), the cast is micros-identity, so the comparison lands
  * directly on the stored TIMESTAMP_NTZ column with NTZ literals —
  * sargable against NTZ-flavored parquet too. Non-UTC sessions keep
  * the cast (the rewrite on the cast expression is still exact, it is
  * just not a pushable filter).
  *
  * Enabled by default under [[graft.GraftExtensions]]; kill switch
  * `spark.graft.rewriteEpochCmp=false`.
  */
object EpochCmpRewrite extends Rule[LogicalPlan] {
  val flagKey = "spark.graft.rewriteEpochCmp"

  /** (storage expression to compare on, its literal dataType, scale k). */
  private def seam(e: Expression): Option[(Expression, Long)] = {
    val unscaled = e match {
      case UnixMicros(c)  => Some((c, 1L))
      case UnixMillis(c)  => Some((c, 1000L))
      case UnixSeconds(c) => Some((c, 1000000L))
      case _              => None
    }
    unscaled.map { case (c, k) =>
      c match {
        // cast(NTZ → LTZ) is micros-identity under UTC: strip it so the
        // comparison lands on the stored column (pushable). Guarded by
        // the UTC check in apply().
        case Cast(inner, TimestampType, _, _)
            if inner.dataType == TimestampNTZType => (inner, k)
        case _ => (c, k)
      }
    }
  }

  private def tsLit(v: Long, like: Expression): Literal =
    Literal(v, like.dataType)

  /** ts >= L*k — NULL iff ts is NULL, like the original. */
  private def ge(ts: Expression, l: Long, k: Long): Expression =
    GreaterThanOrEqual(ts, tsLit(Math.multiplyExact(l, k), ts))

  /** ts < (L+1)*k */
  private def lt(ts: Expression, l: Long, k: Long): Expression =
    LessThan(ts, tsLit(Math.multiplyExact(Math.addExact(l, 1L), k), ts))

  private def rewrite(cmp: BinaryComparison, fn: Expression,
      l: Long, litLeft: Boolean): Option[Expression] =
    seam(fn).flatMap { case (ts, k) =>
      if (ts.dataType != TimestampType && ts.dataType != TimestampNTZType)
        None
      else try {
        // strict lower bound: ts < L*k  (⇔ floor < L)
        def ltExclusive(): Expression =
          LessThan(ts, tsLit(Math.multiplyExact(l, k), ts))
        Some(cmp match {
          // The equality rewrite duplicates `ts` into both bounds; a
          // non-deterministic child would be drawn twice (Spark's
          // UnwrapCastInBinaryComparison guards the same way). The
          // single-use inequality branches below are draw-preserving
          // either way.
          case _: EqualTo if !ts.deterministic => return None
          case _: EqualTo => And(ge(ts, l, k), lt(ts, l, k))
          // litLeft flips the comparison: L >= f(ts) means f(ts) <= L.
          case _: GreaterThanOrEqual =>
            if (litLeft) lt(ts, l, k) else ge(ts, l, k)
          case _: GreaterThan =>
            if (litLeft) ltExclusive() else ge(ts, Math.addExact(l, 1L), k)
          case _: LessThanOrEqual =>
            if (litLeft) ge(ts, l, k) else lt(ts, l, k)
          case _: LessThan =>
            if (litLeft) ge(ts, Math.addExact(l, 1L), k) else ltExclusive()
          case _ => return None
        })
      } catch { case _: ArithmeticException => None }
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(flagKey, "true").toBoolean ||
        conf.sessionLocalTimeZone != "UTC") plan
    else plan.transformAllExpressions {
      case cmp @ BinaryComparison(fn, Literal(v: Long, LongType))
          if seam(fn).isDefined =>
        rewrite(cmp, fn, v, litLeft = false).getOrElse(cmp)
      case cmp @ BinaryComparison(Literal(v: Long, LongType), fn)
          if seam(fn).isDefined =>
        rewrite(cmp, fn, v, litLeft = true).getOrElse(cmp)
    }
}
