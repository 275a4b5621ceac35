package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Loud in-plan cardinality guard for the cumulative-census pattern.
  *
  * Several exact operators (rank statistics, survival life tables, KS
  * drift) deliberately run an UNPARTITIONED cumulative window — but only
  * after collapsing the raw data to a census frame whose size is bounded
  * by a DOMAIN (distinct values, time resolution), not by the row count.
  * That contract is documented at each site; this guard makes violating
  * it fail loudly instead of slowly: a census that somehow arrives at
  * data scale (e.g. raw cents fed where bucketed values were promised)
  * would otherwise sort the world on one reducer.
  *
  * Mechanics: the guard is a PLAN-LEVEL check, not an eager count — no
  * extra action, no caching, no laziness change. `assert_true` returns
  * NULL when the predicate holds, so `payload + coalesce(assert, 0)` is
  * arithmetically the identity on the happy path (and rides the same
  * WindowExec as the census cumulation when `censusN` shares its window
  * spec); past the bound the task raises with an actionable message.
  */
object Census {

  /** Default ceiling on the rows a single-partition census window may
    * sort: 2e6 rows is seconds and ~tens of MB on one task — past it
    * the "census" is data, not domain, and the plan must change. */
  val MaxRows = 2000000L

  /** `payload` (BIGINT) unchanged while `censusN` ≤ `maxRows`; raises
    * with an actionable message otherwise. `censusN` should be
    * `count(lit(1))` over the census frame — cheapest as an
    * unbounded-frame aggregate on the SAME window spec the cumulation
    * uses, so no extra exchange appears. */
  def guardLong(payload: Column, censusN: Column, what: String,
      maxRows: Long = MaxRows): Column =
    payload + coalesce(
      assert_true(censusN <= lit(maxRows),
        concat(lit(s"$what: census frame exceeds $maxRows rows ("),
          censusN.cast("string"),
          lit(") — the bounded-domain contract is violated; bucket the" +
            " values coarser, or use PrefixScan.runningSum (the same" +
            " monoid, distributed) instead of the census window")))
        .cast("long"),
      lit(0L))

  /** Constant-zero partition key for a bounded-census window. A census
    * cumulation INTENDS a single partition (the frame is domain-bounded
    * and guarded by [[guardLong]]), but an empty partition spec makes
    * every WindowExec log "No Partition Defined … serious performance
    * degradation", drowning real offenders in plan audits. The key must
    * be constant per row yet OPAQUE to the optimizer: `hash(c)*0` is
    * constant-folded to a literal in aggregate-fed plans (Spark 4's
    * ReorderAssociativeOperator + EliminateWindowPartitions then strip
    * the partition entirely — measured on q214's plan), so instead use
    * `hash(c) div 2³²`: always 0 because a 32-bit hash's magnitude is
    * < 2³², but no folding rule does that range analysis. hash is never
    * null, so every row lands in the same partition — identical results,
    * single-partition execution (intended), silent log. */
  def onePartKey(c: Column): Column =
    call_function("div", hash(c).cast("long"), lit(4294967296L))
}
