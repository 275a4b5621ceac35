package graft
package catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.agg.{ContentMetrics, Windows}
import graft.functions.{GraftFunctions, TextFunctions}
import graft.operators._
import graft.schema.{DeliveryLogLite, JoinSideEvent, ScopedEvent}
import graft.streaming.{CombineDeliveryLog, InferredJoin}
import GateSupport._
import CatalogDefs._

/** Probabilistic sketches: hll, kmv, count-min, misra–gries, ams, exact-quantile references.
  *
  * 13 gates; split from SparkEntry.scala in round 14 (pure
  * refactor — every entry verbatim, hashes pinned by the sf0.01 sweep). */
object SketchGates extends GateFamily {

  def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // Sketches: HLL distinct-count registers per event_type — a custom
    // TypedImperativeAggregate whose register arrays combine map-side
    // (partial aggregation) and union by register-max. PolyHash64 input
    // hashing makes the full register state SQL-replayable, so the gate
    // hash-matches the SKETCH itself, not a tolerance on the estimate.
    "q62_hll_sketch" -> ((s, dir) => {
      agg.HllSketch.register(s)
      ev(s, dir).groupBy(col("event_type"))
        .agg(agg.HllSketch.hllRegisters(col("user_id"), p = 12).as("hll"))
    }),

    // Sketches: Count-Min frequency counters per event_type — counters are
    // sums, so the sketch is order/partition-invariant and merges by
    // elementwise add (map-side partials, slice→range composition). The
    // gate hash-matches the full counter state via the PolyHash64 replay.
    "q63_count_min" -> ((s, dir) => {
      agg.CountMinSketch.register(s)
      ev(s, dir).groupBy(col("event_type"))
        .agg(agg.CountMinSketch.countMin(col("user_id"), depth = 4,
          width = 1024).as("cm"))
    }),

    // Sketches: KMV bottom-k set-operation sketch — per-event-type
    // bottom-128 distinct user hashes; every pair's union bottom-k derives
    // from the samples alone (the KMV closure property) and yields INTEGER
    // Jaccard match counts, hash-gated end-to-end.
    "q66_kmv_jaccard" -> ((s, dir) =>
      agg.KmvSketch.jaccardMatchCounts(ev(s, dir), "event_type", "user_id",
        k = 128)),

    // Sketches × windows: ROLLING 7-day distinct-user HLL per event type —
    // the feature-store pattern (store per-window sketches, union for
    // ranges). The sliding explode is the A2/A3 counter shape; the sketch
    // agg merges map-side; registers hash-gate per window.
    "q69_sliding_hll" -> ((s, dir) => {
      agg.HllSketch.register(s)
      val day = 86400000L
      ev(s, dir).select(col("event_type"), col("user_id"),
          (col("ts_ms") - pmod(col("ts_ms"), lit(day))).as("d"))
        .select(col("event_type"), col("user_id"),
          explode(sequence(col("d"), col("d") + lit(6L * day), lit(day)))
            .as("win_end"))
        .groupBy(col("event_type"), col("win_end"))
        .agg(agg.HllSketch.hllRegisters(col("user_id"), p = 10).as("hll"))
    }),

    // EXACT φ-heavy hitters via Misra–Gries candidates + broadcast
    // verify: the two-pass shape that answers "which values exceed 1% of
    // the stream" shuffling O(k) rows instead of O(distinct). The fixture
    // mixes 8 hot keys (l_partkey ≡ 0 mod 3, keyed by mod 8 — ~4% of
    // rows each) into a sea of per-row-unique singletons, so the sketch
    // path genuinely churns; the oracle is the plain GROUP BY/HAVING the
    // operator's exact verify pass reproduces bit-for-bit.
    "q88_heavy_hitters" -> ((s, dir) => {
      val keyed = t(s, dir, "lineitem").select(
        when(col("l_partkey") % 3 === 0,
            concat(lit("p"), (col("l_partkey") % 8).cast("string")))
          .otherwise(concat(lit("u"), col("l_orderkey").cast("string"),
            lit("-"), col("l_linenumber").cast("string"))).as("value"))
      agg.MisraGries.heavyHitters(keyed, col("value"), phiDen = 100, k = 512)
    }),

    // Expand-free exact distinct: pre-group on (key, value) — "salt by
    // the value itself" — then count; a hot key's distinct work spreads
    // by value and the fact table is never Expanded.
    "q167_distinct_pregroup" -> ((s, dir) =>
      SkewAgg.exactDistinctPregrouped(
        ev(s, dir).select(col("event_type"),
          (col("ts_ms") - pmod(col("ts_ms"), lit(86400000L))).as("day_ms"),
          col("user_id")),
        Seq("event_type", "day_ms"), col("user_id"))),

    // Two-phase salted holistic state: per-shard collect_set then per-key
    // merge — the mergeable-state split for skewed keys; deterministic
    // sorted output rendered as a joined string for the oracle hash.
    "q168_salted_sets" -> ((s, dir) =>
      SkewAgg.saltedHolistic(
        ev(s, dir).select(col("event_type"),
          lpad(pmod(col("user_id"), lit(50)).cast("string"), 2, "0")
            .as("u2")),
        Seq("event_type"), col("u2"), salts = 8)
        .select(col("event_type"),
          array_join(col("distinct_values"), ",").as("members"))),

    // EXACT heavy hitters per SLIDING window (q88 × q108): hourly MG(64)
    // slices merge slice→range per 6h window (MisraGriesMergeAgg —
    // summaries through the exchange, not rows), candidate completeness
    // from k ≥ phiDen, then the broadcast exact-verify restores plain
    // per-window GROUP BY/HAVING semantics at O(windows·k) shuffle.
    "q112_sliding_heavy" -> ((s, dir) =>
      agg.MisraGries.slidingHeavyHitters(
        ev(s, dir).select(
          when(col("user_id") % 3 === 0,
              concat(lit("h"), (col("user_id") % 7).cast("string")))
            .otherwise(concat(lit("u"), col("event_id").cast("string")))
            .as("value"),
          col("ts_ms")),
        col("value"), col("ts_ms"), sliceMs = 3600000L, slicesPerWindow = 6,
        phiDen = 50, k = 64)),

    // Equi-depth feature discretization: exact decile cut points from the
    // bounded-sample quantile machinery (no global sort), assignment as a
    // literal codegen'd fold (boundary ties collapse left), then the
    // 10-group census. The ntile() alternative is a single-partition
    // global sort — unrunnable at 100 TB.
    "q113_equi_depth" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(
        cents(col("l_extendedprice")).as("x"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("key"))
      operators.ExactQuantiles.equiDepthBins(li, col("x"), col("key"),
          buckets = 10, bucketAs = "bucket")
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"), min(col("x")).as("min_cents"),
          max(col("x")).as("max_cents"), sum(col("x")).as("sum_cents"))
    }),

    // Token frequency-of-frequencies (Good–Turing/Zipf spectrum): raw
    // token counts re-keyed by count — the vocabulary-health census whose
    // exchange carries |vocab| then |distinct counts| rows, never tokens.
    "q115_freq_spectrum" -> ((s, dir) =>
      operators.CorpusOps.frequencySpectrum(
        t(s, dir, "documents"), "doc_id", "text")),

    // EXACT per-group quantiles over a continuous domain via bounded
    // uniform sample → rank bracket → band refinement (Munro–Paterson
    // lineage): O(k + band) shuffle instead of the O(distinct) histogram
    // shuffle q48 uses on its small integer domain. Price cents per
    // return flag — ~119k distinct values at sf0.1, of which only the
    // ~2δ/m band reaches the second shuffle. The sample's randomness
    // never reaches the output (any verified bracket yields the same
    // exact quantile), so the gate is the plain cumulative-rank answer.
    "q89_exact_quantiles" -> ((s, dir) =>
      operators.ExactQuantiles.quantiles(
        t(s, dir, "lineitem"),
        Seq("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long"),
        concat(col("l_orderkey").cast("string"), lit("-"),
          col("l_linenumber").cast("string")),
        percents = Seq(25, 50, 75, 95))),

    // Audience overlap via KMV/theta set-operation estimates: each order
    // priority's ~1300-customer set sketched to its bottom-64 hashes,
    // every pair's union AND intersection cardinality estimated from the
    // sketches alone — the segment-overlap question HLL cannot answer.
    // k=64 ≪ |set|, so the estimator path (not the exact under-full
    // degenerate) is what the oracle replays.
    "q225_kmv_overlap" -> ((s, dir) =>
      agg.KmvSketch.intersectionEstimate(
        t(s, dir, "orders"), "o_orderpriority", "o_custkey", k = 64)),

    // AMS tug-of-war F2 sketch vs exact self-join size of lineitem on
    // partkey: 5×16 sign-sum estimators in ONE map-side-combined pass
    // (80 codegen'd sums), median-of-means, and the err_ppm audit
    // against the exact key census — the join-size/skew early warning.
    "q383_ams_f2" -> ((s, dir) => {
      functions.PolyHash64.register(s)
      decStr(operators.AmsSketch.f2AuditE6(t(s, dir, "lineitem"),
        col("l_partkey"), groups = 5, reps = 16))
    }),
  )

  def oracleSql: Seq[(String, String)] = Seq(

    "q62_hll_sketch" -> q62OracleSql,

    "q63_count_min" -> q63OracleSql,

    "q66_kmv_jaccard" -> q66OracleSql,

    "q69_sliding_hll" -> q69OracleSql,

    // q88: the exact semantics heavyHitters guarantees — plain
    // GROUP BY/HAVING at ceil(n/100); the MG sketch is an internal
    // candidate generator the oracle never needs to see.
    "q88_heavy_hitters" ->
      """WITH v AS (
        | SELECT CASE WHEN l_partkey % 3 = 0
        |   THEN 'p' || CAST(l_partkey % 8 AS VARCHAR)
        |   ELSE 'u' || CAST(l_orderkey AS VARCHAR) || '-'
        |     || CAST(l_linenumber AS VARCHAR) END AS value
        | FROM lineitem)
        |SELECT value, CAST(count(*) AS BIGINT) AS cnt
        |FROM v
        |GROUP BY value
        |HAVING count(*) >= ((SELECT count(*) + 99 FROM v) // 100)""".stripMargin,

    // q167: plain two-level GROUP BY replay.
    "q167_distinct_pregroup" ->
      """WITH p AS (SELECT event_type,
        |  epoch_ms(ts) - epoch_ms(ts) % 86400000 AS day_ms,
        |  user_id, count(*) AS n
        | FROM events GROUP BY 1, 2, 3)
        |SELECT event_type, day_ms, CAST(sum(n) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_distinct
        |FROM p GROUP BY 1, 2""".stripMargin,

    // q168: sorted distinct membership string per key.
    "q168_salted_sets" ->
      """SELECT event_type,
        |  string_agg(DISTINCT lpad(CAST(user_id % 50 AS VARCHAR), 2, '0'),
        |    ',' ORDER BY lpad(CAST(user_id % 50 AS VARCHAR), 2, '0'))
        |    AS members
        |FROM events GROUP BY 1""".stripMargin,

    // q112: the exact per-window semantics slidingHeavyHitters
    // guarantees — every 6h-covering window from the hourly slice grid,
    // plain GROUP BY/HAVING at ceil(win_n/50); the MG slice sketches and
    // their merge are internal candidate generators the oracle never
    // needs to see (exactly the q88 contract, lifted to sliding windows).
    "q112_sliding_heavy" ->
      """WITH e AS (
        | SELECT CASE WHEN user_id % 3 = 0
        |    THEN 'h' || CAST(user_id % 7 AS VARCHAR)
        |    ELSE 'u' || CAST(event_id AS VARCHAR) END AS value,
        |  epoch_ms(ts) - epoch_ms(ts) % 3600000 AS slice_ms
        | FROM events),
        |x AS (SELECT value, slice_ms - k.k * 3600000 AS window_start_ms
        |      FROM e, (SELECT unnest(range(0, 6)) AS k) k(k)),
        |t AS (SELECT window_start_ms, count(*) AS wn FROM x GROUP BY 1),
        |g AS (SELECT window_start_ms, value, count(*) AS cnt
        |      FROM x GROUP BY 1, 2)
        |SELECT g.window_start_ms, g.value, CAST(g.cnt AS BIGINT) AS cnt
        |FROM g JOIN t USING (window_start_ms)
        |WHERE g.cnt >= (t.wn + 49) // 50""".stripMargin,

    // q113: cut points = values at ranks ceil(n·b/10) of the (value, key)
    // order — identical to "smallest v with cumulative count ≥ target",
    // which is what the bounded-sample selection computes; bucket = 1 +
    // |cuts strictly below v| (boundary ties collapse left on both sides).
    "q113_equi_depth" ->
      """WITH v AS (SELECT CAST(round(l_extendedprice*100) AS BIGINT) AS x,
        |  l_orderkey*10 + l_linenumber AS key FROM lineitem),
        |n AS (SELECT count(*) AS c FROM v),
        |r AS (SELECT x, row_number() OVER (ORDER BY x, key) AS rn FROM v),
        |cuts AS (SELECT r.x AS cut FROM r, n
        | WHERE r.rn IN (SELECT (n.c*b + 9)//10
        |   FROM (SELECT unnest(range(1,10)) AS b) bb(b), n)),
        |b AS (SELECT v.x,
        |  1 + (SELECT count(*) FROM cuts WHERE cut < v.x) AS bucket FROM v)
        |SELECT CAST(bucket AS INTEGER) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  min(x) AS min_cents, max(x) AS max_cents,
        |  CAST(sum(x) AS BIGINT) AS sum_cents
        |FROM b GROUP BY bucket""".stripMargin,

    // q115: raw-token census re-keyed by count — N_c spectrum.
    "q115_freq_spectrum" ->
      """WITH toks AS (SELECT unnest(regexp_split_to_array(
        |   trim(lower(text)), '\s+')) AS g FROM documents),
        |c AS (SELECT g, count(*) AS cnt FROM toks GROUP BY 1)
        |SELECT CAST(cnt AS BIGINT) AS cnt,
        |  CAST(count(*) AS BIGINT) AS n_terms
        |FROM c GROUP BY cnt""".stripMargin,

    // Exact discrete quantile: smallest v with cum count >= ceil(n*p/100),
    // all-integer arithmetic — the unique answer any verified bracket
    // refines to.
    "q89_exact_quantiles" ->
      """WITH base AS (
        | SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        | FROM lineitem),
        |n AS (SELECT l_returnflag, count(*) AS n FROM base GROUP BY 1),
        |hist AS (SELECT l_returnflag, v, count(*) AS c FROM base GROUP BY 1, 2),
        |cum AS (
        | SELECT l_returnflag, v,
        |  SUM(c) OVER (PARTITION BY l_returnflag ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        | FROM hist),
        |p AS (SELECT * FROM (VALUES (25), (50), (75), (95)) t(percent))
        |SELECT cum.l_returnflag, CAST(p.percent AS BIGINT) AS percent,
        |  MIN(cum.v) AS quantile
        |FROM cum
        |JOIN n ON n.l_returnflag = cum.l_returnflag
        |JOIN p ON cum.cum >= ((n.n * p.percent + 99) // 100)
        |GROUP BY 1, 2""".stripMargin,

    "q225_kmv_overlap" -> q225OracleSql,

    "q383_ams_f2" -> q383OracleSql,
  )
}
