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

/** Privacy: k-anon, l-div, t-closeness, dp mechanisms, masking, crypto-shred, audit sinks.
  *
  * 9 gates; split from SparkEntry.scala in round 14 (pure
  * refactor — every entry verbatim, hashes pinned by the sf0.01 sweep). */
object PrivacyGates extends GateFamily {

  def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // Right-to-be-forgotten, end to end: tombstone every event of the
    // erased users in the mutable source (one CDC delete commit),
    // propagate through the CDC-maintained per-day derived aggregate
    // (group-scoped recompute), and emit the post-erasure derived table
    // with a zero-residue audit column — the oracle recomputes the
    // aggregate from raw events MINUS the erased users, so any residue
    // anywhere in the pipeline hash-mismatches.
    "q191_erasure" -> ((s, dir) => {
      val base = ev(s, dir).select(
        col("event_id").as("k"),
        date_format(col("ts"), "yyyy-MM-dd").as("dt"),
        col("user_id"),
        cents(col("value")).as("v_cents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val c1 = base.withColumn("ver", lit(1L)).withColumn("del", lit(false))
      val erase = base.where(col("user_id") % 9 === 0)
        .withColumn("ver", lit(2L)).withColumn("del", lit(true))
      val root = queryTmp("graft_erasure_q191")
      val src = new sinks.UpsertTable(s"$root/src", Seq("k"), "ver",
        Seq("dt"), Some("del"))
      val drv = new sinks.UpsertTable(s"$root/drv", Seq("dt"), "__ver",
        Nil, Some("__dead"))
      val derived = new sinks.DerivedAggTable(src, drv, Seq("dt"),
        df => df.groupBy("dt").agg(count(lit(1)).as("n"),
          sum("v_cents").as("cents"),
          countDistinct("user_id").as("n_users")),
        s"$root/_ckpt")
      src.upsert(c1)
      derived.refresh(s) // pre-erasure state is maintained, not recomputed
      src.upsert(erase)
      derived.refresh(s) // erasure propagates via touched-group recompute
      val residue = src.snapshot(s).where(col("user_id") % 9 === 0)
        .agg(count(lit(1)).as("residue_rows"))
      drv.snapshot(s).select("dt", "n", "cents", "n_users")
        .crossJoin(broadcast(residue))
    }),

    // Privacy audit: k-anonymity + l-diversity per quasi-identifier
    // group. QI = (nation, segment, $1k balance bucket); sensitive =
    // the customer's dominant order priority (ties break
    // lexicographically). One QI hash-aggregate with a partial-distinct
    // sensitive count — group space, not row count, bounds the output.
    "q211_k_anonymity" -> ((s, dir) => {
      val wDom = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("cnt").desc, col("o_orderpriority"))
      val sens = t(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(wDom))
        .where(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderpriority").as("sens"))
      val qi = t(s, dir, "customer")
        .join(sens, col("c_custkey") === col("o_custkey"))
        .select(col("c_nationkey").cast("long").as("nation"),
          col("c_mktsegment").as("segment"),
          floor(col("c_acctbal") / 1000d).cast("long").as("bal_bucket"),
          col("sens"))
      operators.Privacy.kAnonymityAudit(qi,
        Seq("nation", "segment", "bal_bucket"), "sens", k = 5)
    }),

    // Local-DP private histogram: randomized response over the
    // "high-value event" bit with per-user contribution bounding (≤3
    // rows per user×type). true_count rides along as the gate's audit
    // column — a production sink drops it. The oracle replays the whole
    // mechanism: the bounding window, both PolyHash64 coin chains, and
    // the integer debias.
    "q224_private_histogram" -> ((s, dir) =>
      operators.Privacy.randomizedResponse(
        t(s, dir, "events"), idCol = "event_id", userCol = "user_id",
        groupCol = "event_type", bit = col("value") >= 50.0,
        salt = "rrv1", maxPerUser = 3)),

    // t-closeness (the rung above q211's k/l audit): a QI group can
    // satisfy k and l yet leak by SKEW — its sensitive distribution far
    // from the table's. Ordered EMD against the global order-priority
    // distribution as an exact integer ratio, threshold t = 1/2 decided
    // by cross-multiplication. Same QI grouping as q211.
    "q250_t_closeness" -> ((s, dir) => {
      val wDom = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("cnt").desc, col("o_orderpriority"))
      val sens = t(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(wDom))
        .where(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderpriority").as("sens"))
      val qi = t(s, dir, "customer")
        .join(sens, col("c_custkey") === col("o_custkey"))
        .select(col("c_nationkey").cast("long").as("nation"),
          col("c_mktsegment").as("segment"),
          floor(col("c_acctbal") / 1000d).cast("long").as("bal_bucket"),
          col("sens"))
      decStr(operators.Privacy.tClosenessAudit(qi,
        Seq("nation", "segment", "bal_bucket"), "sens", tNum = 1, tDen = 2))
    }),

    // Privacy (third audit): recursive (c,l)-diversity over the
    // (nation, segment) QI grid with order priority as the sensitive
    // attribute — c = 1/3 sits at the uniform-distribution boundary so
    // both verdicts genuinely occur; the test is all-integer.
    "q297_l_diversity" -> ((s, dir) => {
      val joined = t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
      operators.Privacy.recursiveLDiversity(joined,
        Seq("c_nationkey", "c_mktsegment"), "o_orderpriority",
        cNum = 1L, cDen = 3L, l = 3)
    }),

    // Central-DP noisy histogram via the geometric mechanism (discrete
    // Laplace, ε = 1): per event type, count + symmetric-geometric
    // noise from two PolyHash64 chains — deterministic, so the gate
    // hash-verifies the mechanism itself; true count rides along as
    // the audit column.
    "q432_dp_counts" -> ((s, dir) =>
      operators.Privacy.geometricNoisyCounts(ev(s, dir), "event_type",
        salt = "dp1", epsilonE6 = 1000000L)),

    // Column masking policies (MaskingRewrite): a gate-private customer
    // copy declares c_name → sha256 tokenization and c_mktsegment →
    // partial; every consumer — including the post-mask filter — sees
    // only masked values, exactly like querying a secure view. The
    // private path keeps the session-global registry from touching any
    // other gate's scans.
    "q353_masking" -> ((s, dir) => {
      registerRule(s, plans.MaskingRewrite)
      val p = queryTmp("graft_mask") + "/masked_customer.parquet"
      t(s, dir, "customer").where(col("c_custkey") <= 200)
        .write.mode("overwrite").parquet(p)
      plans.MaskingRegistry.declareMask("/masked_customer.parquet",
        "c_name", "sha256")
      plans.MaskingRegistry.declareMask("/masked_customer.parquet",
        "c_mktsegment", "partial")
      s.read.parquet(p)
        .where(col("c_custkey") <= 150)
        .select(col("c_custkey"), col("c_name").as("name_token"),
          col("c_mktsegment").as("seg_masked"))
    }),

    // DataSource V2 WRITE path end-to-end: events stream through the
    // graft-audit sink (per-task accumulators → commit messages →
    // driver-side summary on job commit — the exactly-once accounting
    // seam; AuditSinkSpec pins partition invariance and null handling)
    // and the gate reads the committed summary back; the oracle is the
    // direct aggregate, so parity proves the write-path accounting.
    "q313_audit_sink" -> ((s, dir) => {
      val root = queryTmp("graft_audit")
      ev(s, dir).where(col("value").isNotNull)
        .select(col("event_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("cents"),
          (col("user_id") % 1000003L).as("uid_check"))
        .write.format("graft-audit").option("path", root)
        .option("sumCols", "cents,uid_check").mode("append").save()
      s.read.json(s"$root/summary.json")
        .select(col("rows"), col("sums.cents").as("cents"),
          col("sums.uid_check").as("uid_check"))
    }),

    // Crypto-shredding erasure (the at-scale GDPR mechanism q191's hard
    // delete complements): payloads encrypt at ingest under per-user
    // keys (toy XOR stream from graft_splitmix64 — production swaps in
    // AES-GCM; the PIPELINE — key table, shred = key delete, ciphertext
    // never rewritten — is the real shape); shredding the %7 users'
    // keys leaves their rows unreadable. The oracle computes the stats
    // WITHOUT the cipher, so parity proves the encrypt→shred→decrypt
    // round trip is lossless on surviving keys.
    "q312_crypto_shred" -> ((s, dir) => {
      functions.PolyHash64.register(s)
      val e = ev(s, dir)
        .where(col("value").isNotNull && col("user_id").isNotNull)
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("x"))
      // XOR salting (a wrapping multiply trips ANSI overflow checks)
      val keyOf = "graft_splitmix64(user_id ^ 1442695040888963407L)"
      val ciphertext = e.withColumn("c", expr(s"x ^ ($keyOf)"))
        .drop("x")
      val keys = e.select(col("user_id")).distinct()
        .where(col("user_id") % 7 =!= 0)
        .withColumn("k", expr(keyOf))
      ciphertext.join(broadcast(keys), Seq("user_id"), "left")
        .withColumn("x", expr("c ^ k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("k").isNotNull, 1L).otherwise(0L)).as("readable"),
          sum(when(col("k").isNull, 1L).otherwise(0L)).as("shredded"),
          sum(col("x")).as("readable_cents"))
    }),
  )

  def oracleSql: Seq[(String, String)] = Seq(

    // q191: the post-erasure derived table IS the aggregate of events
    // minus the erased users; residue must be exactly zero.
    "q191_erasure" ->
      """WITH e AS (SELECT strftime(ts, '%Y-%m-%d') AS dt, user_id,
        |  CAST(round(value * 100) AS BIGINT) AS v_cents FROM events
        | WHERE user_id % 9 <> 0)
        |SELECT dt, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(v_cents) AS BIGINT) AS cents,
        | CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        | CAST(0 AS BIGINT) AS residue_rows
        |FROM e GROUP BY 1""".stripMargin,

    // q211: dominant-priority sensitive attr, QI group census.
    "q211_k_anonymity" ->
      """WITH dom AS (
        | SELECT o_custkey, o_orderpriority AS sens FROM (
        |  SELECT o_custkey, o_orderpriority,
        |   row_number() OVER (PARTITION BY o_custkey
        |     ORDER BY count(*) DESC, o_orderpriority) AS rn
        |  FROM orders GROUP BY o_custkey, o_orderpriority)
        | WHERE rn = 1)
        |SELECT CAST(c_nationkey AS BIGINT) AS nation,
        | c_mktsegment AS segment,
        | CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
        | count(*) AS group_size,
        | CAST(count(DISTINCT sens) AS BIGINT) AS l_diversity,
        | count(*) < 5 AS violates_k
        |FROM customer JOIN dom ON c_custkey = o_custkey
        |GROUP BY 1, 2, 3""".stripMargin,

    "q224_private_histogram" -> q224OracleSql,

    // q250: q211's dom/qi CTEs, then the ordered-EMD unroll — per-group
    // cumulative against the global cumulative, cross-multiplied.
    "q250_t_closeness" ->
      """WITH dom AS (
        | SELECT o_custkey, o_orderpriority AS sens FROM (
        |  SELECT o_custkey, o_orderpriority,
        |   row_number() OVER (PARTITION BY o_custkey
        |     ORDER BY count(*) DESC, o_orderpriority) AS rn
        |  FROM orders GROUP BY o_custkey, o_orderpriority)
        | WHERE rn = 1),
        |qi AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |  c_mktsegment AS segment,
        |  CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket, sens
        | FROM customer JOIN dom ON c_custkey = o_custkey),
        |cells AS (SELECT nation, segment, bal_bucket, sens AS s,
        |  count(*) AS g FROM qi GROUP BY 1, 2, 3, 4),
        |cats AS (SELECT s, sum(g) AS ns FROM cells GROUP BY 1),
        |catc AS (SELECT s, sum(ns) OVER (ORDER BY s) AS cum_n,
        |  row_number() OVER (ORDER BY s) AS rk,
        |  count(*) OVER () AS mm, sum(ns) OVER () AS nt FROM cats),
        |grp AS (SELECT nation, segment, bal_bucket, sum(g) AS n
        | FROM cells GROUP BY 1, 2, 3),
        |x AS (SELECT grp.nation, grp.segment, grp.bal_bucket, grp.n,
        |  catc.s, catc.cum_n, catc.rk, catc.mm, catc.nt,
        |  coalesce(cells.g, 0) AS gg
        | FROM grp CROSS JOIN catc
        | LEFT JOIN cells ON cells.nation = grp.nation
        |  AND cells.segment = grp.segment
        |  AND cells.bal_bucket = grp.bal_bucket AND cells.s = catc.s),
        |c2 AS (SELECT nation, segment, bal_bucket, n, mm, nt, rk, cum_n,
        |  sum(gg) OVER (PARTITION BY nation, segment, bal_bucket
        |    ORDER BY s) AS cum_g FROM x),
        |a AS (SELECT nation, segment, bal_bucket, n, mm, nt,
        |  coalesce(sum(CASE WHEN rk < mm THEN
        |    abs(CAST(cum_g AS HUGEINT)*nt - CAST(cum_n AS HUGEINT)*n)
        |   END), 0) AS emd_num
        | FROM c2 GROUP BY 1, 2, 3, 4, 5, 6)
        |SELECT nation, segment, bal_bucket, CAST(n AS BIGINT) AS n,
        |  CAST(CAST(emd_num AS DECIMAL(38,0)) AS VARCHAR) AS emd_num,
        |  CAST(CAST(CAST(n AS HUGEINT)*nt*(mm-1) AS DECIMAL(38,0))
        |    AS VARCHAR) AS emd_den,
        |  emd_num*2 > CAST(n AS HUGEINT)*nt*(mm-1) AS violates_t
        |FROM a""".stripMargin,

    // q297: ranked sensitive-value counts per QI group, recursive (c,l)
    // test cross-multiplied.
    "q297_l_diversity" ->
      """WITH j AS (
        | SELECT c.c_nationkey, c.c_mktsegment, o.o_orderpriority AS s
        | FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        | WHERE o.o_orderpriority IS NOT NULL),
        |cells AS (SELECT c_nationkey, c_mktsegment, s,
        |  CAST(count(*) AS BIGINT) AS r
        | FROM j GROUP BY 1, 2, 3),
        |rk AS (SELECT *, row_number() OVER (
        |  PARTITION BY c_nationkey, c_mktsegment
        |  ORDER BY r DESC, s) AS rnk FROM cells)
        |SELECT c_nationkey, c_mktsegment,
        |  CAST(sum(r) AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS m_distinct,
        |  CAST(max(CASE WHEN rnk = 1 THEN r END) AS BIGINT) AS r1,
        |  CAST(coalesce(sum(CASE WHEN rnk >= 3 THEN r END), 0) AS BIGINT)
        |    AS tail_sum,
        |  (count(*) >= 3 AND
        |   max(CASE WHEN rnk = 1 THEN r END) * 3 <
        |     coalesce(sum(CASE WHEN rnk >= 3 THEN r END), 0) * 1)
        |    AS satisfies_cl
        |FROM rk GROUP BY 1, 2""".stripMargin,

    "q432_dp_counts" -> q432OracleSql,

    // q353: the masking policies applied by hand — DuckDB's sha256 and
    // Spark's sha2(cast-to-binary, 256) agree on lowercase hex.
    "q353_masking" ->
      """SELECT c_custkey,
        | sha256(c_name) AS name_token,
        | substring(c_mktsegment, 1, 2) || '***' AS seg_masked
        |FROM customer WHERE c_custkey <= 150""".stripMargin,

    // q313: the direct aggregate the committed summary must equal.
    "q313_audit_sink" ->
      """SELECT CAST(count(*) AS BIGINT) AS rows,
        | CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS cents,
        | CAST(sum(user_id % 1000003) AS BIGINT) AS uid_check
        |FROM events WHERE value IS NOT NULL""".stripMargin,

    // q312: the cipher-free recompute — parity proves the
    // encrypt→shred→decrypt round trip lossless.
    "q312_crypto_shred" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CASE WHEN user_id % 7 <> 0 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS readable,
        | CAST(sum(CASE WHEN user_id % 7 = 0 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS shredded,
        | CAST(sum(CASE WHEN user_id % 7 <> 0
        |   THEN CAST(round(value*100) AS BIGINT) END) AS BIGINT)
        |   AS readable_cents
        |FROM events
        |WHERE value IS NOT NULL AND user_id IS NOT NULL
        |GROUP BY 1""".stripMargin,
  )
}
