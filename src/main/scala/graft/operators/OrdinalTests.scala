package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Checkpoints.TruncateOps

/** Ordinal two/k-sample tests on bounded-domain integer values, exact
  * via value-census cross terms — three members the rank family
  * (q156 Mann–Whitney, q411 Kruskal–Wallis) still lacked:
  *
  *  - [[cliffsDeltaE6]] — Cliff's δ (Cliff 1993), the ordinal effect
  *    SIZE: P(X>Y) − P(X<Y), what a significance test's p-value
  *    doesn't tell you;
  *  - [[jonckheereE3]] — Jonckheere–Terpstra (Jonckheere 1954) for
  *    ORDERED alternatives: does the value trend monotonically across
  *    ordered groups (dose–response), strictly more powerful there
  *    than Kruskal–Wallis' any-difference alternative;
  *  - [[moodsMedianChi2E6]] — Mood's median test: the blunt,
  *    assumption-light k-sample screen on counts above/below the
  *    pooled median.
  *
  * All three collapse the data to per-group VALUE CENSUSES (one
  * map-side hash aggregate); every pairwise count is a census×census
  * cross term (domain², never data²), and the arithmetic is
  * DECIMAL(38,0) with pinned truncating divisions.
  */
object OrdinalTests {

  /** δ_e6 = (#(a>b) − #(a<b))·1e6 div (n_a·n_b), toward zero.
    * Output: (n_a, n_b, gt, lt, ties — DECIMAL, delta_e6). */
  def cliffsDeltaE6(df: DataFrame, inA: Column,
      value: Column): DataFrame = {
    val cells = df.select(inA.cast("boolean").as("a"),
        value.cast("long").as("v"))
      .where(col("a").isNotNull && col("v").isNotNull)
      .groupBy(col("a"), col("v")).agg(count(lit(1)).as("c"))
      .truncate(true)
    val d = (c: Column) => c.cast("decimal(38,0)")
    val zero = lit(0).cast("decimal(38,0)")
    val av = cells.where(col("a")).select(col("v").as("va"),
      col("c").as("ca"))
    val bv = cells.where(!col("a")).select(col("v").as("vb"),
      col("c").as("cb"))
    av.crossJoin(bv)
      .agg(
        coalesce(sum(when(col("va") > col("vb"),
          d(col("ca")) * col("cb"))), zero).as("gt"),
        coalesce(sum(when(col("va") < col("vb"),
          d(col("ca")) * col("cb"))), zero).as("lt"),
        coalesce(sum(when(col("va") === col("vb"),
          d(col("ca")) * col("cb"))), zero).as("ties"))
      .crossJoin(broadcast(av.agg(
        coalesce(sum(col("ca")), lit(0L)).as("n_a"))))
      .crossJoin(broadcast(bv.agg(
        coalesce(sum(col("cb")), lit(0L)).as("n_b"))))
      .select(col("n_a"), col("n_b"), col("gt"), col("lt"),
        col("ties"),
        when(expr("n_a * CAST(n_b AS DECIMAL(38,0))") > 0L, expr(
          """CASE WHEN gt >= lt
            | THEN CAST((gt - lt) * 1000000
            |   div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)
            | ELSE -CAST((lt - gt) * 1000000
            |   div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)
            |END""".stripMargin)).as("delta_e6"))
  }

  /** DOUBLED JT statistic (ties count 1): JT2 = Σ_{g<h} (2·#(x_g<x_h)
    * + #(=)); null mean2 = Σ_{g<h} n_g·n_h; the no-tie null variance
    * V72·1/72 = [N²(2N+3) − Σn_j²(2n_j+3)]/72 (documented
    * approximation under ties — the classical normal reading), and
    *
    *   twoSigma_e3 = isqrt(V72·1e6 div 18)
    *   z_e3 = (JT2 − mean2)·1e6 div twoSigma_e3
    *
    * `groupOrd` must be an INTEGER encoding the hypothesized order.
    * Output: (n, k, jt2, mean2, v72 — DECIMAL, z_e3). */
  def jonckheereE3(df: DataFrame, groupOrd: Column,
      value: Column): DataFrame = {
    val cells = df.select(groupOrd.cast("long").as("g"),
        value.cast("long").as("v"))
      .where(col("g").isNotNull && col("v").isNotNull)
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
      .truncate(true)
    val zero = lit(0).cast("decimal(38,0)")
    // A naive census×census ON g_a < g_b is a nested-loop join that
    // goes quadratic in |value domain|. Instead: zero-filled
    // (value × group) grid, per-group STRICT cumulative counts
    // (group-partitioned windows), then an EQUI join on the value —
    // #(x_g < v) is a lookup, never a scan.
    val grid = cells.select(col("v")).distinct()
      .crossJoin(broadcast(cells.select(col("g")).distinct()))
      .join(cells, Seq("g", "v"), "left")
      .select(col("g"), col("v"), coalesce(col("c"), lit(0L)).as("c"))
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val cum = grid.withColumn("lt",
      coalesce(sum(col("c")).over(wg), lit(0L)))
    val jt = cum.select(col("g").as("ga"), col("v"),
        col("c").as("ca"), col("lt").as("lta"))
      .join(cum.select(col("g").as("gb"), col("v"),
        col("c").as("cb")), "v")
      .where(col("ga") < col("gb") && col("cb") > 0L)
      .agg(coalesce(sum(expr(
        "CAST(cb AS DECIMAL(38,0)) * (2 * lta + ca)")), zero)
        .as("jt2"))
    val sizes = cells.groupBy(col("g")).agg(sum(col("c")).as("nj"))
    val stats = sizes.agg(sum(col("nj")).as("n"),
        count(lit(1)).as("k"),
        sum(expr("CAST(nj AS DECIMAL(38,0)) * nj")).as("__sn2"),
        sum(expr(
          "CAST(nj AS DECIMAL(38,0)) * nj * (2 * nj + 3)")).as("__sn23"))
      .withColumn("mean2", expr(
        """CAST((CAST(n AS DECIMAL(38,0)) * n - __sn2) / 2
          |AS DECIMAL(38,0))""".stripMargin))
      .withColumn("v72", expr(
        "CAST(n AS DECIMAL(38,0)) * n * (2 * n + 3) - __sn23"))
    stats.crossJoin(broadcast(jt))
      .withColumn("__v18", expr(
        """CAST((v72 * 1000000 - pmod(v72 * 1000000, 18)) / 18
          |AS DECIMAL(38,0))""".stripMargin))
      .withColumn("__s0",
        expr("CAST(floor(sqrt(CAST(__v18 AS DOUBLE))) AS BIGINT)"))
      .withColumn("__ts", expr(
        """CASE WHEN CAST(__s0 AS DECIMAL(38,0)) * __s0 > __v18
          |  THEN __s0 - 1
          | WHEN (CAST(__s0 AS DECIMAL(38,0)) + 1) * (__s0 + 1) <= __v18
          |  THEN __s0 + 1
          | ELSE __s0 END""".stripMargin))
      .select(col("n"), col("k"), col("jt2"), col("mean2"), col("v72"),
        when(col("__ts") > 0L, expr(
          """CASE WHEN jt2 >= mean2
            | THEN CAST((jt2 - mean2) * 1000000 div __ts AS BIGINT)
            | ELSE -CAST((mean2 - jt2) * 1000000 div __ts AS BIGINT)
            |END""".stripMargin)).as("z_e3"))
  }

  /** Pooled LOWER median (smallest v with 2·cum ≥ n+1, pinned), then
    * the k×2 above/at-or-below table and the exact cleared chi²:
    * per cell (O·N − row·col)²·1e6 div (N·row·col), truncated per
    * cell before summing. Output: (n, k, median_v, chi2_e6). */
  def moodsMedianChi2E6(df: DataFrame, group: Column,
      value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(group.as("g"), value.cast("long").as("v"))
      .where(col("g").isNotNull && col("v").isNotNull)
      .truncate(true)
    val wLe = Window.partitionBy(Census.onePartKey(col("v"))).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(Census.onePartKey(col("v"))).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val med = base.groupBy(col("v")).agg(count(lit(1)).as("c"))
      .withColumn("cum", Census.guardLong(sum(col("c")).over(wLe),
        count(lit(1)).over(whole), "OrdinalTests.moodsMedianChi2E6"))
      .withColumn("n", sum(col("c")).over(whole))
      .where(expr("2 * cum >= n + 1"))
      .agg(min(col("v")).as("median_v"))
    val counts = base.crossJoin(broadcast(med))
      .groupBy(col("g"))
      .agg(sum(when(col("v") <= col("median_v"), 1L).otherwise(0L))
        .as("le"),
        sum(when(col("v") > col("median_v"), 1L).otherwise(0L))
        .as("gtc"))
      .truncate(true)
    val tot = counts.agg(sum(col("le") + col("gtc")).as("n"),
      count(lit(1)).as("k"), sum(col("le")).as("cle"),
      sum(col("gtc")).as("cgt"))
    val cellCols: Seq[Column] = Seq(col("n"), col("k")) ++
      (0 until 2).map { i =>
        val (o, colTot) = if (i == 0) ("le", "cle") else ("gtc", "cgt")
        expr(s"""CASE WHEN (le + gtc) * CAST($colTot AS DECIMAL(38,0))
                | > 0 THEN
                | CAST((CAST($o AS DECIMAL(38,0)) * n
                |  - CAST(le + gtc AS DECIMAL(38,0)) * $colTot)
                |  * (CAST($o AS DECIMAL(38,0)) * n
                |  - CAST(le + gtc AS DECIMAL(38,0)) * $colTot)
                |  * 1000000
                |  div (CAST(n AS DECIMAL(38,0)) * (le + gtc)
                |   * $colTot) AS BIGINT)
                |ELSE 0 END""".stripMargin).as(s"__t$i")
      }
    val chi = counts.crossJoin(broadcast(tot))
      .select(cellCols: _*)
      .agg(max(col("n")).as("n"), max(col("k")).as("k"),
        sum(expr("__t0 + __t1")).as("__chi"))
    chi.crossJoin(broadcast(med))
      .select(col("n"), col("k"), col("median_v"),
        col("__chi").as("chi2_e6"))
  }

  /** Page's L test for ORDERED alternatives in complete blocks (Page
    * 1963) — the repeated-measures trend sibling of [[jonckheereE3]]
    * (independent groups) and q394's Kendall's W (any-agreement): does
    * the value trend MONOTONICALLY across the k ordered treatments,
    * block by block. Doubled within-block midranks keep ties exact
    * (the q394 rule: mr2 = 2·rank_min + ties − 1), so
    *
    *   L2 = Σ_blocks Σ_j j·mr2_{bj}   (exact integer; = 2L untied)
    *   E[L2] = n·k·(k+1)² div 2       (always integer)
    *   z_e6 = round((L2 − E)·6 / (k·√(n·(k+1)·(k²−1)))·1e6)
    *
    * — the classical no-tie normal reading (documented approximation
    * under ties, as [[jonckheereE3]] does); the z is ONE pinned double
    * chain over exact integers, replayable in SQL verbatim.
    *
    * Blocks must be complete: exactly one value per (block, treatment)
    * — the input is canonicalized by summing duplicates, then blocks
    * missing any treatment drop (Fleiss-style complete-design filter).
    *
    * Scale shape: one hash aggregate to (block, treatment) cells, a
    * complete-block semi-join, per-BLOCK windowed midranks (real
    * partitions — the q82 shape), one global aggregate. */
  def pageTrendE6(df: DataFrame, block: Column, treatmentOrd: Column,
      value: Column, k: Int): DataFrame = {
    require(k >= 3 && k <= 64, s"pageTrendE6: 3 ≤ k ≤ 64, got $k")
    import org.apache.spark.sql.expressions.Window
    val cells = df.select(block.as("b"),
        treatmentOrd.cast("long").as("t"), value.cast("long").as("v"))
      .where(col("b").isNotNull && col("v").isNotNull &&
        col("t").between(1L, k.toLong))
      .groupBy(col("b"), col("t")).agg(sum(col("v")).as("v"))
    val complete = cells.groupBy(col("b"))
      .agg(count(lit(1)).as("__nt")).where(col("__nt") === k.toLong)
      .select(col("b"))
    val wR = Window.partitionBy(col("b")).orderBy(col("v"))
    val wT = Window.partitionBy(col("b"), col("v"))
    val ranked = cells.join(complete, "b")
      .withColumn("mr2",
        lit(2L) * rank().over(wR) + count(lit(1)).over(wT) - lit(1L))
    ranked
      .agg(expr(s"count(1) div ${k}L").as("n_blocks"),
        coalesce(sum(col("t") * col("mr2")), lit(0L)).as("l2"))
      .select(col("n_blocks"), lit(k.toLong).as("k"), col("l2"),
        expr(s"n_blocks * ${k}L * (${k + 1}L * ${k + 1}L) div 2")
          .as("e_l2"),
        expr(
          s"""CASE WHEN n_blocks = 0 THEN 0
             | ELSE CAST(round((CAST(l2 AS DOUBLE)
             |   - CAST(n_blocks * ${k}L * (${k + 1}L * ${k + 1}L) div 2
             |       AS DOUBLE))
             |  * 6.0 / ($k * sqrt(CAST(n_blocks AS DOUBLE)
             |   * ${k + 1}.0 * ${k * k - 1}.0))
             |  * 1000000.0) AS BIGINT) END""".stripMargin).as("z_e6"))
  }

  /** Yuen's trimmed-mean two-sample test (Yuen 1974) — the robust
    * location comparison that survives the heavy tails Brown–Forsythe
    * flags: per sample, trim the g = ⌊n·trimPerMille/1000⌋ smallest and
    * largest observations EXACTLY (rank-window overlap on the value
    * census — no sampling, no sort of raw data), compare trimmed means
    * with the Winsorized-variance standard error:
    *
    *   t = (t̄_x − t̄_y) / √(d_x + d_y),
    *   d = SSD_w / (h(h−1)),  h = n − 2g,
    *   SSD_w = Σ winsorized v² − (Σ winsorized v)²/n
    *
    * where winsorization clips ranks ≤ g to v₍g₊₁₎ and ranks > n−g to
    * v₍n₋g₎ (the pinned rank-g+1 / rank-(n−g) order statistics).
    * Every sufficient statistic is an exact DECIMAL(38,0) integer
    * (SSD_w·n cleared of the /n); the final t is ONE pinned double
    * chain. Output: (n_x, h_x, tmean_x_e6, n_y, h_y, tmean_y_e6,
    * t_e6).
    *
    * Scale shape: one hash aggregate to the (sample × value) census,
    * per-sample cumulative windows (two partitions), one pivot
    * aggregate to a single row. */
  def yuenTrimmedTE6(df: DataFrame, inX: Column, value: Column,
      trimPerMille: Int = 100): DataFrame = {
    require(trimPerMille >= 0 && trimPerMille < 500,
      s"yuenTrimmedTE6: 0 ≤ trimPerMille < 500, got $trimPerMille")
    import org.apache.spark.sql.expressions.Window
    val cells = df.select(inX.cast("boolean").as("b"),
        value.cast("long").as("v"))
      .where(col("b").isNotNull && col("v").isNotNull)
      .groupBy(col("b"), col("v")).agg(count(lit(1)).as("c"))
    val wBefore = Window.partitionBy(col("b")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val whole = Window.partitionBy(col("b"))
    val ranked = cells
      .withColumn("n", sum(col("c")).over(whole))
      .withColumn("g", expr(s"n * $trimPerMille div 1000"))
      .withColumn("cb", coalesce(sum(col("c")).over(wBefore), lit(0L)))
      .withColumn("cum", col("cb") + col("c"))
      // rank-window overlap of this value's occurrences with the kept
      // band (g, n−g]
      .withColumn("ov", greatest(lit(0L),
        least(col("cum"), col("n") - col("g"))
          - greatest(col("cb"), col("g"))))
    val per = ranked.groupBy(col("b"))
      .agg(max(col("n")).as("n"), max(col("g")).as("g"),
        coalesce(sum(expr("CAST(v AS DECIMAL(38,0)) * ov")),
          expr("CAST(0 AS DECIMAL(38,0))")).as("ts"),
        coalesce(sum(expr("CAST(v AS DECIMAL(38,0)) * v * ov")),
          expr("CAST(0 AS DECIMAL(38,0))")).as("wssp"),
        min(when(col("cum") >= col("g") + 1L, col("v"))).as("vlo"),
        min(when(col("cum") >= col("n") - col("g"), col("v"))).as("vhi"))
      .withColumn("h", col("n") - lit(2L) * col("g"))
      .withColumn("wsum", expr(
        "ts + CAST(g AS DECIMAL(38,0)) * (vlo + vhi)"))
      .withColumn("wss", expr(
        """wssp + CAST(g AS DECIMAL(38,0))
          | * (CAST(vlo AS DECIMAL(38,0)) * vlo
          |  + CAST(vhi AS DECIMAL(38,0)) * vhi)""".stripMargin))
      .withColumn("ssdwn", expr("n * wss - wsum * wsum"))
    per.agg(
        max(when(col("b"), col("n"))).as("n_x"),
        max(when(col("b"), col("h"))).as("h_x"),
        max(when(col("b"), col("ts"))).as("ts_x"),
        max(when(col("b"), col("ssdwn"))).as("sn_x"),
        max(when(!col("b"), col("n"))).as("n_y"),
        max(when(!col("b"), col("h"))).as("h_y"),
        max(when(!col("b"), col("ts"))).as("ts_y"),
        max(when(!col("b"), col("ssdwn"))).as("sn_y"))
      .select(col("n_x"), col("h_x"),
        expr("CAST(ts_x * 1000000 div h_x AS BIGINT)").as("tmean_x_e6"),
        col("n_y"), col("h_y"),
        expr("CAST(ts_y * 1000000 div h_y AS BIGINT)").as("tmean_y_e6"),
        expr(
          """CASE WHEN h_x < 2 OR h_y < 2 OR (sn_x <= 0 AND sn_y <= 0)
            |  THEN 0
            | ELSE CAST(round((CAST(ts_x AS DOUBLE) / CAST(h_x AS DOUBLE)
            |   - CAST(ts_y AS DOUBLE) / CAST(h_y AS DOUBLE))
            |  / sqrt(CAST(sn_x AS DOUBLE)
            |    / (CAST(n_x AS DOUBLE) * CAST(h_x AS DOUBLE)
            |       * (CAST(h_x AS DOUBLE) - 1.0))
            |   + CAST(sn_y AS DOUBLE)
            |    / (CAST(n_y AS DOUBLE) * CAST(h_y AS DOUBLE)
            |       * (CAST(h_y AS DOUBLE) - 1.0)))
            |  * 1000000.0) AS BIGINT) END""".stripMargin).as("t_e6"))
  }
}
