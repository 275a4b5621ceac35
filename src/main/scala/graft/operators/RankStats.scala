package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank statistics on integer-valued columns, exact end-to-end.
  *
  * Both operators share one trick with [[Profile.exactAuc]]: ranks are
  * never assigned to raw rows by a global sort. Instead a per-value
  * histogram (the only full-data pass, map-side combined) feeds a
  * cumulative window over |distinct values| rows, and the DOUBLED
  * midrank of every distinct value is the closed form
  * 2·cum_before + cnt + 1 — integral even under ties, so every
  * downstream statistic stays an exact integer (DECIMAL(38,0) where
  * fourth-power magnitudes can exceed LONG).
  *
  * Scale shape: histogram group-bys shuffle |distinct| cells, the rank
  * maps join back value→rank (broadcast-sized whenever the domain is
  * materially smaller than the data; AQE picks the strategy), and the
  * final reductions are single-row. Nothing sorts the raw data.
  */
object RankStats {

  /** value → (cnt, rank2) map for one column: rank2 = doubled midrank.
    * [[Census.guardLong]] raises if the distinct-value census exceeds
    * the bounded-domain contract instead of sorting it on one task. */
  private def rank2Map(df: DataFrame, v: Column, out: String): DataFrame = {
    val byV = Window.partitionBy(Census.onePartKey(col("__v"))).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val whole = Window.partitionBy(Census.onePartKey(col("__v"))).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.select(v.cast("long").as("__v")).where(col("__v").isNotNull)
      .groupBy(col("__v")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__cum", sum(col("__cnt")).over(byV))
      .select(col("__v").as(s"${out}_v"),
        Census.guardLong(
          lit(2L) * (col("__cum") - col("__cnt")) + col("__cnt") + lit(1L),
          count(lit(1)).over(whole), "RankStats.rank2Map").as(out))
  }

  /** The rank2 census map for sibling operators (Chatterjee ξ). */
  private[operators] def rank2MapFor(df: DataFrame, v: Column,
      out: String): DataFrame = rank2Map(df, v, out)

  /** Spearman rank correlation — sufficient statistics, exact.
    *
    * ρ = Pearson correlation of the (midrank_x, midrank_y) pairs; with
    * doubled midranks every moment is integral, and the three quadratic
    * forms determine ρ² = cov²/(var_x·var_y) as an exact rational:
    *   cov_num   = n·Σ(rx·ry) − (Σrx)(Σry)
    *   var_•_num = n·Σr•²    − (Σr•)²
    * (Σrx = Σry = n(n+1) identically — rank sums are tie-invariant —
    * but they are computed, not assumed, so the algebra is visible.)
    * Fourth-power magnitudes (n·Σr² ~ 4n⁴) leave LONG near n ≈ 2·10⁵,
    * so the quadratic forms are DECIMAL(38,0) — good to n ≈ 10⁹ rows.
    * Output: one row (n, cov_num, var_x_num, var_y_num). */
  def spearmanSuffStats(df: DataFrame, x: Column, y: Column): DataFrame = {
    val base = df.select(x.cast("long").as("__x"), y.cast("long").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
    val ranked = base
      .join(rank2Map(base, col("__x"), "rx"), col("__x") === col("rx_v"))
      .join(rank2Map(base, col("__y"), "ry"), col("__y") === col("ry_v"))
    val d = (c: Column) => c.cast("decimal(38,0)")
    ranked.agg(
        count(lit(1)).as("n"),
        sum(d(col("rx"))).as("sx"), sum(d(col("ry"))).as("sy"),
        sum(d(col("rx")) * d(col("ry"))).as("sxy"),
        sum(d(col("rx")) * d(col("rx"))).as("sxx"),
        sum(d(col("ry")) * d(col("ry"))).as("syy"))
      .select(col("n"),
        (d(col("n")) * col("sxy") - col("sx") * col("sy")).as("cov_num"),
        (d(col("n")) * col("sxx") - col("sx") * col("sx")).as("var_x_num"),
        (d(col("n")) * col("syy") - col("sy") * col("sy")).as("var_y_num"))
  }

  /** Wilcoxon rank-sum / Mann–Whitney U with tie correction, exact.
    *
    * Sample 1 = rows where `inSample1`; U₁ = R₁ − n₁(n₁+1)/2 with R₁
    * the sample-1 midrank sum over the COMBINED ordering. Doubling keeps
    * everything integral: u1_x2 = 2R₁ − n₁(n₁+1) (so u1_x2/2 = U₁ and
    * u1_x2 + u2_x2 = 2n₁n₂). The tie term Σ(t³−t) over tied-value
    * groups is what the normal-approximation variance
    *   σ² = n₁n₂/12 · [(n+1) − Σ(t³−t)/(n(n−1))]
    * needs — emitted exactly (DECIMAL(38,0): t³ leaves LONG near
    * t ≈ 2·10⁶ duplicates of one value).
    * Output: one row (n1, n2, u1_x2, tie_term). */
  def mannWhitney(df: DataFrame, value: Column,
      inSample1: Column): DataFrame = {
    val byV = Window.partitionBy(Census.onePartKey(col("__v"))).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val all = Window.partitionBy(Census.onePartKey(col("__v")))
    val d = (c: Column) => c.cast("decimal(38,0)")
    df.select(value.cast("long").as("__v"),
        when(inSample1, 1L).otherwise(0L).as("__s1"))
      .where(col("__v").isNotNull)
      .groupBy(col("__v"))
      .agg(count(lit(1)).as("cnt"), sum(col("__s1")).as("cnt1"))
      .withColumn("cum", sum(col("cnt")).over(byV))
      .withColumn("n", sum(col("cnt")).over(all))
      .withColumn("n1", sum(col("cnt1")).over(all))
      .withColumn("r1x2", col("cnt1") *
        Census.guardLong(
          lit(2L) * (col("cum") - col("cnt")) + col("cnt") + lit(1L),
          count(lit(1)).over(all), "RankStats.mannWhitney"))
      .groupBy(col("n"), col("n1"))
      .agg(sum(col("r1x2")).as("sum_r1x2"),
        sum(d(col("cnt")) * d(col("cnt")) * d(col("cnt")) - d(col("cnt")))
          .as("tie_term"))
      .select(col("n1"), (col("n") - col("n1")).as("n2"),
        (col("sum_r1x2") - col("n1") * (col("n1") + 1L)).as("u1_x2"),
        col("tie_term"))
  }

  /** Kendall τ-b — concordance census over DOMAIN-BOUNDED variables,
    * exact: τ_b = (C−D)/√((n₀−t_x)(n₀−t_y)) with C/D the concordant/
    * discordant pair counts and t_• the pairs tied on each variable.
    * Everything is emitted doubled-or-raw so no halving ever divides:
    * (n, concordant, discordant, tie_x2 = Σn_x(n_x−1), tie_y2) — the
    * doubled pair counts cancel inside the ratio. The concordance
    * complement to [[spearmanSuffStats]]: τ counts pair inversions,
    * ρ measures rank displacement.
    *
    * Scale shape: the raw data collapses to a (x, y) CELL census first
    * (one map-side-combined pass, persisted — feeds the pair join and
    * both marginals); the pair join is cells×cells under x_a < x_b with
    * the tiny census broadcast — cost is |domain|², INDEPENDENT of row
    * count, which is why the inputs must be bucketed/categorical (the
    * caller owns that; raw cents would make |domain| ≈ n). */
  def kendallTauB(df: DataFrame, x: Column, y: Column): DataFrame = {
    val cells = df.select(x.cast("long").as("x"), y.cast("long").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val d = (c: Column) => c.cast("decimal(38,0)")
    val zero = lit(0).cast("decimal(38,0)")
    val cd = cells.select(col("x").as("xa"), col("y").as("ya"),
        col("g").as("ga"))
      .join(broadcast(cells.select(col("x").as("xb"), col("y").as("yb"),
        col("g").as("gb"))), col("xa") < col("xb"))
      .agg(
        coalesce(sum(when(col("ya") < col("yb"),
          d(col("ga")) * d(col("gb")))), zero).as("concordant"),
        coalesce(sum(when(col("ya") > col("yb"),
          d(col("ga")) * d(col("gb")))), zero).as("discordant"))
    def tie2(c: String, out: String) = cells.groupBy(col(c))
      .agg(sum(col("g")).as("m"))
      .agg(coalesce(sum(d(col("m")) * (d(col("m")) - 1)), zero).as(out))
    cells.agg(sum(col("g")).as("n")).crossJoin(cd)
      .crossJoin(tie2("x", "tie_x2")).crossJoin(tie2("y", "tie_y2"))
      .select(col("n"), col("concordant"), col("discordant"),
        col("tie_x2"), col("tie_y2"))
  }

  /** Kendall's coefficient of concordance W (Kendall & Babington Smith
    * 1939), tie-corrected — m raters rank the SAME n items; W ∈ [0,1]
    * measures how far the m rankings agree as a whole (the multi-rater
    * generalization of pairwise rank correlation, and the
    * RANKING-agreement sibling of the label-agreement κ/α family).
    *
    * With doubled midranks (tie-safe, integral — the rank2Map trick),
    * the item's doubled rank sum is R2ᵢ = Σⱼ rank2ⱼ(xᵢⱼ) and the
    * doubled deviation sum collapses by the tie-invariant identity
    * mean(R2) = m·(n+1):
    *
    *   S2 = Σᵢ R2ᵢ² − n·m²·(n+1)²          (= 4·S classical)
    *   W·1e6 = 3·S2·1e6 div (m²·(n³−n) − m·ΣⱼTⱼ),  Tⱼ = Σ(t³−t)
    *
    * (3·S2 = 12·S). χ²(n−1) = m·(n−1)·W rides along for the
    * significance readout. NULL W when the denominator is 0 (every
    * rater ties everything).
    *
    * Scale shape: one value-census rank map per rater (bounded-domain
    * contract, guarded), joined back value→rank (broadcast-sized
    * domains), ONE aggregate over items for S2 and one tiny census
    * aggregate per rater for Tⱼ. n³ magnitudes live in DECIMAL(38,0) —
    * good to n ≈ 10¹², never sorted globally. */
  /** Kruskal–Wallis H (Kruskal & Wallis 1952), tie-corrected — the
    * k-sample generalization of [[mannWhitney]]: do k groups share a
    * location, rank-based and distribution-free. With doubled midranks
    * (tie-safe integral, the rank2Map trick) and doubled group rank
    * sums R2ⱼ:
    *
    *   qⱼ_e6 = R2ⱼ²·1e6 div nⱼ               (per-group truncation)
    *   h_e6  = 3·Σqⱼ div (N·(N+1)) − 3·(N+1)·1e6
    *   h_corr_e6 = h_e6·(N³−N) div ((N³−N) − ΣT),  T = Σ(t³−t)
    *
    * (3·ΣR2²/n = 12·ΣR²/n; the classical constants fall out of the
    * doubling). All quadratics DECIMAL(38,0); h compares against
    * χ²_{k−1}. NULL corrected H when every value ties (denominator
    * ≤ 0 — the test is undefined).
    *
    * Scale shape: ONE value-census rank map (bounded-domain, guarded)
    * joined back, one group aggregate, one tie census — never a
    * global sort of the data. Output one row: (n, k, h_e6, tie_term,
    * h_corr_e6). */
  def kruskalWallisE6(df: DataFrame, group: Column,
      value: Column): DataFrame = {
    val base = df.select(group.as("g"), value.cast("long").as("__v"))
      .where(col("g").isNotNull && col("__v").isNotNull)
    val ranked = base.join(rank2Map(base, col("__v"), "rk"),
      col("__v") === col("rk_v"))
    val d = (c: Column) => c.cast("decimal(38,0)")
    val perG = ranked.groupBy(col("g"))
      .agg(count(lit(1)).as("nj"), sum(d(col("rk"))).as("r2j"))
    // R2ⱼ²·1e6 leaves LONG fast and its quotient can too — widen
    // before squaring and keep the quotient DECIMAL via the positive
    // floor identity (≡ HUGEINT // on nonnegative operands)
    val core = perG
      .withColumn("__num",
        expr("CAST(r2j AS DECIMAL(38,0)) * r2j * 1000000"))
      .agg(sum(col("nj")).as("n"), count(lit(1)).as("k"),
        sum(expr(
          "CAST((__num - pmod(__num, nj)) / nj AS DECIMAL(38,0))"))
          .as("__sq"))
    val ties = base.groupBy(col("__v")).agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(d(col("t")) * col("t") * col("t") - col("t")),
        lit(0).cast("decimal(38,0)")).as("tie_term"))
    core.crossJoin(broadcast(ties))
      .withColumn("h_e6", expr(
        """CAST(3 * __sq div (CAST(n AS DECIMAL(38,0)) * (n + 1))
          |AS BIGINT) - 3 * (n + 1) * 1000000""".stripMargin))
      .withColumn("__den", expr(
        "CAST(n AS DECIMAL(38,0)) * n * n - n - tie_term"))
      .select(col("n"), col("k"), col("h_e6"), col("tie_term"),
        when(col("__den") > 0L, expr(
          """CAST(CAST(h_e6 AS DECIMAL(38,0))
            | * (CAST(n AS DECIMAL(38,0)) * n * n - n)
            | div __den AS BIGINT)""".stripMargin)).as("h_corr_e6"))
  }

  def kendallsWE6(df: DataFrame, raters: Seq[Column]): DataFrame = {
    val m = raters.size
    require(m >= 2 && m <= 16,
      s"RankStats.kendallsWE6: need 2..16 raters, got $m")
    val named = raters.zipWithIndex.map { case (c, i) =>
      c.cast("long").as(s"__r$i") }
    val base = df.select(named: _*)
      .where((0 until m).map(i => col(s"__r$i").isNotNull)
        .reduce(_ && _))
    var ranked = base
    (0 until m).foreach { i =>
      ranked = ranked.join(rank2Map(base, col(s"__r$i"), s"rk$i"),
        col(s"__r$i") === col(s"rk${i}_v"))
    }
    val d = (c: Column) => c.cast("decimal(38,0)")
    val r2 = expr((0 until m).map(i => s"rk$i").mkString(" + "))
    val core = ranked
      .select(d(r2).as("__r2"))
      .agg(count(lit(1)).as("n"),
        sum(col("__r2") * col("__r2")).as("sr2"))
    val ties = (0 until m).map { i =>
      base.groupBy(col(s"__r$i")).agg(count(lit(1)).as("t"))
        .agg(coalesce(sum(
          d(col("t")) * col("t") * col("t") - col("t")),
          lit(0).cast("decimal(38,0)")).as(s"t$i"))
    }
    val allT = ties.reduce(_.crossJoin(_))
      .select((0 until m).map(i => col(s"t$i"))
        .reduce(_ + _).as("sum_t"))
    core.crossJoin(broadcast(allT))
      .withColumn("s2", expr(
        s"sr2 - CAST(n AS DECIMAL(38,0)) * ${m * m} * (n + 1) * (n + 1)"))
      .withColumn("__den", expr(
        s"""${m * m} * (CAST(n AS DECIMAL(38,0)) * n * n - n)
           | - $m * sum_t""".stripMargin))
      .select(col("n"), lit(m.toLong).as("m"), col("s2"), col("sum_t"),
        when(col("__den") > 0L,
          expr("CAST(3 * s2 * 1000000 div __den AS BIGINT)"))
          .as("w_e6"))
      .withColumn("chi2_e6",
        when(col("w_e6").isNotNull, expr(s"$m * (n - 1) * w_e6")))
  }
}
