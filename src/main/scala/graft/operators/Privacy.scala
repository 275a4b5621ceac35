package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PolyHash64

/** Privacy auditing over quasi-identifier groupings.
  *
  * k-anonymity (Sweeney 2002): every quasi-identifier (QI) combination
  * must be shared by at least k records, or the group is re-identifiable.
  * l-diversity (Machanavajjhala et al. 2007): each QI group must also
  * contain at least l distinct values of the sensitive attribute, or the
  * sensitive value leaks even when k holds (homogeneity attack).
  *
  * Scale shape: one hash aggregate over the QI columns with a partial
  * (map-side) combine; the distinct-sensitive count is Spark's standard
  * two-phase partial-distinct aggregate, so nothing materializes the
  * groups on the driver and the shuffle carries one row per
  * (QI, sensitive) pair at most. At 100 TB the QI-group space is the
  * small side — the output is bounded by the QI cardinality product,
  * not the input row count.
  */
object Privacy {

  /** Per-QI-group audit row: the group's QI values, `group_size` (k),
    * `l_diversity` (distinct sensitive values), and `violates_k`.
    * Records with a NULL sensitive value count toward k but not l.
    */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, k: Int): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("group_size"),
        count_distinct(col(sensitiveCol)).as("l_diversity"))
      .withColumn("violates_k", col("group_size") < k)

  /** Corpus-level summary: total records, records in violating groups
    * (the suppression cost of enforcing k), and the minimum l over
    * groups that DO satisfy k (the residual homogeneity risk).
    */
  def kAnonymitySummary(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, k: Int): DataFrame =
    kAnonymityAudit(df, qiCols, sensitiveCol, k)
      .agg(sum(col("group_size")).as("n_records"),
        count(lit(1)).as("n_groups"),
        sum(when(col("violates_k"), col("group_size")).otherwise(0L))
          .as("suppressed_records"),
        sum(when(col("violates_k"), 1L).otherwise(0L))
          .as("violating_groups"),
        min(when(!col("violates_k"), col("l_diversity")))
          .as("min_l_of_k_groups"))

  /** Recursive (c,l)-diversity audit (Machanavajjhala et al., TKDD 2007
    * §4.2) — the sharper rung between distinct-l and t-closeness: a QI
    * group is recursively (c,l)-diverse iff, with its sensitive-value
    * counts ranked r₁ ≥ r₂ ≥ … ≥ r_m,
    *   r₁ < c · (r_l + r_{l+1} + … + r_m)
    * — the most common sensitive value must not dominate even after an
    * adversary eliminates the l−2 next-most-likely values. Distinct-l
    * (m ≥ l) rides along. c is the rational cNum/cDen and the test is
    * cross-multiplied, so the audit is all-integer and hash-gates.
    *
    * Scale shape: one (QI, s) cell census, one per-group ranked window
    * over ≤ m sensitive categories (the sensitive domain, tiny), one
    * re-aggregation. Output is bounded by QI-group cardinality. NULL
    * sensitive values are excluded (they are suppressions, not values).
    */
  def recursiveLDiversity(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, cNum: Long, cDen: Long, l: Int): DataFrame = {
    require(l >= 2 && cNum > 0 && cDen > 0)
    val keys = qiCols.map(col)
    val cells = df.select(keys :+ col(sensitiveCol).as("__s"): _*)
      .where(col("__s").isNotNull)
      .groupBy(keys :+ col("__s"): _*).agg(count(lit(1)).as("__r"))
    val w = Window.partitionBy(keys: _*)
      .orderBy(col("__r").desc, col("__s"))
    cells.withColumn("__rk", row_number().over(w))
      .groupBy(keys: _*)
      .agg(sum(col("__r")).as("n"),
        count(lit(1)).as("m_distinct"),
        max(when(col("__rk") === 1, col("__r"))).as("r1"),
        coalesce(sum(when(col("__rk") >= l, col("__r"))), lit(0L))
          .as("tail_sum"))
      .withColumn("satisfies_cl",
        col("m_distinct") >= l &&
          col("r1") * cDen < col("tail_sum") * cNum)
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    * third rung of the k-anonymity ladder: a QI group can satisfy k AND
    * l yet still leak by SKEW (its sensitive distribution far from the
    * table's). For an ORDERED sensitive attribute the distance is the
    * Earth Mover's Distance with unit ground spacing, normalized by
    * (m−1) categories:
    *   D(P,Q) = (1/(m−1)) · Σ_{j<m} |Σ_{i≤j} (p_i − q_i)|
    * — exact as the integer pair
    *   emd_num = Σ_{j<m} |cumG_j·N − cumN_j·n_g|,
    *   emd_den = n_g·N·(m−1)
    * (DECIMAL(38,0): cum·N reaches n_g·N ~ N²). The group violates t
    * (= tNum/tDen) iff emd_num·tDen > tNum·emd_den — all integers,
    * never a float division.
    *
    * Scale shape: ONE pass into the (QI, s) cell census (persisted — it
    * feeds the group totals, the m-row global histogram, and the cells
    * themselves), the m-row category frame broadcast onto the groups,
    * and one per-group cumulative window over m rows each. Output per
    * QI group: qiCols + (n, emd_num, emd_den, violates_t). */
  def tClosenessAudit(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, tNum: Long, tDen: Long): DataFrame = {
    require(tDen > 0 && tNum >= 0)
    val keys = qiCols.map(col)
    val cells = df.select(keys :+ col(sensitiveCol).as("__s"): _*)
      .where(col("__s").isNotNull)
      .groupBy(keys :+ col("__s"): _*).agg(count(lit(1)).as("__g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wCat = Window.partitionBy(Census.onePartKey(col("__s"))).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(Census.onePartKey(col("__s")))
    val cats = cells.groupBy(col("__s")).agg(sum(col("__g")).as("__ns"))
      .withColumn("__cum_n", sum(col("__ns")).over(wCat))
      .withColumn("__rk", row_number().over(Window.partitionBy(Census.onePartKey(col("__s"))).orderBy(col("__s"))))
      .withColumn("__m", count(lit(1)).over(wAll))
      .withColumn("__N", sum(col("__ns")).over(wAll))
      .select(col("__s"), col("__cum_n"), col("__rk"), col("__m"), col("__N"))
    val groups = cells.groupBy(keys: _*).agg(sum(col("__g")).as("n"))
    val wGrp = Window.partitionBy(keys: _*).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val d = (c: Column) => c.cast("decimal(38,0)")
    groups.crossJoin(broadcast(cats))
      .join(cells, qiCols :+ "__s", "left")
      .withColumn("__cum_g", sum(coalesce(col("__g"), lit(0L))).over(wGrp))
      .withColumn("__term",
        abs(d(col("__cum_g")) * d(col("__N")) -
          d(col("__cum_n")) * d(col("n"))))
      .groupBy(keys :+ col("n") :+ col("__m") :+ col("__N"): _*)
      .agg(coalesce(sum(when(col("__rk") < col("__m"), col("__term"))),
        lit(0).cast("decimal(38,0)")).as("emd_num"))
      .select(keys ++ Seq(col("n"), col("emd_num"),
        (d(col("n")) * d(col("__N")) * d(col("__m") - 1)).as("emd_den"),
        (col("emd_num") * d(lit(tDen)) >
          d(lit(tNum)) * d(col("n")) * d(col("__N")) * d(col("__m") - 1))
          .as("violates_t")): _*)
  }

  /** Local-DP private histogram of a sensitive bit: randomized response
    * (Warner 1965; the RAPPOR permanent-response shape, Erlingsson et al.
    * CCS'14) with per-user contribution bounding (Wilson et al. VLDB'20,
    * "Differentially Private SQL with Bounded User Contribution").
    *
    * Mechanism, per retained row: with probability 3/4 report the true
    * bit, else report a fair coin. P[report=1 | bit=1] = 7/8 and
    * P[report=1 | bit=0] = 1/8, so the per-row privacy loss is
    * ε = ln 7 ≈ 1.95; bounding each user to `maxPerUser` rows per group
    * caps the per-user loss at `maxPerUser`·ε by basic composition.
    * The unbiased count estimator is E[R] = 3/4·T + n/8, inverted as
    * T̂ = (8R − n)/6 and clamped at 0 — emitted in integer micro-units
    * so no double ever crosses an engine boundary.
    *
    * Determinism discipline: the "coins" are PolyHash64 draws of the
    * row id under two salt domains — stable across runs, partitionings,
    * and engines (the oracle replays the KR fold + splitMix64 chain),
    * which is what makes a DP mechanism testable at all. A production
    * deployment would swap the salt for per-release entropy; everything
    * else (bounding, mechanism, debias) is the real pipeline.
    *
    * Scale shape: the contribution bound is a per-(user,group) top-k
    * ranked window — WindowGroupLimit pushes the limit below the
    * exchange, so the shuffle carries ≤ maxPerUser rows per (user,group);
    * the mechanism itself is one codegen'd scalar pass and the histogram
    * a partial-agg groupBy. Output is one row per group.
    *
    * ⚠ PRIVACY WARNING — the output frame is NOT private as returned:
    * the `true_count` column is the EXACT sensitive tally, emitted
    * beside the DP estimate strictly as a test/audit aid (the oracle
    * gates on it). Any release boundary — a sink, an export, a report —
    * must `.drop("true_count")` first; shipping it voids the ε
    * guarantee entirely. Only `n`, `reported_true`, and `est_true_e6`
    * are safe to publish.
    */
  def randomizedResponse(df: DataFrame, idCol: String, userCol: String,
      groupCol: String, bit: Column, salt: String,
      maxPerUser: Int): DataFrame = {
    require(maxPerUser >= 1)
    PolyHash64.register(df.sparkSession)
    val w = Window.partitionBy(col(userCol), col(groupCol))
      .orderBy(col(idCol))
    val bounded = df
      .withColumn("__bit", bit)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= maxPerUser)
    def draw(domain: String): Column = shiftrightunsigned(
      PolyHash64.polyHash64(
        concat(col(idCol).cast("string"), lit(s"$salt#$domain"))), 13)
    val keepTrue = pmod(draw("keep"), lit(4L)) =!= 0L // p = 3/4
    val coin = pmod(draw("coin"), lit(2L)) === 1L     // fair
    bounded
      .withColumn("__rep", when(keepTrue, col("__bit")).otherwise(coin))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__rep"), 1L).otherwise(0L)).as("reported_true"),
        sum(when(col("__bit"), 1L).otherwise(0L)).as("true_count"))
      .withColumn("est_true_e6",
        expr("greatest(reported_true * 8 - n, 0) * 1000000 div 6"))
  }

  /** Central-DP noisy counts via the geometric mechanism (Ghosh,
    * Roughgarden, Sundararajan 2009 — the discrete Laplace): per group,
    * count + sign·mag with mag = floor(ln(1−u)·1e6 / (−ε_e6)), a
    * symmetric geometric draw at α = e^(−ε). Noise is DETERMINISTIC per
    * (group, salt) — two independent PolyHash64 chains (sign,
    * magnitude), the [[randomizedResponse]] replay discipline — so the
    * gate hash-verifies the whole mechanism cross-engine. The true
    * count rides along as the audit column (a production sink drops
    * it); the symmetric-geometric recipe doubles the 0 mass — a pinned
    * mechanism audit, not a certified ε accountant.
    *
    * Shape: one hash aggregate to group grain; the noise chains are
    * scalar projections on the group census. */
  def geometricNoisyCounts(df: DataFrame, groupCol: String, salt: String,
      epsilonE6: Long): DataFrame = {
    require(epsilonE6 > 0L, s"geometricNoisyCounts: ε_e6 = $epsilonE6")
    PolyHash64.register(df.sparkSession)
    val g = df.where(col(groupCol).isNotNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
    def draw(dom: String): Column = shiftrightunsigned(
      PolyHash64.polyHash64(
        concat(col(groupCol).cast("string"), lit(s"$salt#$dom"))), 13)
    g.withColumn("__sgn",
        when(pmod(draw("sign"), lit(2L)) === 1L, 1L).otherwise(-1L))
      .withColumn("__u",
        draw("mag").cast("double") / lit(2251799813685248.0)) // 2^51
      .withColumn("__mag", expr(
        s"CAST(floor(ln(1.0 - __u) * 1000000.0 / (0.0 - $epsilonE6))" +
          " AS BIGINT)"))
      .select(col(groupCol), col("n"),
        (col("__sgn") * col("__mag")).as("noise"),
        (col("n") + col("__sgn") * col("__mag")).as("noised"),
        abs(col("__sgn") * col("__mag")).as("abs_err"))
  }
}

