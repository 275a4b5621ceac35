package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Checkpoints.TruncateOps

/** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter 1969;
  * the model behind every production entity-resolution system —
  * Splink, dedupe.io, the Census Bureau matchers).
  *
  * Where [[FuzzyJoin]] (q92) finds candidate pairs by string
  * similarity, this scores BLOCKED candidate pairs by evidence: each
  * field's agreement contributes the log-likelihood ratio
  * ln(m/u) (agree) or ln((1−m)/(1−u)) (disagree), where m =
  * P(agree | same entity) is a caller-supplied prior (or hard-EM
  * estimated — [[fellegiSunterEmM]]) and u = P(agree | different
  * entities) is estimated from the data itself — the classic
  * frequency identity u = Σ_v (f_v/n)², the probability two random
  * records agree on the field. High total score → link, low →
  * non-link, the middle band → clerical review.
  *
  * Exactness: u lands as exact ppm (Σ f_v² · 1e6 div n², DECIMAL(38,0)
  * products); each weight is ONE pinned double pipeline
  * round(ln(·)·1e6) on those integers (the [[Preference]] /
  * Dawid–Skene rule: integer-rounded BEFORE summation, so per-pair
  * scores are exact LONG sums both engines replay). u and m clamp to
  * [1, 999999] ppm so both log arguments stay finite.
  *
  * NULL semantics: a NULL key never agrees (Spark `===` is
  * null-rejecting and the CASE falls to the disagreement weight) —
  * the standard conservative choice when a missing-value γ state
  * isn't modeled.
  *
  * Scale shape: pairs come ONLY from the equi-join on `blockCols`
  * (never all-pairs — blocking is the caller's cardinality lever);
  * the u estimates and field weights live in ONE broadcast row
  * (weights are per-field constants — evaluating round(ln(·)) per
  * pair rides Spark's BigDecimal round path, measured 12× slower);
  * scoring is a codegen'd scalar expression over the joined stream.
  * Skewed blocks are ordinary join skew — AQE's skew-join split
  * applies. */
object RecordLinkage {

  private def wAgreeExpr(f: String, m: String): Column = expr(
    s"CAST(round(ln(CAST($m AS DOUBLE) / CAST(__u_$f AS DOUBLE))" +
      " * 1000000.0) AS BIGINT)")

  private def wDisagreeExpr(f: String, m: String): Column = expr(
    s"CAST(round(ln((1000000.0 - $m) / (1000000.0 - __u_$f))" +
      " * 1000000.0) AS BIGINT)")

  /** One exact-ppm u per field off value frequencies: Σ f_v²·1e6 div
    * n², clamped into the open (0, 1) ppm interval so log arguments
    * stay finite. One row, |fields| columns named __u_<field>. */
  private def uPpmRow(bKeep: DataFrame, fields: Seq[String]): DataFrame =
    fields.map { f =>
      bKeep.where(col(f).isNotNull)
        .groupBy(col(f)).agg(count(lit(1)).as("c"))
        .agg(sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("s2"))
        .crossJoin(bKeep.agg(count(lit(1)).as("nb")))
        .select(greatest(least(coalesce(
          expr("CAST(s2 * 1000000 div (CAST(nb AS DECIMAL(38,0)) * nb)" +
            " AS BIGINT)"), lit(1L)), lit(999999L)), lit(1L))
          .as(s"__u_$f"))
    }.reduce(_ crossJoin _)

  /** Blocked agreement-pattern × truth census (r15 optimization
    * round): ONE pass over the blocked pairs down to at most
    * 2^(|fields|+1) rows — per-field agreement bits `__g_<f>`, the
    * id-equality truth bit `__true`, and the pair count `__cnt`. The
    * FS score of a pair is a function of its PATTERN alone (the field
    * weights are per-field scalars), so every score histogram /
    * EM-round statistic downstream is a linear transform of this
    * census — the q343/q346 gates share one materialized build
    * instead of re-running the 9M-pair join each. */
  def agreementTruthCensus(a: DataFrame, b: DataFrame, idCol: String,
      blockCols: Seq[String], fields: Seq[String]): DataFrame = {
    require(blockCols.nonEmpty && fields.nonEmpty && fields.size <= 8)
    val aa = a.select((col(idCol).as("id_a") +: blockCols.map(col)) ++
      fields.map(f => col(f).as(s"__a_$f")): _*)
    val bb = b.select((col(idCol).as("id_b") +: blockCols.map(col)) ++
      fields.map(f => col(f).as(s"__b_$f")): _*)
    aa.join(bb, blockCols)
      .groupBy(fields.map(f =>
        when(col(s"__a_$f") === col(s"__b_$f"), 1L).otherwise(0L)
          .as(s"__g_$f")) :+
        when(col("id_a") === col("id_b"), 1L).otherwise(0L)
          .as("__true"): _*)
      .agg(count(lit(1)).as("__cnt"))
  }

  /** The [[fellegiSunterScores]] score distribution computed off a
    * precomputed [[agreementTruthCensus]]: identical per-pair score
    * arithmetic (same u estimation off `b`, same pinned-ln weights),
    * emitted at pattern grain as (score_e6, __true, __cnt). */
  def fellegiSunterScoresFromCensus(census: DataFrame, b: DataFrame,
      idCol: String, blockCols: Seq[String],
      fields: Seq[(String, Long)]): DataFrame = {
    require(fields.nonEmpty)
    fields.foreach { case (f, m) =>
      require(m > 0L && m < 1000000L, s"m_ppm for $f must be in (0, 1e6)")
    }
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val names = idCol +: (blockCols ++ fields.map(_._1))
    val bKeep = b.select(names.map(col): _*).persist(mem)
    val uRow = uPpmRow(bKeep, fields.map(_._1))
      .select(fields.flatMap { case (f, m) =>
        Seq(wAgreeExpr(f, s"$m").as(s"__wa_$f"),
          wDisagreeExpr(f, s"$m").as(s"__wd_$f"))
      }: _*)
      .truncate(true)
    bKeep.unpersist()
    census.crossJoin(broadcast(uRow))
      .withColumn("score_e6", fields.map { case (f, _) =>
        when(col(s"__g_$f") === 1L, col(s"__wa_$f"))
          .otherwise(col(s"__wd_$f"))
      }.reduce(_ + _))
      .select(col("score_e6"), col("__true"), col("__cnt"))
  }

  /** [[fellegiSunterEmM]] off a precomputed [[agreementTruthCensus]]
    * (the truth bit aggregates away; EM sees the same pattern
    * histogram the one-pass build produced before). */
  def fellegiSunterEmMFromCensus(census: DataFrame, b: DataFrame,
      idCol: String, blockCols: Seq[String], fields: Seq[(String, Long)],
      thresholdE6: Long, rounds: Int): DataFrame = {
    require(blockCols.nonEmpty && fields.nonEmpty)
    require(rounds >= 1 && rounds <= 8)
    require(fields.size <= 8, "pattern space is 2^|fields|; cap at 8")
    fields.foreach { case (f, m) =>
      require(m > 0L && m < 1000000L, s"init m_ppm for $f in (0, 1e6)")
    }
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val names = idCol +: (blockCols ++ fields.map(_._1))
    val bKeep = b.select(names.map(col): _*).persist(mem)
    val uRow = uPpmRow(bKeep, fields.map(_._1)).truncate(true)
    bKeep.unpersist()
    val pat = census
      .groupBy(fields.map { case (f, _) => col(s"__g_$f") }: _*)
      .agg(sum(col("__cnt")).as("__cnt"))
      .truncate(true)
    emMRounds(pat, uRow, fields, thresholdE6, rounds)
  }

  /** Score all blocked pairs under caller-supplied m priors.
    * Output: (id_a, id_b, score_e6, n_agree) per blocked pair. */
  def fellegiSunterScores(a: DataFrame, b: DataFrame, idCol: String,
      blockCols: Seq[String], fields: Seq[(String, Long)]): DataFrame = {
    require(blockCols.nonEmpty, "fellegiSunter: blocking keys required")
    require(fields.nonEmpty, "fellegiSunter: at least one field")
    fields.foreach { case (f, m) =>
      require(m > 0L && m < 1000000L, s"m_ppm for $f must be in (0, 1e6)")
    }
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val names = idCol +: (blockCols ++ fields.map(_._1))
    val bKeep = b.select(names.map(col): _*).persist(mem)
    val uRow = uPpmRow(bKeep, fields.map(_._1))
      .select(fields.flatMap { case (f, m) =>
        Seq(col(s"__u_$f"), wAgreeExpr(f, s"$m").as(s"__wa_$f"),
          wDisagreeExpr(f, s"$m").as(s"__wd_$f"))
      }: _*)
      .truncate(true)
    // the persist amortizes b across the |fields|+1 u aggregates, all
    // materialized by the eager checkpoint above; the pair join below
    // re-reads the source instead of holding the cache for the
    // caller's lifetime (the bradleyTerryE6 unpersist discipline)
    bKeep.unpersist()
    val aa = a.select((col(idCol).as("id_a") +: blockCols.map(col)) ++
      fields.map { case (f, _) => col(f).as(s"__a_$f") }: _*)
    val bb = bKeep.select((col(idCol).as("id_b") +: blockCols.map(col)) ++
      fields.map { case (f, _) => col(f).as(s"__b_$f") }: _*)
    val agree = (f: String) => col(s"__a_$f") === col(s"__b_$f")
    aa.join(bb, blockCols)
      .crossJoin(broadcast(uRow))
      .withColumn("score_e6", fields.map { case (f, _) =>
        when(agree(f), col(s"__wa_$f")).otherwise(col(s"__wd_$f"))
      }.reduce(_ + _))
      .withColumn("n_agree", fields.map { case (f, _) =>
        when(agree(f), 1L).otherwise(0L)
      }.reduce(_ + _))
      .select(col("id_a"), col("id_b"), col("score_e6"), col("n_agree"))
  }

  /** Unsupervised m-estimation by hard EM over AGREEMENT-PATTERN
    * sufficient statistics (the classical FS-EM of Winkler 1988, in
    * the deterministic hard-assignment form — the [[Preference]]
    * Dawid–Skene discipline, because soft posteriors don't hash-gate):
    * the blocked pairs collapse ONCE into the ≤ 2^|fields| agreement
    * patterns with counts; each round scores every pattern under the
    * current (m, u) weights, classifies pattern ≥ threshold as linked,
    * and re-estimates every field's m as the Laplace-smoothed exact
    * linked-agreement rate
    *   m_f = (Σ_linked cnt·γ_f + 1)·1e6 div (Σ_linked cnt + 2).
    *
    * Scale shape: ONE blocked-join pass total (the pattern histogram);
    * every round runs on that ≤ 2^|fields|-row frame against a one-row
    * parameter state (per-round eager localCheckpoint — the MM-round
    * rule). At 100 TB the rounds cost nothing; only the single
    * histogram pass touches the pairs.
    *
    * Output: one row per field — (field, m_ppm, u_ppm, wa_e6, wd_e6,
    * n_linked) — weights derived from the FINAL m, n_linked the linked
    * pair mass under those final weights. */
  def fellegiSunterEmM(a: DataFrame, b: DataFrame, idCol: String,
      blockCols: Seq[String], fields: Seq[(String, Long)],
      thresholdE6: Long, rounds: Int): DataFrame = {
    require(blockCols.nonEmpty && fields.nonEmpty)
    require(rounds >= 1 && rounds <= 8)
    require(fields.size <= 8, "pattern space is 2^|fields|; cap at 8")
    fields.foreach { case (f, m) =>
      require(m > 0L && m < 1000000L, s"init m_ppm for $f in (0, 1e6)")
    }
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val names = idCol +: (blockCols ++ fields.map(_._1))
    val bKeep = b.select(names.map(col): _*).persist(mem)
    val uRow = uPpmRow(bKeep, fields.map(_._1)).truncate(true)
    bKeep.unpersist()
    val aa = a.select(blockCols.map(col) ++
      fields.map { case (f, _) => col(f).as(s"__a_$f") }: _*)
    val bb = bKeep.select(blockCols.map(col) ++
      fields.map { case (f, _) => col(f).as(s"__b_$f") }: _*)
    // the one pass over blocked pairs: agreement-pattern histogram
    val pat = aa.join(bb, blockCols)
      .groupBy(fields.map { case (f, _) =>
        when(col(s"__a_$f") === col(s"__b_$f"), 1L).otherwise(0L)
          .as(s"__g_$f")
      }: _*)
      .agg(count(lit(1)).as("__cnt"))
      .truncate(true)
    emMRounds(pat, uRow, fields, thresholdE6, rounds)
  }

  /** The hard-EM round loop over a pattern histogram — shared by
    * [[fellegiSunterEmM]] and [[fellegiSunterEmMFromCensus]]. */
  private def emMRounds(pat: DataFrame, uRow: DataFrame,
      fields: Seq[(String, Long)], thresholdE6: Long,
      rounds: Int): DataFrame = {
    // parameter state: one row of __m_<f> ppm (u is static in uRow)
    var state = uRow.select(uRow.columns.map(col) ++
      fields.map { case (f, m) => lit(m).as(s"__m_$f") }: _*)
      .truncate(true)
    def weights(st: DataFrame): DataFrame = st.select(
      st.columns.map(col) ++ fields.flatMap { case (f, _) =>
        Seq(wAgreeExpr(f, s"__m_$f").as(s"__wa_$f"),
          wDisagreeExpr(f, s"__m_$f").as(s"__wd_$f"))
      }: _*)
    def scored(st: DataFrame): DataFrame =
      pat.crossJoin(broadcast(weights(st)))
        .withColumn("__score", fields.map { case (f, _) =>
          when(col(s"__g_$f") === 1L, col(s"__wa_$f"))
            .otherwise(col(s"__wd_$f"))
        }.reduce(_ + _))
    for (_ <- 1 to rounds) {
      val linked = scored(state).where(col("__score") >= thresholdE6)
      val mAgg = linked.agg(
        sum(col("__cnt")).as("__nl"),
        fields.map { case (f, _) =>
          sum(col("__cnt") * col(s"__g_$f")).as(s"__na_$f")
        }: _*)
      state = uRow.crossJoin(broadcast(mAgg))
        .select(uRow.columns.map(col) ++ fields.map { case (f, _) =>
          // empty linked set → sums are NULL → Laplace prior 1/2
          greatest(least(expr(
            s"(coalesce(__na_$f, 0) + 1) * 1000000" +
              " div (coalesce(__nl, 0) + 2)"),
            lit(999999L)), lit(1L)).as(s"__m_$f")
        }: _*)
        .truncate(true)
    }
    val finalLinked = scored(state).where(col("__score") >= thresholdE6)
      .agg(coalesce(sum(col("__cnt")), lit(0L)).as("__nl"))
    val full = weights(state).crossJoin(broadcast(finalLinked))
      .truncate(true)
    fields.map { case (f, _) =>
      full.select(lit(f).as("field"), col(s"__m_$f").as("m_ppm"),
        col(s"__u_$f").as("u_ppm"), col(s"__wa_$f").as("wa_e6"),
        col(s"__wd_$f").as("wd_e6"), col("__nl").as("n_linked"))
    }.reduce(_ unionByName _)
  }
}
