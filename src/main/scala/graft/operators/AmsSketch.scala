package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** AMS "tug-of-war" second-frequency-moment sketch (Alon, Matias &
  * Szegedy 1996) — the classic one-pass estimator for F₂ = Σₖ c(k)²,
  * i.e. the SELF-JOIN SIZE of a key stream: the number every
  * distributed join planner wants before it picks a strategy, and the
  * skew early-warning (F₂ ≫ N²/distinct ⇒ heavy keys).
  *
  * Estimator: for sketch column j, Xⱼ = Σ_rows signⱼ(key) with
  * signⱼ ∈ {−1, +1} drawn from the key's splitMix64 bits; E[Xⱼ²] = F₂.
  * Variance collapses by MEDIAN-OF-MEANS: `groups` groups of `reps`
  * columns each — group value = Σ of the 16 squares (the mean × reps,
  * division deferred), estimate = median of the group sums div reps.
  *
  * Determinism/replayability: signⱼ(k) is bit j of splitMix64(k) for
  * j < 64 and bit j−64 of splitMix64(k ⊕ 0x5DEECE66D) above — the
  * engine-standard finisher ([[graft.functions.RollingHash.splitMix64]])
  * that an oracle replays in unsigned 128-bit SQL. Bit-sliced signs are
  * not 4-wise independent in the textbook sense; this is the
  * deterministic AUDIT configuration (the gate compares the estimate
  * against exact F₂ computed in the same job), documented as such.
  *
  * Exactness: Xⱼ is a LONG (|Xⱼ| ≤ N); squares widen to DECIMAL(38,0)
  * before summing; the only divisions are the final `div reps` and the
  * error ppm, both exact truncating div on nonnegative values.
  *
  * Scale shape: the sketch is ONE map-side-combined aggregate over raw
  * rows — 80 codegen'd `sum(CASE…)` columns, no shuffle wider than one
  * row. The exact side is the key census (hash aggregate) + one sum.
  * Output: a single row (f2_exact, f2_est, err_ppm as strings/long).
  */
object AmsSketch {

  /** Requires `functions.PolyHash64.register(spark)` (the gate entry
    * registers graft_splitmix64). `key` must be LONG. */
  def f2AuditE6(df: DataFrame, key: Column, groups: Int = 5,
      reps: Int = 16): DataFrame = {
    require(groups >= 1 && reps >= 1 && groups * reps <= 128,
      s"AmsSketch.f2AuditE6: need 1 ≤ groups·reps ≤ 128, got $groups×$reps")
    val keyed = df.select(key.cast("long").as("k"))
      .withColumn("h0", expr("graft_splitmix64(k)"))
      .withColumn("h1", expr("graft_splitmix64(k ^ 25214903917L)"))
    val signSums: Seq[Column] = (0 until groups * reps).map { j =>
      val src = if (j < 64) "h0" else "h1"
      val bit = if (j < 64) j else j - 64
      sum(when(expr(s"(shiftrightunsigned($src, $bit) & 1) = 1"), 1L)
        .otherwise(-1L)).as(s"x$j")
    }
    val sk = keyed.agg(signSums.head, signSums.tail: _*)
    val groupSums: Seq[Column] = (0 until groups).map { g =>
      val terms = (0 until reps)
        .map(r => s"CAST(x${g * reps + r} AS DECIMAL(38,0)) * x${g * reps + r}")
        .mkString(" + ")
      expr(terms).as(s"m$g")
    }
    val med = sk.select(groupSums: _*)
      .select(expr(("array_sort(array(" +
        (0 until groups).map(g => s"m$g").mkString(", ") +
        s"))[${groups / 2}]")).as("medsum"))
      // deferred mean: sums are divisible-or-truncated once, exactly,
      // via the DECIMAL floor-div identity (quotient may exceed LONG
      // at extreme N, so no `div`)
      .select(expr(s"CAST((medsum - pmod(medsum, $reps)) / $reps" +
        " AS DECIMAL(38,0))").as("f2_est"))
    val exact = df.select(key.cast("long").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("c"))
      .agg(sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("f2_exact"))
    exact.crossJoin(broadcast(med))
      .select(col("f2_exact"), col("f2_est"),
        expr("""CAST(CAST(abs(f2_est - f2_exact) AS DECIMAL(38,0))
              | * 1000000 div f2_exact AS BIGINT)""".stripMargin)
          .as("err_ppm"))
  }
}
