package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Last-touch attribution — the metric-level form of the reference's
  * impression→action join chain (SURVEY §2.4 J4: actions credit the
  * engagement that preceded them): each conversion event credits the
  * user's LATEST preceding touch event within a lookback window.
  *
  * Shape: ONE window pass over the (user, time) sort finds every
  * conversion's candidate touch time (running max of touch timestamps
  * over preceding rows — no self-join, no per-conversion probe), then one
  * narrow equi-join on (user, ts) recovers the touch's id. Ties (several
  * touches on one timestamp) resolve to the smallest touch id — a total
  * order, so the output hash-gates.
  *
  * At 100 TB this is the q09/as-of discipline: the heavy step is a single
  * hash exchange on the user key + one sort; the tie-resolving touch
  * frame aggregates BEFORE its join (bounded by distinct (user, ts)), and
  * the lookback filter decides in integer millis. */
object Attribution {

  /** Linear multi-touch attribution: every touch in the lookback shares
    * the conversion's credit equally — integer parts-per-million with the
    * truncation remainder assigned to the LATEST touch, so each
    * conversion's shares sum to exactly 1,000,000 (no double drift, no
    * lost ppm). Conversions with zero in-window touches emit nothing
    * (the [[lastTouch]] sentinel form covers the unattributed census).
    *
    * Shape: the (conversion × touch) pair set comes from
    * [[IntervalJoin.bucketedRangeJoin]] — coarse time buckets fold into
    * the join key, so one user's burst meets per bucket, not all-at-once
    * (the reference's interval-join-degradation lever) — then one window
    * over the pair frame ranks touches and deals the shares. */
  def linearTouch(events: DataFrame, userCol: String, idCol: String,
      tsCol: String, typeCol: String, touchType: String, convType: String,
      lookbackMs: Long): DataFrame = {
    require(lookbackMs > 1)
    val e = events.select(col(userCol).as("u"), col(idCol).as("id"),
      col(tsCol).as("ts"), col(typeCol).as("et"))
    val convs = e.where(col("et") === convType)
      .select(col("u"), col("id").as("conv_id"), col("ts").as("conv_ts"))
    val touches = e.where(col("et") === touchType)
      .select(col("u"), col("id").as("touch_id"), col("ts").as("touch_ts"))
    // the range join keeps both sides' key columns; rename positionally
    // (left columns first) and drop the duplicate
    val pairs = IntervalJoin.bucketedRangeJoin(convs, touches, Seq("u"),
        "conv_ts", "touch_ts", lowMs = -lookbackMs, highMs = -1L)
      .toDF("u", "conv_id", "conv_ts", "u2", "touch_id", "touch_ts")
      .drop("u2")
    val w = Window.partitionBy(col("conv_id"))
    val byRecency = w.orderBy(col("touch_ts").desc, col("touch_id"))
    pairs
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("rk", row_number().over(byRecency))
      .select(col("u").as(userCol), col("conv_id"), col("conv_ts"),
        col("touch_id"), col("touch_ts"),
        (expr("1000000L div n") +
          when(col("rk") === 1, expr("1000000L % n")).otherwise(lit(0L)))
          .as("share_ppm"))
  }

  /** Position-based (U-shaped) multi-touch attribution: the FIRST and
    * LAST in-window touches take 400,000 ppm each and the middles split
    * the remaining 200,000 evenly — the standard "position decay"
    * between the two linear/last-touch extremes. Degenerate forms stay
    * exact: one touch takes 1,000,000; two touches take 500,000 each;
    * with middles, the floor-division remainder of the middle pool goes
    * to the LAST touch (the [[linearTouch]] convention), so every
    * conversion's shares sum to exactly 1e6.
    *
    * Same pair-set shape as [[linearTouch]] (bucketed interval join +
    * one window); position rank orders by (touch_ts, touch_id) — a
    * total order, so the first/last assignment hash-gates. */
  def positionTouch(events: DataFrame, userCol: String, idCol: String,
      tsCol: String, typeCol: String, touchType: String, convType: String,
      lookbackMs: Long): DataFrame = {
    require(lookbackMs > 1)
    val e = events.select(col(userCol).as("u"), col(idCol).as("id"),
      col(tsCol).as("ts"), col(typeCol).as("et"))
    val convs = e.where(col("et") === convType)
      .select(col("u"), col("id").as("conv_id"), col("ts").as("conv_ts"))
    val touches = e.where(col("et") === touchType)
      .select(col("u"), col("id").as("touch_id"), col("ts").as("touch_ts"))
    val pairs = IntervalJoin.bucketedRangeJoin(convs, touches, Seq("u"),
        "conv_ts", "touch_ts", lowMs = -lookbackMs, highMs = -1L)
      .toDF("u", "conv_id", "conv_ts", "u2", "touch_id", "touch_ts")
      .drop("u2")
    val w = Window.partitionBy(col("conv_id"))
    val byTime = w.orderBy(col("touch_ts"), col("touch_id"))
    pairs
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("rk", row_number().over(byTime))
      .withColumn("share_ppm",
        when(col("n") === 1, lit(1000000L))
          .when(col("n") === 2, lit(500000L))
          .when(col("rk") === 1, lit(400000L))
          .when(col("rk") === col("n"),
            lit(400000L) + expr("200000L % (n - 2)"))
          .otherwise(expr("200000L div (n - 2)")))
      .select(col("u").as(userCol), col("conv_id"), col("conv_ts"),
        col("touch_id"), col("touch_ts"), col("rk").as("pos"),
        col("n").as("n_touches"), col("share_ppm"))
  }

  /** Credit each `convType` event to the user's latest preceding
    * `touchType` event at most `lookbackMs` older. Output: (userCol,
    * conv_id, conv_ts, touch_id, touch_ts, lag_ms, attributed) — the
    * touch columns are −1 sentinels when no touch qualifies. */
  def lastTouch(events: DataFrame, userCol: String, idCol: String,
      tsCol: String, typeCol: String, touchType: String, convType: String,
      lookbackMs: Long): DataFrame = {
    require(lookbackMs > 0)
    val e = events.select(col(userCol).as("u"), col(idCol).as("id"),
      col(tsCol).as("ts"), col(typeCol).as("et"))
      .where(col("et").isin(touchType, convType))
    // running latest touch time STRICTLY BEFORE each row: a RANGE frame
    // ending 1ms back makes equal-timestamp touches invisible (the
    // strictly-earlier rule), with no dependence on intra-ts row order
    val ordered = Window.partitionBy(col("u")).orderBy(col("ts"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val convs = e
      .withColumn("last_touch_ts",
        max(when(col("et") === touchType, col("ts"))).over(ordered))
      .where(col("et") === convType)
      .select(col("u"), col("id").as("conv_id"), col("ts").as("conv_ts"),
        col("last_touch_ts"))
    // smallest touch id per (user, ts) — the deterministic tie-break
    val touches = e.where(col("et") === touchType)
      .groupBy(col("u"), col("ts").as("touch_ts"))
      .agg(min(col("id")).as("touch_id"))
    convs
      .join(touches, convs("u") === touches("u") &&
        convs("last_touch_ts") === touches("touch_ts"), "left")
      .select(convs("u").as(userCol), col("conv_id"), col("conv_ts"),
        col("touch_id"), col("touch_ts"))
      .withColumn("in_window",
        col("touch_ts").isNotNull &&
          col("conv_ts") - col("touch_ts") <= lit(lookbackMs))
      .select(col(userCol), col("conv_id"), col("conv_ts"),
        when(col("in_window"), col("touch_id")).otherwise(lit(-1L))
          .as("touch_id"),
        when(col("in_window"), col("touch_ts")).otherwise(lit(-1L))
          .as("touch_ts"),
        when(col("in_window"), col("conv_ts") - col("touch_ts"))
          .otherwise(lit(-1L)).as("lag_ms"),
        col("in_window").as("attributed"))
  }

  /** Data-driven Shapley attribution (Shapley 1953 applied to channel
    * credit — Dalessandro et al. 2012, "Causally motivated attribution
    * for online advertising"; Zhao et al. 2018): each channel's credit is
    * its average marginal lift of the observed conversion rate across all
    * coalitions,
    *
    *   φ_i = Σ_{S ∌ i} |S|!·(n−|S|−1)!/n! · (v(S∪{i}) − v(S))
    *
    * with the characteristic function v(S) = the e6-truncated conversion
    * rate of users whose exposure set is EXACTLY S (0 for unobserved
    * sets — the standard data-driven estimator).
    *
    * Exactness: with n fixed and small, the coalition weights scale to
    * integers by n! — the output is φ·n!·10⁶, a pure BIGINT sum, plus
    * the exact (num, den) of the efficiency check Σφ_i = v(N) − v(∅).
    *
    * Scale shape: ONE aggregate collapses the corpus to its ≤2ⁿ exposure
    * masks; the Shapley sum is a broadcast-literal (channel × coalition)
    * table joined against that tiny frame — the 100 TB input is touched
    * exactly once. n ≤ 12 enforced (4096-mask ceiling). */
  def shapleyChannels(df: DataFrame, userCol: String, typeCol: String,
      channels: Seq[String], convType: String): DataFrame = {
    val n = channels.size
    require(n >= 1 && n <= 12, "channels must be 1..12")
    val spark = df.sparkSession
    import spark.implicits._
    // per-user exposure mask + conversion flag, then per-mask stats
    val maskCol = channels.zipWithIndex.map { case (ch, i) =>
      when(max(when(col(typeCol) === ch, 1L).otherwise(0L)) === 1L,
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val perMask = df.groupBy(col(userCol))
      .agg(maskCol.as("mask"),
        max(when(col(typeCol) === convType, 1L).otherwise(0L)).as("conv"))
      .groupBy(col("mask"))
      .agg(count(lit(1)).as("users"), sum(col("conv")).as("convs"))
      .withColumn("v_e6", expr("convs * 1000000 div users"))
    // literal (channel, coalition-without-it, scaled weight) table:
    // weight(s) = s!·(n−1−s)! so that Σ_S weight = n! exactly
    def fact(k: Int): Long = (1 to k).foldLeft(1L)(_ * _)
    val coalitions = for {
      (ch, i) <- channels.zipWithIndex
      s <- 0 until (1 << n) if (s & (1 << i)) == 0
    } yield (ch, s.toLong, (s.toLong | (1L << i)),
      fact(java.lang.Long.bitCount(s)) * fact(n - 1 - java.lang.Long.bitCount(s)))
    val co = broadcast(coalitions
      .toDF("channel", "s_mask", "si_mask", "w"))
    val vs = perMask.select(col("mask"), col("v_e6"))
    // v(S) and v(S∪i) by two left joins; unobserved masks contribute 0
    val joined = co
      .join(vs.withColumnRenamed("mask", "s_mask")
        .withColumnRenamed("v_e6", "v_s"), Seq("s_mask"), "left")
      .join(vs.withColumnRenamed("mask", "si_mask")
        .withColumnRenamed("v_e6", "v_si"), Seq("si_mask"), "left")
      .withColumn("lift",
        (coalesce(col("v_si"), lit(0L)) - coalesce(col("v_s"), lit(0L)))
          * col("w"))
    joined.groupBy(col("channel"))
      .agg(sum(col("lift")).as(s"phi_x${fact(n)}_e6"))
  }

  /** Markov-chain removal-effect attribution (Anderl et al. 2014,
    * "Mapping the customer journey"): model journeys as a first-order
    * chain START → touches → CONV/NULL, and credit each channel by how
    * much the chain's conversion probability DROPS when the channel is
    * removed (its inbound edges redirected to NULL) — the third member
    * of the attribution family next to heuristic touch rules (q110/
    * q111/q117) and Shapley (q234).
    *
    * Exactness: absorption probabilities come from `rounds` steps of
    * value iteration in e9 fixed-point with truncating division per
    * step — a deterministic integer recurrence (the q77 PageRank
    * discipline), identical on any engine that replays the same
    * transition counts and rounds.
    *
    * Scale shape: journey building and transition counting are the
    * distributed passes (one window over the (user, ts) sort + one
    * aggregate); the chain itself is ≤ (channels+3)² counts — a bounded
    * census the driver solves directly (the documented bounded-collect
    * class: MG candidate row, ZOrder manifest). Output per channel:
    * p_base_e9, p_removed_e9, removal_e6 = (base−removed)·1e6 div base.
    */
  def markovRemoval(df: DataFrame, userCol: String, idCol: String,
      tsCol: String, typeCol: String, channels: Seq[String],
      convType: String, rounds: Int = 8): DataFrame = {
    require(channels.nonEmpty && rounds >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val e = df.select(col(userCol).as("u"), col(idCol).as("i"),
      col(tsCol).cast("long").as("ts"), col(typeCol).as("t"))
    val firstConv = e.where(col("t") === convType)
      .groupBy(col("u")).agg(min(col("ts")).as("cts"))
    val touches = e.where(col("t").isin(channels: _*))
      .join(firstConv.withColumnRenamed("u", "u2"),
        col("u") === col("u2"), "left")
      .where(col("cts").isNull || col("ts") < col("cts"))
      .select(col("u"), col("i"), col("ts"), col("t"),
        col("cts").isNotNull.as("conv"))
    val w = Window.partitionBy(col("u")).orderBy(col("ts"), col("i"))
    val wDesc = Window.partitionBy(col("u"))
      .orderBy(col("ts").desc, col("i").desc)
    val stepEdges = touches
      .withColumn("src", coalesce(lag(col("t"), 1).over(w), lit("_START")))
      .select(col("src"), col("t").as("dst"))
    val termEdges = touches
      .withColumn("rn", row_number().over(wDesc)).where(col("rn") === 1)
      .select(col("t").as("src"),
        when(col("conv"), "_CONV").otherwise("_NULL").as("dst"))
    // converting users with zero pre-conversion touches: START → CONV
    val directConv = firstConv
      .join(touches.select(col("u")).distinct()
          .withColumnRenamed("u", "u3"),
        col("u") === col("u3"), "left_anti")
      .select(lit("_START").as("src"), lit("_CONV").as("dst"))
    val counts = stepEdges.unionByName(termEdges).unionByName(directConv)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // driver-side value iteration over the bounded chain
    def absorb(removed: Option[String]): Long = {
      val edges = counts
        .filter { case (s, _, _) => !removed.contains(s) }
        .map { case (s, d, n) =>
          (s, if (removed.contains(d)) "_NULL" else d, n) }
      val bySrc = edges.groupBy(_._1)
      val states = (channels :+ "_START").filterNot(removed.contains)
      var v = states.map(_ -> 0L).toMap + ("_CONV" -> 1000000000L) +
        ("_NULL" -> 0L)
      (1 to rounds).foreach { _ =>
        val next = states.map { s =>
          val out = bySrc.getOrElse(s, Array.empty[(String, String, Long)])
          val tot = out.map(_._3).sum
          val num = out.map { case (_, d, n) => n * v.getOrElse(d, 0L) }.sum
          s -> (if (tot == 0) 0L else num / tot)
        }.toMap
        v = next + ("_CONV" -> 1000000000L) + ("_NULL" -> 0L)
      }
      v("_START")
    }
    val base = absorb(None)
    val rows = channels.map { c =>
      val removedP = absorb(Some(c))
      val eff = if (base == 0) 0L else (base - removedP) * 1000000L / base
      (c, base, removedP, eff)
    }
    spark.createDataset(rows)
      .toDF("channel", "p_base_e9", "p_removed_e9", "removal_e6")
  }
}
