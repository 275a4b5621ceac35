package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.functions.VectorExpressions

/** Similarity search over embedding columns (`Array[Float]`).
  *
  *  - `bruteForceTopK`: exact cosine top-k of a (small, broadcast) query set
  *    against the corpus — the correctness baseline. One broadcast join, no
  *    shuffle of the corpus; scales linearly in |corpus|·|queries|.
  *  - `lshBucketedPairs`: random-hyperplane (sign) LSH — the scale path:
  *    candidates form only inside equal signature buckets, sub-quadratic for
  *    near-dup mining at 100 TB. Signatures use deterministic pseudo-random
  *    hyperplanes derived from xxhash64 so plans are reproducible.
  *
  * Scoring uses the quantized integer dot products from VectorFunctions so
  * results are bit-deterministic across engines and partitionings.
  */
object Similarity {

  /** Exact re-rank of an ANN shortlist — the second stage of standard
    * two-stage retrieval (IVFADC/PQ shortlist for recall, exact scoring
    * for precision; Jégou et al. 2011 §V deploys exactly this). The
    * shortlist (`qid`, `cid`) joins back to its vectors and only those
    * |queries|·k' pairs pay the exact dot — at 100 TB the exact pass
    * touches a few hundred candidates per query instead of the corpus.
    * Output: qid, cid, rank, score_e6 (same contract as bruteForceTopK,
    * same (score DESC, cid) total order). */
  def rerankExact(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, shortlist: DataFrame, k: Int): DataFrame = {
    VectorExpressions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cvec"),
      VectorExpressions.normSqE9Fast(col(vecCol)).as("cn"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      VectorExpressions.normSqE9Fast(col(vecCol)).as("qn"))
    val scored = shortlist.select(col("qid"), col("cid"))
      .join(c, "cid")
      .join(broadcast(q), "qid")
      .withColumn("__score",
        cosineFromE9(VectorExpressions.dotE9Fast(col("qvec"), col("cvec")),
          col("qn"), col("cn")))
    val w = Window.partitionBy(col("qid")).orderBy(col("__score").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank"),
        round(col("__score") * 1e6).cast("long").as("score_e6"))
  }

  /** Exact top-k neighbors for each query vector.
    * Output: qid, cid, rank, score_e6 (cosine ·1e6, rounded). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    VectorExpressions.register(corpus.sparkSession)
    val withNorm = (df: DataFrame, p: String) => df.select(
      col(idCol).as(s"${p}id"), col(vecCol).as(s"${p}vec"),
      VectorExpressions.normSqE9Fast(col(vecCol)).as(s"${p}n"))
    // corpora often arrive as one small file → spread the scoring work
    val q = withNorm(queries, "q")
    val c = withNorm(corpus.repartition(col(idCol)), "c")
    val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("__score",
        cosineFromE9(VectorExpressions.dotE9Fast(col("qvec"), col("cvec")),
          col("qn"), col("cn")))
    val w = Window.partitionBy(col("qid")).orderBy(col("__score").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank"),
        round(col("__score") * 1e6).cast("long").as("score_e6"))
  }

  /** Contrastive triplet mining — the training-pair generator for metric
    * learning / embedding finetuning (the FaceNet/SimCLR data shape): for
    * each anchor, the most similar SAME-label vector (the positive) and
    * the most similar DIFFERENT-label vector (the HARD negative — the
    * mistake the model is closest to making; random negatives are
    * uninformative once training starts). Margin = pos − neg in e6 is the
    * quantity a triplet loss drives positive.
    *
    * Shape: one broadcast of the (small) anchor set against the corpus
    * scan, per-(anchor, same?) rank-1 via a two-branch window (the
    * rk=1 predicate rewrites to WindowGroupLimit: map-side top-1 heaps
    * BEFORE the exchange), then a single-row pivot per anchor. Quantized
    * integer dots → bit-deterministic scores; (score desc, id) total
    * order. Anchors lacking a positive or negative peer are dropped (a
    * triplet needs both). Output: anchor_id, pos_id, pos_e6, neg_id,
    * neg_e6, margin_e6. */
  def tripletMining(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, anchors: DataFrame): DataFrame = {
    VectorExpressions.register(emb.sparkSession)
    val c = emb.repartition(col(idCol)).select(col(idCol).as("cid"),
      col(vecCol).as("cvec"), col(labelCol).as("clabel"),
      VectorExpressions.normSqE9Fast(col(vecCol)).as("cn"))
    val q = anchors.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      col(labelCol).as("qlabel"),
      VectorExpressions.normSqE9Fast(col(vecCol)).as("qn"))
    val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("__score",
        cosineFromE9(VectorExpressions.dotE9Fast(col("qvec"), col("cvec")),
          col("qn"), col("cn")))
      .withColumn("same", col("qlabel") === col("clabel"))
    val w = Window.partitionBy(col("qid"), col("same"))
      .orderBy(col("__score").desc, col("cid"))
    val top = scored.withColumn("__r", row_number().over(w))
      .where(col("__r") === 1)
      .select(col("qid"), col("same"), col("cid"),
        round(col("__score") * 1e6).cast("long").as("s_e6"))
    top.groupBy(col("qid"))
      .agg(max(when(col("same"), struct(col("cid"), col("s_e6")))).as("p"),
        max(when(!col("same"), struct(col("cid"), col("s_e6")))).as("ng"))
      .where(col("p").isNotNull && col("ng").isNotNull)
      .select(col("qid").as("anchor_id"),
        col("p.cid").as("pos_id"), col("p.s_e6").as("pos_e6"),
        col("ng.cid").as("neg_id"), col("ng.s_e6").as("neg_e6"),
        (col("p.s_e6") - col("ng.s_e6")).as("margin_e6"))
  }

  /** Per-label centroid sufficient statistics — the class-prototype table
    * (nearest-class-mean classifiers, clustering seeds, per-class drift
    * monitors): for every (label, dimension), the member count and the
    * e9-quantized component sum. Kept as (n, Σ) INTEGER pairs, never a
    * divided mean — sums merge across shards by addition and hash-gate
    * exactly (the momentProfile discipline, lifted to vector columns).
    * One posexplode scan, map-side combine, labels×dims rows out. */
  def labelCentroidsE9(emb: DataFrame, vecCol: String,
      labelCol: String): DataFrame =
    emb.select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("label"), col("dim").cast("long").as("dim"),
        round(col("x").cast("double") * lit(1e9)).cast("long").as("x_e9"))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("x_e9")).as("sum_e9"))

  /** Exact integer Gram matrix over an embedding column — the
    * second-moment input to PCA / whitening / covariance-shrinkage: for
    * every dimension pair i ≤ j, Σ_v x_i·x_j with components quantized to
    * e3 first (integer products are exact and associative, so the matrix
    * hash-gates and shard-partials merge by addition; paired with
    * [[labelCentroidsE9]]'s first moments this gives the covariance
    * numerators n·Σxy − ΣxΣy exactly). The eigen step that follows is
    * O(d³) on a d×d table — driver/BLAS-side by design; THIS pass is the
    * one that must scale, and it's one scan: the d(d+1)/2 pair terms are
    * built inside a codegen'd nested transform per row (no self-join, no
    * pre-aggregation exchange), then partial sums collapse map-side into
    * d(d+1)/2 output cells. Output: (i, j, n, sum_xy_e6), i ≤ j. */
  /** Dominant principal direction by integer power iteration on the
    * [[gramMatrixE6]] output — the "what single direction explains this
    * embedding table" readout, with the documented labor split: the ONE
    * corpus scan builds the Gram (distributed, exact); the d×d eigen
    * step runs on the collected d(d+1)/2-cell census (the bounded-collect
    * class — markovRemoval's chain, MG's candidate row).
    *
    * Determinism: v₀ = [10⁶]^d; each round u = G·v (exact LONG — |u_i| ≤
    * d·|G|·10⁶, within range for e3-quantized unit-ish embeddings), then
    * renormalize v = u·10⁶ div max|u| (truncating; max-norm avoids any
    * sqrt). The Gram is PSD so iterates converge without sign flips; ties
    * and truncation are identical on any engine replaying the same
    * integer recurrence (the oracle unrolls all rounds in SQL). Output:
    * one row per dimension (i, v_e6) plus the final pre-normalization
    * max |u| as `scale` — the dominant-eigenvalue readout (λ ≈ scale/10⁶
    * in Gram units). */
  def powerIterationTopComponent(emb: DataFrame, vecCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1)
    val spark = emb.sparkSession
    import spark.implicits._
    val upper = gramMatrixE6(emb, vecCol)
      .select(col("i"), col("j"), col("sum_xy_e6")).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2)))
    val d = upper.map(t => math.max(t._1, t._2)).max + 1
    val g = Array.ofDim[Long](d, d)
    upper.foreach { case (i, j, x) => g(i)(j) = x; g(j)(i) = x }
    var v = Array.fill(d)(1000000L)
    var scale = 0L
    (1 to rounds).foreach { _ =>
      val u = Array.tabulate(d)(i =>
        (0 until d).map(j => g(i)(j) * v(j)).sum)
      scale = u.map(math.abs).max
      // u·10⁶ exceeds a LONG before the division — normalize in BigInt
      // (the oracle's HUGEINT), truncating toward zero like `div`
      v = u.map(x => if (scale == 0) 0L
        else (BigInt(x) * 1000000 / scale).toLong)
    }
    spark.createDataset(v.toSeq.zipWithIndex
        .map { case (x, i) => (i.toLong, x, scale) })
      .toDF("dim", "v_e6", "scale")
  }

  def gramMatrixE6(emb: DataFrame, vecCol: String): DataFrame = {
    val arr = transform(col(vecCol),
      x => round(x.cast("double") * lit(1000.0)).cast("long"))
    emb.select(arr.as("a"))
      .select(explode(flatten(transform(
        sequence(lit(0), size(col("a")) - 1),
        i => transform(sequence(i, size(col("a")) - 1),
          j => struct(i.cast("long").as("i"), j.cast("long").as("j"),
            (element_at(col("a"), (i + 1).cast("int")) *
              element_at(col("a"), (j + 1).cast("int"))).as("xy"))))))
        .as("p"))
      .groupBy(col("p.i").as("i"), col("p.j").as("j"))
      .agg(count(lit(1)).as("n"), sum(col("p.xy")).as("sum_xy_e6"))
  }

  /** Nearest-centroid-classifier confusion matrix — the embedding-space
    * eval (how separable are the labels under their own class means):
    * each vector is assigned the label of its nearest class centroid and
    * the (true, predicted) census comes back.
    *
    * All-integer scoring: components shift by +1 (distances are
    * shift-invariant; the shift makes every quantized value and centroid
    * sum POSITIVE, so truncating and flooring division coincide — no
    * engine disagreement on negative division), quantize to e3, centroid
    * component = Σ div n, distance = Σ(x−c)² in BIGINTs, argmin by
    * (distance, label) struct-min — a total order. Shape: centroids are
    * a labels×dims broadcast; the exploded scan joins per dim, partial
    * sums collapse map-side; the exchange carries |vectors|·|labels|
    * distance rows pre-combined. Output: (true_label, pred_label, n). */
  def nearestCentroidConfusion(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val comps = emb.select(col(idCol).as("id"), col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("id"), col("label"), col("dim"),
        round((col("x").cast("double") + lit(1.0)) * lit(1000.0))
          .cast("long").as("x_e3"))
    val cent = comps.groupBy(col("label").as("clabel"), col("dim"))
      .agg(expr("sum(x_e3) div count(1)").as("c_e3"))
    val scored = comps
      .join(broadcast(cent), "dim")
      .withColumn("d2",
        (col("x_e3") - col("c_e3")) * (col("x_e3") - col("c_e3")))
      .groupBy(col("id"), col("label"), col("clabel"))
      .agg(sum(col("d2")).as("dist"))
    scored
      .groupBy(col("id"), col("label"))
      .agg(min(struct(col("dist"), col("clabel"))).as("k"))
      .groupBy(col("label").as("true_label"),
        col("k.clabel").as("pred_label"))
      .agg(count(lit(1)).as("n"))
  }

  /** Shifted-e3 quantized (point × centroid) squared-distance frame —
    * the shared front half of [[nearestCentroidConfusion]],
    * [[silhouetteSimplifiedE6]] and [[daviesBouldinE6]]: quantize each
    * component on the positive e3 grid (floor-div == truncating div, so
    * the centroid means replay exactly in any engine), centroid table
    * at (label × dim) grain broadcast, integer squared distances summed
    * per (point, centroid). ONE corpus scan; k×d stays driver-small. */
  private def centroidDistances(emb: DataFrame, idCol: String,
      vecCol: String, labelCol: String): (DataFrame, DataFrame) = {
    val comps = emb.select(col(idCol).as("id"), col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("id"), col("label"), col("dim"),
        round((col("x").cast("double") + lit(1.0)) * lit(1000.0))
          .cast("long").as("x_e3"))
    val cent = comps.groupBy(col("label").as("clabel"), col("dim"))
      .agg(expr("sum(x_e3) div count(1)").as("c_e3"),
        count(lit(1)).as("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val scored = comps
      .join(broadcast(cent.drop("__n")), "dim")
      .withColumn("d2",
        (col("x_e3") - col("c_e3")) * (col("x_e3") - col("c_e3")))
      .groupBy(col("id"), col("label"), col("clabel"))
      .agg(sum(col("d2")).as("dist"))
    (scored, cent)
  }

  /** Simplified (centroid-based) silhouette per label — the clustering
    * quality audit that scales: a(i) = d²(x, own centroid), b(i) = min
    * over OTHER labels of d²(x, centroid), s(i)·1e6 = (b−a)·1e6 div
    * max(a,b). Squared distances throughout (documented variant — the
    * O(n·k) silhouette every large-scale pipeline substitutes for the
    * O(n²) exact one; sign and ordering semantics are preserved). A
    * point equal to both centroids (max = 0) pins s = 0; a corpus with
    * a single label leaves b undefined → s NULL and the point counted
    * in n_points but not n_scored.
    *
    * Output per label: n_points, n_scored, n_misplaced (closer to a
    * foreign centroid — the actionable list), sum_s_e6 (DECIMAL, exact
    * mergeable), mean_silhouette_e6.
    *
    * Shape: one corpus scan to (point × k) distances against a
    * broadcast k×d centroid table, one point-grain reduce, one
    * label-grain census. No pairwise point joins anywhere. */
  def silhouetteSimplifiedE6(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val (scored, _) = centroidDistances(emb, idCol, vecCol, labelCol)
    val per = scored.groupBy(col("id"), col("label"))
      .agg(
        min(when(col("clabel") === col("label"), col("dist"))).as("a"),
        min(when(col("clabel") =!= col("label"), col("dist"))).as("b"))
      .withColumn("s_e6", expr(
        """CASE WHEN b IS NULL THEN NULL
          | WHEN greatest(a, b) = 0 THEN 0
          | ELSE CAST(CAST(b - a AS DECIMAL(38,0)) * 1000000
          |   div greatest(a, b) AS BIGINT) END""".stripMargin))
    per.groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_points"),
        count(col("s_e6")).as("n_scored"),
        sum(when(col("b").isNotNull && col("b") < col("a"), 1L)
          .otherwise(0L)).as("n_misplaced"),
        sum(col("s_e6").cast("decimal(38,0)")).cast("decimal(38,0)")
          .as("sum_s_e6"))
      .withColumn("mean_silhouette_e6", expr(
        """CASE WHEN n_scored = 0 THEN NULL
          | ELSE CAST(sum_s_e6 div n_scored AS BIGINT) END""".stripMargin))
  }

  /** Davies–Bouldin terms per label on the same shifted-e3 grid:
    * within-cluster squared scatter S_i = Σ d²(x, c_i) div n_i, pairwise
    * centroid separation m²_ij, ratio R_ij·1e6 = (S_i + S_j)·1e6 div
    * m²_ij, and each cluster's worst peer D_i = max_j R_ij (the DB
    * index is the mean of D_i — left to the reader of the k-row table,
    * which is the actionable per-cluster diagnostic). Coincident
    * centroids (m² = 0) make the pair's ratio undefined → that pair is
    * skipped and `degenerate_pairs` counts it, loudly.
    *
    * Shape: one corpus scan for the scatters (own-centroid distances
    * only), then all pair arithmetic on the k-row centroid census —
    * k² stays trivial for any real label space. */
  def daviesBouldinE6(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val (scored, cent) = centroidDistances(emb, idCol, vecCol, labelCol)
    val scatter = scored.where(col("clabel") === col("label"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), sum(col("dist")).as("__sd"))
      .withColumn("s2", expr("CAST(__sd AS DECIMAL(38,0)) div n")
        .cast("long"))
      .select(col("label"), col("n"), col("s2"))
    val m2 = cent.as("x").join(cent.as("y"),
        col("x.clabel") =!= col("y.clabel") &&
        col("x.dim") === col("y.dim"))
      .groupBy(col("x.clabel").as("la"), col("y.clabel").as("lb"))
      .agg(sum((col("x.c_e3") - col("y.c_e3")) *
        (col("x.c_e3") - col("y.c_e3"))).as("m2"))
    val ratios = m2
      .join(scatter.select(col("label").as("la"), col("s2").as("sa")), "la")
      .join(scatter.select(col("label").as("lb"), col("s2").as("sb")), "lb")
      .withColumn("r_e6", expr(
        """CASE WHEN m2 = 0 THEN NULL
          | ELSE CAST(CAST(sa + sb AS DECIMAL(38,0)) * 1000000
          |   div m2 AS BIGINT) END""".stripMargin))
    val worst = ratios.groupBy(col("la").as("label"))
      .agg(
        sum(when(col("r_e6").isNull, 1L).otherwise(0L))
          .as("degenerate_pairs"),
        max(struct(col("r_e6"), col("lb"))).as("__w"))
      .select(col("label"), col("degenerate_pairs"),
        col("__w.lb").as("worst_peer"), col("__w.r_e6").as("db_term_e6"))
    scatter.join(worst, Seq("label"), "left")
      .select(col("label"), col("n"), col("s2"),
        col("worst_peer"), col("db_term_e6"),
        coalesce(col("degenerate_pairs"), lit(0L)).as("degenerate_pairs"))
  }

  /** Calinski–Harabasz variance-ratio criterion (Caliński & Harabasz
    * 1974) on the same shifted-e3 grid as the q369/q370 audits — the
    * third leg of the cluster-quality triad: between-cluster scatter
    * against within-cluster scatter, DoF-corrected,
    *
    *   B = Σ_l n_l·d²(c_l, g),  W = Σ_points d²(x, c_own),
    *   ch_e6 = (B·(n−k))·1e6 div (W·(k−1))
    *
    * with g the global centroid on the identical truncated-mean
    * convention (sum div count per dimension). Higher = tighter,
    * better-separated clusters. NULL when k < 2 or W = 0 (degenerate —
    * any value would be a lie). Exact: squared e3 distances are LONGs
    * summed into DECIMAL(38,0); ONE truncating division.
    *
    * Shape: the [[silhouetteSimplifiedE6]] scan for W (own-centroid
    * distances), centroid-census arithmetic for B, a single-row
    * output (n, k, b_num, w_num, ch_e6). */
  def calinskiHarabaszE6(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val (scored, cent) = centroidDistances(emb, idCol, vecCol, labelCol)
    val w = scored.where(col("clabel") === col("label"))
      .agg(count(lit(1)).as("n"),
        sum(col("dist").cast("decimal(38,0)")).as("w_num"))
    val comps = emb.select(col(idCol).as("id"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("dim"),
        round((col("x").cast("double") + lit(1.0)) * lit(1000.0))
          .cast("long").as("x_e3"))
    val global = comps.groupBy(col("dim"))
      .agg(expr("sum(x_e3) div count(1)").as("g_e3"))
    val sizes = scored.where(col("clabel") === col("label"))
      .groupBy(col("label")).agg(count(lit(1)).as("nl"))
    val b = cent.join(broadcast(global), "dim")
      .groupBy(col("clabel"))
      .agg(sum((col("c_e3") - col("g_e3")) * (col("c_e3") - col("g_e3")))
        .as("d2"))
      .join(sizes, col("clabel") === col("label"))
      .agg(count(lit(1)).as("k"),
        sum(expr("CAST(nl AS DECIMAL(38,0)) * d2")).as("b_num"))
    cent.unpersist()
    w.crossJoin(broadcast(b))
      .select(col("n"), col("k"), col("b_num"), col("w_num"),
        when(col("k") > 1L && col("w_num") > 0L, expr(
          """CAST(b_num * (n - k) * 1000000
            |div (w_num * (k - 1)) AS BIGINT)""".stripMargin))
          .as("ch_e6"))
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    * 1998) — the diversified-retrieval step between ANN recall and
    * the final context window: greedily pick items that are RELEVANT
    * to the query but NOT redundant with what's already picked,
    *
    *   mmr = (7·rel_e6 − 3·maxsim_e6) div 10        (λ = 0.7 pinned)
    *
    * with rel = cosine to the query and maxsim = max cosine to the
    * already-selected set (0 for the first pick, pinned). Ties break
    * on the lower candidate id; the truncating division rounds toward
    * zero in both engines (mmr can go negative when redundancy
    * dominates).
    *
    * Scale shape: relevance is the [[bruteForceTopK]] distributed scan
    * (or any ANN stage) — the GREEDY phase runs on the poolK-bounded
    * candidate set only: poolK² pairwise cosines (one tiny join) and a
    * driver-side fold over ≤ 64 rows (the [[ExactQuantiles]]
    * bounded-fetch pattern; selection is inherently sequential, and
    * bounding the pool is what makes MMR tractable at ANY scale).
    * Output: (pick_rank, cid, rel_e6, maxsim_e6, mmr_e6). */
  def mmrRerankE6(corpus: DataFrame, idCol: String, vecCol: String,
      queryId: Long, poolK: Int, selectK: Int): DataFrame = {
    require(poolK >= selectK && selectK >= 1 && poolK <= 64,
      s"Similarity.mmrRerankE6: need 1 ≤ selectK ≤ poolK ≤ 64")
    val spark = corpus.sparkSession
    import spark.implicits._
    VectorExpressions.register(spark)
    val cand = bruteForceTopK(corpus,
        corpus.where(col(idCol) === queryId), idCol, vecCol, poolK)
      .select(col("cid"), col("score_e6").as("rel"))
    val cvec = corpus.join(cand, corpus(idCol) === cand("cid"))
      .select(col("cid"), col(vecCol).as("v"),
        VectorExpressions.normSqE9Fast(col(vecCol)).as("nn"))
    val pairs = cvec.select(col("cid").as("x"), col("v").as("xv"),
        col("nn").as("xn"))
      .join(cvec.select(col("cid").as("y"), col("v").as("yv"),
        col("nn").as("yn")), col("x") < col("y"))
      .withColumn("sim", round(graft.functions.VectorFunctions
        .cosineFromE9(VectorExpressions.dotE9Fast(col("xv"), col("yv")),
          col("xn"), col("yn")) * 1e6).cast("long"))
      .select(col("x"), col("y"), col("sim"))
    val candRows = cand.orderBy(col("cid")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val simMap = pairs.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    def simOf(i: Long, j: Long): Long =
      if (i < j) simMap.getOrElse((i, j), 0L)
      else simMap.getOrElse((j, i), 0L)
    var remaining = candRows.toVector
    val sel = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long)]
    var k = 1
    while (k <= selectK && remaining.nonEmpty) {
      val scored = remaining.map { case (cid, rel) =>
        val ms = if (sel.isEmpty) 0L
          else sel.iterator.map(s => simOf(cid, s._2)).max
        ((7L * rel - 3L * ms) / 10L, cid, rel, ms)
      }
      val best = scored.minBy(t => (-t._1, t._2))
      sel += ((k.toLong, best._2, best._3, best._4, best._1))
      remaining = remaining.filterNot(_._1 == best._2)
      k += 1
    }
    sel.toSeq.toDF("pick_rank", "cid", "rel_e6", "maxsim_e6", "mmr_e6")
  }

  /** Greedy facility-location selection (Lin & Bilmes 2011's submodular
    * summarization objective; Wei/Iyer/Bilmes 2015 for ML data
    * selection): pick `selectK` exemplars maximizing the coverage
    * F(S) = Σ_v max_{s∈S} sim⁺(v, s) over the pool, where sim⁺ is the
    * house quantized cosine clamped at 0 (facility location needs a
    * nonnegative kernel). The 1−1/e-approximate greedy: each round
    * adds the candidate with the largest exact-integer marginal gain
    * Σ_v max(0, sim⁺ − cover(v)), ties to the smaller id — the
    * representative-subset step of coverage-based coreset curation
    * (the diversity-side complement of [[mmrRerankE6]]'s
    * relevance/novelty trade).
    *
    * Scale shape: pairwise cosines on the BOUNDED pool only (≤
    * `maxPool` — counted, loud; at corpus scale the pool is a cluster
    * sample or ANN shortlist) and a driver-side fold over ≤ maxPool²
    * collected sims (the [[mmrRerankE6]] bounded-fetch pattern;
    * greedy selection is inherently sequential). Output per pick:
    * (pick_rank, cid, gain_e6, objective_e6 — the running F(S)). */
  def facilityLocationSelectE6(corpus: DataFrame, idCol: String,
      vecCol: String, poolPred: Column, selectK: Int,
      maxPool: Int = 64): DataFrame = {
    require(selectK >= 1 && maxPool <= 256 && selectK <= maxPool,
      s"facilityLocationSelectE6: need 1 ≤ selectK ≤ maxPool ≤ 256")
    val spark = corpus.sparkSession
    import spark.implicits._
    VectorExpressions.register(spark)
    val pool = corpus.where(poolPred)
      .select(col(idCol).as("vid"), col(vecCol).as("v"),
        VectorExpressions.normSqE9Fast(col(vecCol)).as("nn"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = pool.count()
    require(n >= 1 && n <= maxPool,
      s"facilityLocationSelectE6: pool has $n rows — pass a bounded " +
        s"exemplar-candidate sample (≤ $maxPool), not the corpus")
    val sims = pool.select(col("vid").as("x"), col("v").as("xv"),
        col("nn").as("xn"))
      .crossJoin(pool.select(col("vid").as("y"), col("v").as("yv"),
        col("nn").as("yn")))
      .withColumn("sim", greatest(lit(0L),
        round(graft.functions.VectorFunctions
          .cosineFromE9(VectorExpressions.dotE9Fast(col("xv"), col("yv")),
            col("xn"), col("yn")) * 1e6).cast("long")))
      .select(col("x"), col("y"), col("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    pool.unpersist()
    val vids = sims.keys.map(_._1).toVector.distinct.sorted
    val cover = scala.collection.mutable.Map(vids.map(_ -> 0L): _*)
    var objective = 0L
    val out = scala.collection.mutable
      .ArrayBuffer.empty[(Long, Long, Long, Long)]
    val selected = scala.collection.mutable.Set.empty[Long]
    var k = 1
    while (k <= selectK && selected.size < vids.size) {
      val (gain, cid) = vids.filterNot(selected)
        .map(c => (vids.iterator
          .map(v => math.max(0L, sims((v, c)) - cover(v))).sum, c))
        .minBy(t => (-t._1, t._2))
      selected += cid
      vids.foreach(v => cover(v) = math.max(cover(v), sims((v, cid))))
      objective += gain
      out += ((k.toLong, cid, gain, objective))
      k += 1
    }
    out.toSeq.toDF("pick_rank", "cid", "gain_e6", "objective_e6")
  }

  /** Deterministic ±1 hyperplane component signs, shared by the Spark plans
    * and the SQL-oracle rendering so both engines block identically. */
  def planeSigns(plane: Int, dims: Int): Array[Long] =
    Array.tabulate(dims)(d =>
      if (graft.functions.XxHash64.hashString(s"$plane:$d", 0L) >= 0) 1L else -1L)

  /** Embedding dimensionality for plane construction: the explicit `dims`
    * parameter when given (the zero-cost path — callers that know their
    * schema should pass it), else sampled from the first corpus row
    * (a limit-1 scalar, not a full scan). Returns -1 on an empty corpus so
    * callers can short-circuit instead of throwing. Vectors shorter than
    * the resolved dims are truncated by the dot kernel's min-length loop —
    * mixed-dims corpora must pass `dims` explicitly. */
  private def resolveDims(corpus: DataFrame, vecCol: String, dims: Int): Int =
    if (dims > 0) dims
    else corpus.select(size(col(vecCol)).as("d")).take(1) match {
      case Array(r) => r.getInt(0)
      case _ => -1
    }

  /** Embedding-cosine near-duplicate pairs: all pairs (a < b) whose cosine
    * reaches `minScoreE6`/1e6, quantized-deterministic scoring.
    *
    * VERIFICATION BASELINE ONLY — the join is all-pairs (O(n²)); the
    * production path is `lshBandedNearDupPairs`, which blocks with banded
    * sign-LSH and re-ranks candidates with this same scoring. */
  def cosineNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
      minScoreE6: Long): DataFrame = {
    VectorExpressions.register(corpus.sparkSession)
    val n = corpus.repartition(col(idCol)).select(col(idCol).as("id"),
      col(vecCol).as("vec"), VectorExpressions.normSqE9Fast(col(vecCol)).as("nsq"))
    val a = n.select(col("id").as("a_id"), col("vec").as("__va"), col("nsq").as("__na"))
    val b = n.select(col("id").as("b_id"), col("vec").as("__vb"), col("nsq").as("__nb"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("__score",
        cosineFromE9(VectorExpressions.dotE9Fast(col("__va"), col("__vb")),
          col("__na"), col("__nb")))
      .withColumn("cos_e6", round(col("__score") * 1e6).cast("long"))
      .where(col("cos_e6") >= minScoreE6)
      .select("a_id", "b_id", "cos_e6")
  }

  /** Banded sign-LSH near-duplicate pairs — the sub-quadratic scale path.
    *
    * Blocking: `bands`×`rowsPerBand` pseudo-random hyperplanes (signs from
    * `planeSigns`, deterministic). Each vector gets one bucket per band —
    * the `rowsPerBand` sign bits of its integer-quantized projections
    * Σ round(x_d·1e9)·s_d (BIGINT arithmetic end-to-end, so any engine
    * computes bit-identical buckets). Candidates form only inside equal
    * (band, bucket) cells; exact quantized cosine re-ranks them.
    *
    * Candidate recall for a pair at angle θ is 1−(1−p^r)^b with
    * p = 1−θ/π — an explicit, tunable trade documented at the call site;
    * everything downstream of blocking is exact. `maxBucket > 0` caps hot
    * buckets (keeps the `maxBucket` lowest ids per cell — deterministic,
    * further recall loss) so one degenerate cell can never go quadratic.
    *
    * Output: a_id, b_id, cos_e6 — same shape as `cosineNearDupPairs`. */
  def lshBandedNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
      minScoreE6: Long, bands: Int, rowsPerBand: Int,
      maxBucket: Int = 0, dims: Int = -1): DataFrame = {
    VectorExpressions.register(corpus.sparkSession)
    val d = resolveDims(corpus, vecCol, dims)
    if (d < 0) // empty corpus: no rows to block, return the empty pair frame
      return corpus.select(col(idCol).as("a_id"), col(idCol).as("b_id"),
        lit(0L).as("cos_e6")).where(lit(false))
    val base = corpus.repartition(col(idCol)).select(col(idCol).as("id"),
      col(vecCol).as("vec"), VectorExpressions.normSqE9Fast(col(vecCol)).as("nsq"))

    val bandCols: Seq[Column] = (0 until bands).map { bIdx =>
      val bits = (0 until rowsPerBand).map { r =>
        // The projection Σ round(x_d·s_d·1e9) IS a quantized dot product
        // against the ±1 sign vector (sign flip commutes with half-away-
        // from-zero rounding), so it rides the codegen'd kernel instead of
        // an interpreted zip_with/aggregate pair per plane.
        val signVec = lit(planeSigns(bIdx * rowsPerBand + r, d).map(_.toFloat))
        val projE9 = VectorExpressions.dotE9Fast(col("vec"), signVec)
        when(projE9 >= 0, shiftleft(lit(1L), r)).otherwise(lit(0L))
      }
      struct(lit(bIdx).as("band"),
        bits.reduce((a: Column, b: Column) => a.bitwiseOR(b)).as("bucket"))
    }
    val bucketed = base
      .select(col("id"), explode(array(bandCols: _*)).as("__bb"))
      .select(col("id"), col("__bb.band").as("band"), col("__bb.bucket").as("bucket"))
    val capped = if (maxBucket > 0) {
      val w = Window.partitionBy(col("band"), col("bucket")).orderBy(col("id"))
      bucketed.withColumn("__rn", row_number().over(w))
        .where(col("__rn") <= maxBucket).drop("__rn")
    } else bucketed

    val cand = capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()

    cand
      .join(base.select(col("id").as("a_id"), col("vec").as("__va"),
        col("nsq").as("__na")), "a_id")
      .join(base.select(col("id").as("b_id"), col("vec").as("__vb"),
        col("nsq").as("__nb")), "b_id")
      .withColumn("cos_e6", round(
        cosineFromE9(VectorExpressions.dotE9Fast(col("__va"), col("__vb")),
          col("__na"), col("__nb")) * 1e6).cast("long"))
      .where(col("cos_e6") >= minScoreE6)
      .select("a_id", "b_id", "cos_e6")
  }

  /** Deterministic k-means training for the IVF coarse quantizer.
    *
    * Lloyd iterations with two determinism guarantees a distributed run
    * needs: (1) init is content-independent (the `nLists` lowest-id
    * vectors — k-means|| would add seeded randomness, same plumbing);
    * (2) the centroid update sums e9-quantized integer components, so the
    * mean is independent of partitioning and aggregation order (float
    * sums are not associative; integer sums are). Each iteration is one
    * broadcast-join assignment + one groupBy — no collect of the corpus;
    * only the nLists centroids ever land on the driver.
    * Returns (centId, centVec) with unit-independent raw means. */
  def trainIvfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nLists: Int, iters: Int, metric: String = "cosine"): DataFrame = {
    require(metric == "cosine" || metric == "l2", s"unknown metric $metric")
    VectorExpressions.register(corpus.sparkSession)
    val base = corpus.select(col(idCol).as("vid"), col(vecCol).as("vec"),
      VectorExpressions.normSqE9Fast(col(vecCol)).as("vn"))
    var cents = base.orderBy(col("vid")).limit(nLists)
      .select(col("vid").cast("long").as("centId"), col("vec").as("centVec"))
    for (_ <- 0 until iters) {
      val c = broadcast(cents.withColumn("centN",
        VectorExpressions.normSqE9Fast(col("centVec"))))
      // assignment score, HIGHER = closer (the .desc ordering below):
      // cosine for IVF lists; negated integer L2² for PQ sub-quantizers
      // (vn + cn - 2·dot in e9 quantization — classic k-means metric)
      val dot = VectorExpressions.dotE9Fast(col("vec"), col("centVec"))
      val scored = base.join(c)
        .withColumn("__cs",
          if (metric == "cosine") cosineFromE9(dot, col("vn"), col("centN"))
          else -(col("vn") + col("centN") - lit(2L) * dot))
      val w = Window.partitionBy(col("vid")).orderBy(col("__cs").desc, col("centId"))
      val assigned = scored.withColumn("__r", row_number().over(w))
        .where(col("__r") === 1)
      // order-independent mean: per-component e9-quantized long sums via
      // posexplode — a true partial aggregation (map-side combine on
      // (centId, pos)), never a per-group buffer of member vectors
      val compSums = assigned
        .select(col("centId"), posexplode(col("vec")).as(Seq("pos", "x")))
        .groupBy(col("centId"), col("pos"))
        .agg(sum(round(col("x").cast("double") * 1e9).cast("long")).as("s"),
          count(lit(1)).as("cnt"))
      cents = compSums
        .groupBy(col("centId"))
        .agg(transform(
          sort_array(collect_list(struct(col("pos"), col("s"), col("cnt")))),
          e => (e.getField("s") / e.getField("cnt")).cast("double") / lit(1e9))
          .cast("array<float>").as("centVec"))
    }
    cents
  }

  /** ALL-subspace PQ codebook training in ONE distributed job per Lloyd
    * iteration — per-subspace [[trainIvfCentroids]] loops launch
    * subspaces × iters separate jobs whose driver round-trips dominate the
    * wall clock; here the subspace index `m` joins the key instead, with
    * ARITHMETIC IDENTICAL to the per-subspace L2 runs (same e9-integer
    * assignment with lowest-centroid ties, same order-free integer
    * component sums, same float(s/n/1e9) centroid — q56's oracle
    * hash-gates the equality). Empty clusters drop from the book, as
    * there; callers get subspaces × codebookSize × subDim float arrays
    * ready for [[pqTopK]]. */
  def trainPqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      subspaces: Int, codebookSize: Int, iters: Int,
      dimsIn: Int = -1): Array[Array[Array[Float]]] = {
    VectorExpressions.register(corpus.sparkSession)
    val d = resolveDims(corpus, vecCol, dimsIn)
    require(d > 0 && d % subspaces == 0,
      s"dims $d not divisible by $subspaces subspaces")
    val subDim = d / subspaces
    val base = corpus
      .select(col(idCol).cast("long").as("vid"), col(vecCol).as("v"))
      .select(col("vid"), explode(expr(
        s"transform(sequence(0, ${subspaces - 1}), " +
          s"m -> struct(m AS m, slice(v, m*$subDim+1, $subDim) AS vec))")).as("s"))
      .select(col("vid"), col("s.m").as("m"), col("s.vec").as("vec"))
      .withColumn("vn", VectorExpressions.normSqE9Fast(col("vec")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val seed = broadcast(base.select("vid").distinct()
        .orderBy("vid").limit(codebookSize))
      var cents = base.join(seed, "vid")
        .select(col("m"), col("vid").as("centId"), col("vec").as("centVec"))
      for (_ <- 0 until iters) {
        val c = broadcast(cents.withColumn("centN",
          VectorExpressions.normSqE9Fast(col("centVec"))))
        val scored = base.join(c, "m").withColumn("__cs",
          -(col("vn") + col("centN") -
            lit(2L) * VectorExpressions.dotE9Fast(col("vec"), col("centVec"))))
        val w = Window.partitionBy(col("m"), col("vid"))
          .orderBy(col("__cs").desc, col("centId"))
        val assigned = scored.withColumn("__r", row_number().over(w))
          .where(col("__r") === 1)
        val compSums = assigned
          .select(col("m"), col("centId"), posexplode(col("vec")).as(Seq("pos", "x")))
          .groupBy(col("m"), col("centId"), col("pos"))
          .agg(sum(round(col("x").cast("double") * 1e9).cast("long")).as("s"),
            count(lit(1)).as("cnt"))
        cents = compSums.groupBy(col("m"), col("centId"))
          .agg(transform(
            sort_array(collect_list(struct(col("pos"), col("s"), col("cnt")))),
            e => (e.getField("s") / e.getField("cnt")).cast("double") / lit(1e9))
            .cast("array<float>").as("centVec"))
      }
      val rows = cents.select("m", "centId", "centVec").collect() // bounded book
      Array.tabulate(subspaces) { m =>
        rows.filter(_.getInt(0) == m).sortBy(_.getLong(1))
          .map(_.getSeq[Float](2).toArray)
      }
    } finally { base.unpersist(); () }
  }

  /** IVF-style ANN: coarse-quantize the corpus into `nLists` inverted
    * lists, probe the `nProbe` nearest lists per query, exact-rerank the
    * candidates. The 100 TB path: candidate work scales with
    * |corpus|·nProbe/nLists instead of |corpus|.
    *
    * Pass `centroids` from [[trainIvfCentroids]] for a trained quantizer;
    * the default is training-free (the nLists lowest-id vectors serve as
    * centroids) — both deterministic, same assignment/probe plumbing.
    * Output: qid, cid, rank, score_e6 — same shape as bruteForceTopK. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nLists: Int, nProbe: Int,
      centroids: Option[DataFrame] = None): DataFrame = {
    val centSrc = centroids.getOrElse(defaultIvfCentroids(corpus, idCol,
      vecCol, nLists))
    val cents = broadcastCentroids(corpus, centSrc)
    ivfSearchAssigned(
      nearestLists(corpus.repartition(col(idCol)), idCol, vecCol, "c", 1,
        cents),
      queries, idCol, vecCol, k, nProbe, cents)
  }

  /** Training-free coarse quantizer: the `nLists` lowest-id vectors. */
  def defaultIvfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nLists: Int): DataFrame =
    corpus.orderBy(col(idCol)).limit(nLists)
      .select(col(idCol).cast("long").as("centId"), col(vecCol).as("centVec"))

  private def broadcastCentroids(registerOn: DataFrame,
      centSrc: DataFrame): DataFrame = {
    VectorExpressions.register(registerOn.sparkSession)
    broadcast(centSrc.select(col("centId"), col("centVec"),
      VectorExpressions.normSqE9Fast(col("centVec")).as("centN")))
  }

  private def nearestLists(df: DataFrame, idCol: String, vecCol: String,
      p: String, keep: Int, cents: DataFrame): DataFrame = {
    val scored = df.select(col(idCol).as(s"${p}id"), col(vecCol).as(s"${p}vec"),
        VectorExpressions.normSqE9Fast(col(vecCol)).as(s"${p}n"))
      .join(cents)
      .withColumn("__cs",
        cosineFromE9(VectorExpressions.dotE9Fast(col(s"${p}vec"), col("centVec")),
          col(s"${p}n"), col("centN")))
    val w = Window.partitionBy(col(s"${p}id"))
      .orderBy(col("__cs").desc, col("centId"))
    scored.withColumn("__r", row_number().over(w)).where(col("__r") <= keep)
      .select(col(s"${p}id"), col(s"${p}vec"), col(s"${p}n"), col("centId"))
  }

  /** The maintenance seam: assign vectors to their nearest list WITHOUT
    * searching — the append path of an incrementally maintained IVF
    * index (new vectors encode against the FROZEN quantizer and land in
    * their list's partition; no rebuild). Output: (idCol, vecCol,
    * normsq, centId) — the materialization schema
    * [[ivfSearchAssigned]] consumes, centId last so
    * `partitionBy("centId")` layouts work directly. */
  def ivfAssign(corpus: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame): DataFrame =
    nearestLists(corpus.repartition(col(idCol)), idCol, vecCol, "c", 1,
      broadcastCentroids(corpus, cents))
      .select(col("cid").as(idCol), col("cvec").as(vecCol),
        col("cn").as("normsq"), col("centId"))

  /** Search a materialized assignment (the read side of the maintained
    * index): probe the `nProbe` nearest lists per query and exact-rerank
    * inside them. When `assigned` is a table PARTITIONED BY the list id,
    * the broadcast probe join dynamic-partition-prunes the scan to the
    * probed lists — the IVF read amplification story at 100 TB. */
  def ivfSearchIndex(assigned: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nProbe: Int, cents: DataFrame): DataFrame =
    ivfSearchAssigned(
      assigned.select(col(idCol).as("cid"), col(vecCol).as("cvec"),
        col("normsq").as("cn"), col("centId").cast("long").as("centId")),
      queries, idCol, vecCol, k, nProbe,
      broadcastCentroids(assigned, cents))

  private def ivfSearchAssigned(assigned: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int,
      cents: DataFrame): DataFrame = {
    val probes = nearestLists(queries, idCol, vecCol, "q", nProbe, cents)
    val cand = broadcast(probes).join(assigned, Seq("centId"))
      .where(col("qid") =!= col("cid"))
      .withColumn("__score",
        cosineFromE9(VectorExpressions.dotE9Fast(col("qvec"), col("cvec")),
          col("qn"), col("cn")))
    val w = Window.partitionBy(col("qid")).orderBy(col("__score").desc, col("cid"))
    cand.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank"),
        round(col("__score") * 1e6).cast("long").as("score_e6"))
  }

  /** Signed random projection (Achlioptas 2003, "Database-friendly random
    * projections" — public result): project embeddings onto `outDims`
    * deterministic ±1 hyperplanes, the Johnson–Lindenstrauss-style
    * compression run before ANN indexing at scale (dims → outDims cuts
    * index bytes and dot-product cost proportionally while approximately
    * preserving distances). Signs come from the same xxhash64-derived
    * [[planeSigns]] the LSH family uses, so projections are reproducible
    * across engines; components are e9-quantized integer sums (exact,
    * partition-order independent). Output: one row per (id, dim) with the
    * BIGINT projection — embarrassingly parallel, no shuffle. */
  def signedRandomProjection(corpus: DataFrame, idCol: String, vecCol: String,
      outDims: Int, dimsIn: Int = -1): DataFrame = {
    VectorExpressions.register(corpus.sparkSession)
    val d = resolveDims(corpus, vecCol, dimsIn)
    if (d < 0)
      return corpus.select(col(idCol).as("id"), lit(0).as("dim"),
        lit(0L).as("proj_e9")).where(lit(false))
    val cells = (0 until outDims).map { k =>
      val signVec = lit(planeSigns(k, d).map(_.toFloat))
      struct(lit(k).as("dim"),
        VectorExpressions.dotE9Fast(col(vecCol), signVec).as("proj_e9"))
    }
    corpus.repartition(col(idCol))
      .select(col(idCol).as("id"), explode(array(cells: _*)).as("__p"))
      .select(col("id"), col("__p.dim").as("dim"), col("__p.proj_e9").as("proj_e9"))
  }

  /** Product-quantization ANN (Jégou, Douze, Schmid, "Product Quantization
    * for Nearest Neighbor Search", TPAMI'11 — public result): split each
    * vector into `subspaces` subvectors, quantize each against a per-
    * subspace codebook, score query↔corpus by asymmetric distance
    * computation (ADC) — the query meets only the m codebook entries per
    * candidate, so a candidate costs m table lookups instead of d
    * multiplies, and the corpus stores m bytes instead of d floats. THE
    * memory lever at 100 TB: a 64-dim float corpus compresses 32× while
    * scans stay sequential.
    *
    * Determinism: the codebook is training-free — entry `code` of
    * subspace `m` is subvector m of the `codebookSize` lowest-id corpus
    * vectors (the q34 quantizer convention; swap in per-subspace
    * [[trainIvfCentroids]] output for trained codebooks, same plumbing).
    * Assignment minimizes the e9-quantized integer L2²
    * (nsq(a)+nsq(b)-2·dot(a,b), each term half-away rounded) with
    * lowest-code tie-break; ADC scores are integer sums of e9 dots. Every
    * step replays bit-exactly in the DuckDB oracle.
    *
    * Plan shape: the codebook is a bounded driver collect (subspaces ×
    * codebookSize rows — the touched-partition-collect justification);
    * encode is ONE narrow codegen pass over the corpus (codebook inlined
    * as literals — no shuffle, no window); scoring broadcasts the query
    * LUTs and ranks per query. Output: qid, cid, rank, adc_e9. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, subspaces: Int, codebookSize: Int,
      dimsIn: Int = -1,
      codebooks: Option[Array[Array[Array[Float]]]] = None): DataFrame = {
    VectorExpressions.register(corpus.sparkSession)
    val d = resolveDims(corpus, vecCol, dimsIn)
    if (d < 0)
      return corpus.select(col(idCol).as("qid"), col(idCol).as("cid"),
        lit(0).as("rank"), lit(0L).as("adc_e9")).where(lit(false))
    require(d % subspaces == 0, s"dims $d not divisible by $subspaces subspaces")
    val subDim = d / subspaces

    // codebook: caller-trained (e.g. per-subspace k-means, collected —
    // codebooks are subspaces × codebookSize × subDim, inherently tiny)
    // or the training-free default: subvectors of the codebookSize
    // lowest-id vectors (the q34 quantizer convention; one bounded
    // driver action)
    val cb: Array[Array[Array[Float]]] = codebooks.getOrElse {
      val seed = corpus.orderBy(col(idCol)).limit(codebookSize)
        .select(col(vecCol)).collect()
        .map(_.getSeq[Float](0).toArray)
      require(seed.length == codebookSize,
        s"corpus has only ${seed.length} vectors for a $codebookSize-entry codebook")
      Array.tabulate(subspaces, codebookSize) { (m, c) =>
        seed(c).slice(m * subDim, (m + 1) * subDim)
      }
    }
    require(cb.length == subspaces && cb.forall(_.length == codebookSize) &&
      cb.forall(_.forall(_.length == subDim)),
      s"codebook shape ${cb.length}x${cb.headOption.map(_.length).getOrElse(0)}" +
        s"x${cb.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)} " +
        s"!= $subspaces x $codebookSize x $subDim")

    // Encode, LUT-build and ADC run as single codegen'd kernel
    // expressions (functions/PqExpressions) — a DataFrame formulation
    // needs subspaces × codebookSize dot nodes per stage, a ~256-node
    // tree whose generated method stalls the JIT. Arithmetic is the
    // dotE9 convention (per-term half-away e9 rounding); the encode
    // argmin key is cnsq - 2·dot (own-norm constant per subvector) with
    // lowest code winning ties.
    graft.functions.PqExpressions.register(corpus.sparkSession)
    val codes = corpus.repartition(col(idCol)).select(col(idCol).as("cid"),
      graft.functions.PqExpressions.pqEncode(col(vecCol), cb, subDim).as("__codes"))
    val q = queries.select(col(idCol).as("qid"),
      graft.functions.PqExpressions.pqLut(col(vecCol), cb, subDim).as("__luts"))
    val scored = codes.join(broadcast(q), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        graft.functions.PqExpressions.pqAdc(col("__codes"), col("__luts"),
          codebookSize).as("adc_e9"))
    val w = Window.partitionBy(col("qid")).orderBy(col("adc_e9").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank"), col("adc_e9"))
  }

  /** The IVF residual frame: each corpus vector's nearest-list id (the
    * [[ivfTopK]] cosine convention, ties to the lowest centroid) and its
    * float32 residual against that centroid — the training input for a
    * residual PQ codebook (run [[trainPqCodebooks]] over (cid, cres) and
    * feed the result to [[ivfPqTopK]]'s `codebooks`). Centroids are the
    * `nLists` lowest-id vectors, broadcast; one narrow pass, no corpus
    * shuffle. */
  def ivfResiduals(corpus: DataFrame, idCol: String, vecCol: String,
      nLists: Int): DataFrame = {
    VectorExpressions.register(corpus.sparkSession)
    val cents = broadcast(corpus.orderBy(col(idCol)).limit(nLists)
      .select(col(idCol).cast("long").as("centId"), col(vecCol).as("centVec"),
        VectorExpressions.normSqE9Fast(col(vecCol)).as("centN")))
    val scored = corpus.select(col(idCol).as("cid"), col(vecCol).as("cvec"),
        VectorExpressions.normSqE9Fast(col(vecCol)).as("cn"))
      .join(cents)
      .withColumn("__cs",
        cosineFromE9(VectorExpressions.dotE9Fast(col("cvec"), col("centVec")),
          col("cn"), col("centN")))
    val w = Window.partitionBy(col("cid")).orderBy(col("__cs").desc, col("centId"))
    scored.withColumn("__r", row_number().over(w)).where(col("__r") === 1)
      .select(col("cid"), col("centId"),
        zip_with(col("cvec"), col("centVec"), (x, y) => x - y).as("cres"))
  }

  /** IVF-PQ ANN (IVFADC — Jégou, Douze, Schmid, "Product Quantization for
    * Nearest Neighbor Search", TPAMI'11 §IV — public result): the
    * billion-scale index layout, combining the two levers this file
    * provides separately. Corpus vectors coarse-quantize into `nLists`
    * inverted lists (cosine, the [[ivfTopK]] convention); each vector then
    * stores only the PQ codes of its RESIDUAL (vec − centroid) —
    * `subspaces` small codes instead of d floats. A query probes its
    * `nProbe` nearest lists and scores candidates per-list by asymmetric
    * distance: the LUT is built from the query residual (q − centroid)
    * against the shared residual codebook, and
    * −‖(q−c) − recon(codes)‖² = Σ_m lut[m, code_m] − ‖q−c‖² ranks DESC.
    * Residuals are what make PQ accurate inside an IVF list (they span a
    * far smaller cell than raw vectors), and the combination is what makes
    * 100 TB ANN feasible: candidate work scales with |corpus|·nProbe/nLists
    * AND each candidate costs m table lookups over m bytes — at d=64,
    * m=8 the index shrinks 32×, so whole shards stay resident.
    *
    * Determinism (the oracle contract): coarse centroids are the `nLists`
    * lowest-id vectors; the residual codebook entries are the residuals of
    * the NEXT `codebookSize` vectors by id (ranks
    * [nLists, nLists+codebookSize) — the lowest-id vectors ARE the
    * centroids, so their own residuals are ~zero and would collapse the
    * book). Residual subtraction is float32 — the oracle's
    * double-subtract-then-cast-REAL equals fsub by the 2p+2 double-
    * rounding bound (53 ≥ 2·24+2) — and assignment/encode/ADC reuse the
    * e9-integer conventions of [[ivfTopK]]/[[pqTopK]] with
    * lowest-centId/lowest-code ties, so retrieval replays bit-exactly.
    *
    * Plan shape: centroids ride a broadcast (bounded); encode is one
    * narrow codegen pass over the assigned corpus; probes
    * (queries × nProbe LUT rows) broadcast into the candidate join keyed
    * on the list id; per-query top-k window. The corpus never collects —
    * only the nLists + codebookSize seed rows land on the driver.
    * Output: qid, cid, rank, adc_e9 (−e9·‖residual error‖², DESC). */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nLists: Int, nProbe: Int, subspaces: Int,
      codebookSize: Int, dimsIn: Int = -1,
      codebooks: Option[Array[Array[Array[Float]]]] = None): DataFrame = {
    VectorExpressions.register(corpus.sparkSession)
    graft.functions.PqExpressions.register(corpus.sparkSession)
    val d = resolveDims(corpus, vecCol, dimsIn)
    if (d < 0)
      return corpus.select(col(idCol).as("qid"), col(idCol).as("cid"),
        lit(0).as("rank"), lit(0L).as("adc_e9")).where(lit(false))
    require(d % subspaces == 0, s"dims $d not divisible by $subspaces subspaces")
    val subDim = d / subspaces

    val cents = broadcast(corpus.orderBy(col(idCol)).limit(nLists)
      .select(col(idCol).cast("long").as("centId"), col(vecCol).as("centVec"),
        VectorExpressions.normSqE9Fast(col(vecCol)).as("centN")))

    // nearest-list assignment (rank 1 for the corpus, nProbe for queries)
    // plus the float32 residual against each winning centroid
    def assignResidual(df: DataFrame, p: String, keep: Int): DataFrame = {
      val scored = df.select(col(idCol).as(s"${p}id"), col(vecCol).as(s"${p}vec"),
          VectorExpressions.normSqE9Fast(col(vecCol)).as(s"${p}n"))
        .join(cents)
        .withColumn("__cs",
          cosineFromE9(VectorExpressions.dotE9Fast(col(s"${p}vec"), col("centVec")),
            col(s"${p}n"), col("centN")))
      val w = Window.partitionBy(col(s"${p}id"))
        .orderBy(col("__cs").desc, col("centId"))
      scored.withColumn("__r", row_number().over(w)).where(col("__r") <= keep)
        .select(col(s"${p}id"), col("centId"),
          zip_with(col(s"${p}vec"), col("centVec"), (x, y) => x - y).as(s"${p}res"))
    }

    // residual codebook: caller-trained (run [[trainPqCodebooks]] over
    // [[ivfResiduals]] — the production path; residual distributions are
    // what PQ should be fit to) or the training-free default seed — one
    // bounded driver collect of nLists + codebookSize rows (the pqTopK
    // justification)
    val cb: Array[Array[Array[Float]]] = codebooks.getOrElse {
      val seedRows = assignResidual(
          corpus.orderBy(col(idCol)).limit(nLists + codebookSize), "s", 1)
        .orderBy(col("sid")).collect().drop(nLists)
      require(seedRows.length == codebookSize,
        s"corpus has only ${seedRows.length + nLists} vectors for a " +
          s"$nLists-list + $codebookSize-entry IVF-PQ seed")
      Array.tabulate(subspaces, codebookSize) { (m, c) =>
        seedRows(c).getSeq[Float](2).toArray.slice(m * subDim, (m + 1) * subDim)
      }
    }
    // strict: the ADC kernel strides its flat LUT by codebookSize, so a
    // ragged or short book (empty trained clusters) must be rejected here
    require(cb.length == subspaces && cb.forall(_.length == codebookSize) &&
      cb.forall(_.forall(_.length == subDim)),
      s"codebook shape ${cb.length}x${cb.headOption.map(_.length).getOrElse(0)}" +
        s"x${cb.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)} " +
        s"!= $subspaces x $codebookSize x $subDim")

    val codes = assignResidual(corpus.repartition(col(idCol)), "c", 1)
      .select(col("cid"), col("centId"),
        graft.functions.PqExpressions.pqEncode(col("cres"), cb, subDim).as("__codes"))
    val probes = assignResidual(queries, "q", nProbe)
      .select(col("qid"), col("centId"),
        graft.functions.PqExpressions.pqLut(col("qres"), cb, subDim).as("__lut"),
        VectorExpressions.normSqE9Fast(col("qres")).as("__qrn"))
    val scored = codes.join(broadcast(probes), Seq("centId"))
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (graft.functions.PqExpressions.pqAdc(col("__codes"), col("__lut"),
          codebookSize) - col("__qrn")).as("adc_e9"))
    val w = Window.partitionBy(col("qid")).orderBy(col("adc_e9").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank"), col("adc_e9"))
  }

  /** Sign-LSH bucketing: `planes` pseudo-random ±1 hyperplanes (component
    * signs from [[planeSigns]]), vectors keyed by the sign pattern;
    * near-dup candidates = equal buckets. Projections are e9-quantized
    * integer sums (the same codegen'd kernel as the banded path), so any
    * engine — including the DuckDB oracle — computes bit-identical
    * buckets regardless of summation order. */
  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic deduplication
    * via k-means clustering + within-cluster cosine pruning — the method
    * large LLM corpora use to drop *semantic* (not just lexical) duplicates.
    *
    *  1. Train `k` centroids with [[trainIvfCentroids]] (cosine metric —
    *     the same deterministic, SQL-replayable trainer the IVF index uses).
    *  2. Assign every vector to its nearest centroid (cosine, ties to the
    *     lowest centroid id): one broadcast join, no corpus shuffle.
    *  3. Within each cluster, drop a vector when some cluster-mate with
    *     cosine ≥ `minCosE6`/1e6 has a strictly lower (centroid-similarity,
    *     id) key. This is the paper's keep-the-farthest-from-centroid rule
    *     made a deterministic tournament: of any ε-similar group the member
    *     no rival can eliminate — the lowest (cent_sim, id) — survives.
    *
    * Scale shape: clustering is the blocker — the pair join shuffles on the
    * cluster id alone and per-cluster work is |C|², bounded by choosing
    * k ∝ N/⟨target cluster size⟩ (the paper runs ~100k clusters on LAION).
    * The corpus is never collected; only centroids ride the broadcast. For
    * k beyond broadcast range, pre-partition with [[lshBucketedPairs]]-style
    * coarse blocking or a two-level quantizer — the tournament rule is
    * unchanged. The assignment frame is persisted because it feeds both
    * pair-join sides and the output (without it the scan + assignment
    * recompute once per consumer — the q21 trap); Bench clears the cache
    * per query, library callers unpersist when done.
    *
    * Output: (id, cluster, cent_sim_e6, kept) for every corpus row. */
  def semDedup(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, minCosE6: Long): DataFrame = {
    VectorExpressions.register(corpus.sparkSession)
    val cents = broadcast(
      trainIvfCentroids(corpus, idCol, vecCol, k, iters, "cosine")
        .withColumn("centN", VectorExpressions.normSqE9Fast(col("centVec"))))
    val base = corpus.repartition(col(idCol)).select(
      col(idCol).cast("long").as("id"), col(vecCol).as("vec"),
      VectorExpressions.normSqE9Fast(col(vecCol)).as("nsq"))
    val scored = base.join(cents)
      .withColumn("__cs",
        cosineFromE9(VectorExpressions.dotE9Fast(col("vec"), col("centVec")),
          col("nsq"), col("centN")))
    val w = Window.partitionBy(col("id")).orderBy(col("__cs").desc, col("centId"))
    val assigned = scored.withColumn("__r", row_number().over(w))
      .where(col("__r") === 1)
      .select(col("id"), col("vec"), col("nsq"), col("centId").as("cluster"),
        round(col("__cs") * 1e6).cast("long").as("cent_sim_e6"))
      .persist()
    val aSide = assigned.select(col("cluster"), col("id").as("a_id"),
      col("vec").as("__va"), col("nsq").as("__na"), col("cent_sim_e6").as("a_cs"))
    val bSide = assigned.select(col("cluster"), col("id").as("b_id"),
      col("vec").as("__vb"), col("nsq").as("__nb"), col("cent_sim_e6").as("b_cs"))
    val dropped = aSide.join(bSide, Seq("cluster"))
      .where(col("b_cs") < col("a_cs") ||
        (col("b_cs") === col("a_cs") && col("b_id") < col("a_id")))
      .where(round(cosineFromE9(
          VectorExpressions.dotE9Fast(col("__va"), col("__vb")),
          col("__na"), col("__nb")) * 1e6).cast("long") >= minCosE6)
      .select(col("a_id").as("id")).distinct()
    assigned
      .join(dropped.withColumn("__dropped", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cluster"), col("cent_sim_e6"),
        col("__dropped").isNull.as("kept"))
  }

  def lshBucketedPairs(corpus: DataFrame, idCol: String, vecCol: String,
      planes: Int, dimsIn: Int = -1, maxBucket: Int = 0): DataFrame = {
    VectorExpressions.register(corpus.sparkSession)
    val dims = resolveDims(corpus, vecCol, dimsIn)
    if (dims < 0)
      return corpus.select(col(idCol).as("a_id"), col(idCol).as("b_id"),
        lit(0L).as("bucket")).where(lit(false))
    val bucketBits: Seq[Column] = (0 until planes).map { p =>
      val signVec = lit(planeSigns(p, dims).map(_.toFloat))
      val projE9 = VectorExpressions.dotE9Fast(col(vecCol), signVec)
      when(projE9 >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    val bucketed = corpus.repartition(col(idCol)).select(col(idCol),
      bucketBits.reduce((a: Column, b: Column) => a.bitwiseOR(b)).as("bucket"))
    // hot-bucket cap: a degenerate bucket (skewed corpus, weak planes) is
    // quadratic within itself; keep the maxBucket lowest ids per bucket —
    // deterministic, bounded recall loss, never a runaway cell
    val capped = if (maxBucket > 0) {
      val w = Window.partitionBy(col("bucket")).orderBy(col(idCol))
      bucketed.withColumn("__rn", row_number().over(w))
        .where(col("__rn") <= maxBucket).drop("__rn")
    } else bucketed
    val a = capped.as("a"); val b = capped.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("a_id"), col(s"b.$idCol").as("b_id"), col("a.bucket"))
  }

  /** Exact KNN-Shapley data valuation (Jia et al. 2019, "Efficient
    * Task-Specific Data Valuation for Nearest Neighbor Algorithms"):
    * each training point's EXACT Shapley value for a K-NN classifier,
    * via the closed-form rank recurrence
    *   s_(N)  = 1[y_(N) = y] / N
    *   s_(i)  = s_(i+1) + (1[y_(i)=y] − 1[y_(i+1)=y]) · min(K,i)/(K·i)
    * folded as a rank-descending prefix sum of pinned per-term e9
    * integers: term(j) = Δ_j · ((1e9·min(K,j)) div (K·j)) with
    * Δ ∈ {−1,0,1} applied AFTER the positive-operand truncating div,
    * so both engines agree signwise. A point's value is the truncating
    * mean of its per-test values (div, toward zero — negative values
    * mark HARMFUL points, the mislabeled-data signal curation acts on).
    *
    * Scale shape: the probe set broadcasts against one candidate-pool
    * scan (the q20 brute-force contract — at scale the pool is an ANN
    * shortlist, not the corpus); ranks/prefix sums run in REAL
    * per-test partitions; the final top-N rides one bounded window
    * over the pool-grain value frame. Scores are the house quantized
    * e9 cosine chain — bit-deterministic, (score desc, id) total
    * order. The probe side is guarded (≤ `maxProbes`, counted before
    * the broadcast) — a mis-called testPred must fail loudly, not
    * silently build a corpus-sized broadcast. */
  def knnShapleyE9(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, testPred: Column, k: Int, topN: Int,
      maxProbes: Long = 100000L): DataFrame = {
    require(k >= 1 && k <= 1000, s"knnShapleyE9: 1 ≤ k ≤ 1000, got $k")
    require(topN >= 1, s"knnShapleyE9: topN ≥ 1, got $topN")
    VectorExpressions.register(emb.sparkSession)
    def prep(df: DataFrame, p: String) = df.select(
      col(idCol).as(s"${p}id"), col(vecCol).as(s"${p}vec"),
      col(labelCol).as(s"${p}lab"),
      VectorExpressions.normSqE9Fast(col(vecCol)).as(s"${p}n"))
    val q = prep(emb.where(testPred), "q")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nProbes = q.count()
    require(nProbes >= 1L && nProbes <= maxProbes,
      s"knnShapleyE9: probe set has $nProbes rows — pass a bounded " +
        s"test/probe sample (≤ $maxProbes), not the corpus")
    val c = prep(emb.where(!testPred).repartition(col(idCol)), "c")
    val scored = c.join(broadcast(q), lit(true))
      .withColumn("__score",
        cosineFromE9(VectorExpressions.dotE9Fast(col("qvec"), col("cvec")),
          col("qn"), col("cn")))
      .select(col("qid"), col("qlab"), col("cid"), col("clab"),
        col("__score"))
    val wRank = Window.partitionBy(col("qid"))
      .orderBy(col("__score").desc, col("cid"))
    val wPart = Window.partitionBy(col("qid"))
    val ranked = scored
      .withColumn("r", row_number().over(wRank))
      .withColumn("nt", count(lit(1)).over(wPart))
      .withColumn("m", (col("qlab") === col("clab")).cast("long"))
    val wLead = Window.partitionBy(col("qid")).orderBy(col("r"))
    val wCum = Window.partitionBy(col("qid")).orderBy(col("r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sVals = ranked
      .withColumn("mn", lead(col("m"), 1).over(wLead))
      .withColumn("term", when(col("mn").isNull, 0L).otherwise(
        (col("m") - col("mn")) * expr(
          s"(CAST(1000000000 AS BIGINT) * least($k, r)) div (CAST($k AS BIGINT) * r)")))
      .withColumn("mlast",
        max(when(col("r") === col("nt"), col("m"))).over(wPart))
      .withColumn("s_e9",
        expr("(mlast * 1000000000) div nt") + sum(col("term")).over(wCum))
    val phi = sVals.groupBy(col("cid"), col("clab").as("label"))
      .agg(sum(col("s_e9")).as("ssum"), count(lit(1)).as("mt"))
      .select(col("cid"), col("label"),
        expr("ssum div mt").as("phi_e9"))
    phi.withColumn("rank", row_number().over(
        Window.partitionBy(Census.onePartKey(col("cid")))
          .orderBy(col("phi_e9").desc, col("cid"))).cast("long"))
      .where(col("rank") <= topN)
      .select(col("rank"), col("cid"), col("label"), col("phi_e9"))
  }

  /** Confident-learning-style label-noise audit (Northcutt, Jiang,
    * Chuang 2021, simplified to the KNN-agreement form): for every
    * point in the audit pool, the fraction of its k nearest neighbors
    * sharing its label, plus the neighbors' MAJORITY label (ties to the
    * smallest label — pinned). Grouped to the (label, suggested) census:
    * the relabeling table a cleaning pass reads — off-diagonal rows
    * with many flagged points are systematic annotation confusions,
    * not random noise.
    *
    * flagged ⟺ 2·agree < k (strict minority). Arithmetic is pure
    * integer counts off the house quantized-cosine rank (score desc,
    * id total order); agreement rates are truncating e6.
    *
    * Shape: pool×pool scoring under the q20 brute-force contract (the
    * pool is an audit SAMPLE or ANN shortlist at scale — enforced by
    * maxPool), per-point top-k via one windowed rank in real per-point
    * partitions, then two hash aggregates to the label-pair census. */
  def labelNoiseKnn(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, poolPred: Column, k: Int,
      maxPool: Long = 100000L): DataFrame = {
    require(k >= 1 && k <= 100, s"labelNoiseKnn: 1 ≤ k ≤ 100, got $k")
    VectorExpressions.register(emb.sparkSession)
    val pool = emb.where(poolPred).select(col(idCol).as("id"),
        col(vecCol).as("vec"), col(labelCol).as("lab"),
        VectorExpressions.normSqE9Fast(col(vecCol)).as("nsq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = pool.count()
    require(n >= 2 && n <= maxPool,
      s"labelNoiseKnn: pool has $n rows — pass an audit sample or ANN " +
        s"shortlist (≤ $maxPool), not the corpus")
    val q = pool.select(col("id").as("qid"), col("vec").as("qvec"),
      col("lab").as("qlab"), col("nsq").as("qn"))
    val c = pool.select(col("id").as("cid"), col("vec").as("cvec"),
      col("lab").as("clab"), col("nsq").as("cn"))
    val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("__score",
        cosineFromE9(VectorExpressions.dotE9Fast(col("qvec"), col("cvec")),
          col("qn"), col("cn")))
      .select(col("qid"), col("qlab"), col("clab"), col("__score"))
    val wR = Window.partitionBy(col("qid"))
      .orderBy(col("__score").desc, col("clab"))
    val top = scored.withColumn("r", row_number().over(wR))
      .where(col("r") <= k)
    val perPoint = top.groupBy(col("qid"), col("qlab"), col("clab"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("qid"), col("qlab"))
      .agg(sum(when(col("clab") === col("qlab"), col("cnt"))
          .otherwise(0L)).as("agree"),
        min(struct((-col("cnt")).as("nc"), col("clab").as("l")))
          .as("mj"))
      .select(col("qid"), col("qlab"), col("agree"),
        col("mj.l").as("suggested"))
    pool.unpersist()
    perPoint.groupBy(col("qlab").as("label"),
        col("suggested"))
      .agg(count(lit(1)).as("n_points"),
        sum(when(col("agree") * 2 < k, 1L).otherwise(0L)).as("n_flagged"),
        expr(s"CAST(sum(agree) * 1000000 div (count(1) * $k) AS BIGINT)")
          .as("mean_agree_e6"))
  }

  /** Retrieval-quality evaluation — nDCG@k and MRR (Järvelin &
    * Kekäläinen 2002; the RAG-corpus acceptance metrics): each probe's
    * brute-force top-k under the house quantized cosine, graded
    * relevance from the label structure, then
    *   dcg  = Σ round((2^rel − 1)·1e6 / log2(rank+1))   per-term pinned
    *   idcg = the same terms over rel re-sorted (desc, rank) — the
    *          ideal ordering of WHAT WAS RETRIEVED (nDCG@k convention)
    *   ndcg_e6 = dcg·1e6 div idcg;  rr_e6 = 1e6 div first rank with
    *   rel ≥ 2 (0 when none).
    * rel is caller-supplied as an (exact, partial) pair of predicates:
    * 2 for an exact label match, 1 for a partial/coarse match, 0 else.
    *
    * Shape: probes broadcast against one pool scan (q20 contract);
    * ranks and both DCG sums run in real per-probe partitions; output
    * is probe-grain. The probe side is guarded (≤ `maxProbes`, counted
    * before the broadcast) — a mis-called probePred must fail loudly,
    * not silently build a corpus-sized broadcast. */
  def retrievalEvalE6(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, probePred: Column, k: Int,
      partialMatch: (Column, Column) => Column,
      maxProbes: Long = 100000L): DataFrame = {
    require(k >= 1 && k <= 1000, s"retrievalEvalE6: 1 ≤ k ≤ 1000, got $k")
    VectorExpressions.register(emb.sparkSession)
    def prep(df: DataFrame, p: String) = df.select(
      col(idCol).as(s"${p}id"), col(vecCol).as(s"${p}vec"),
      col(labelCol).as(s"${p}lab"),
      VectorExpressions.normSqE9Fast(col(vecCol)).as(s"${p}n"))
    val q = prep(emb.where(probePred), "q")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nProbes = q.count()
    require(nProbes >= 1L && nProbes <= maxProbes,
      s"retrievalEvalE6: probe set has $nProbes rows — pass a bounded " +
        s"probe sample (≤ $maxProbes), not the corpus")
    val c = prep(emb.where(!probePred).repartition(col(idCol)), "c")
    val wRank = Window.partitionBy(col("qid"))
      .orderBy(col("__score").desc, col("cid"))
    val top = c.join(broadcast(q), lit(true))
      .withColumn("__score",
        cosineFromE9(VectorExpressions.dotE9Fast(col("qvec"), col("cvec")),
          col("qn"), col("cn")))
      .select(col("qid"), col("qlab"), col("cid"), col("clab"),
        col("__score"))
      .withColumn("r", row_number().over(wRank))
      .where(col("r") <= k)
      .withColumn("rel",
        when(col("clab") === col("qlab"), 2L)
          .when(partialMatch(col("qlab"), col("clab")), 1L)
          .otherwise(0L))
    val wIdeal = Window.partitionBy(col("qid"))
      .orderBy(col("rel").desc, col("r"))
    val terms = top
      .withColumn("ir", row_number().over(wIdeal))
      .withColumn("g", expr(
        "CAST(round((pow(2.0, CAST(rel AS DOUBLE)) - 1.0) * 1000000.0" +
          " / log2(CAST(r AS DOUBLE) + 1.0)) AS BIGINT)"))
      .withColumn("ig", expr(
        "CAST(round((pow(2.0, CAST(rel AS DOUBLE)) - 1.0) * 1000000.0" +
          " / log2(CAST(ir AS DOUBLE) + 1.0)) AS BIGINT)"))
    terms.groupBy(col("qid"), col("qlab").as("label"))
      .agg(sum(col("g")).as("dcg_e6"), sum(col("ig")).as("idcg_e6"),
        min(when(col("rel") >= 2L, col("r"))).as("first_hit"))
      .select(col("qid"), col("label"), col("dcg_e6"), col("idcg_e6"),
        when(col("idcg_e6") > 0L, expr(
          "CAST(CAST(dcg_e6 AS DECIMAL(38,0)) * 1000000 div idcg_e6" +
            " AS BIGINT)")).otherwise(0L).as("ndcg_e6"),
        coalesce(col("first_hit").cast("long"), lit(0L)).as("first_hit"),
        when(col("first_hit").isNotNull,
          expr("1000000 div first_hit")).otherwise(0L).as("rr_e6"))
  }

  /** Split-conformal calibration + coverage audit (Vovk's conformal
    * prediction; Angelopoulos & Bates 2023 exposition) — the
    * CLASSIFICATION companion to [[Conformal.splitConformal]]'s scalar
    * intervals: nonconformity =
    * shifted-e3 integer squared distance to the OWN-label centroid
    * (the [[silhouetteSimplifiedE6]] grid, centroids fit on the
    * CALIBRATION split only), per-label conformal quantile
    *   q̂ = the k-th smallest calibration score,
    *   k  = ⌈(n_cal+1)·(1−α)⌉ = ((n_cal+1)·(d−a) + d−1) div d
    * for α = a/d, then held-out coverage = share of test scores ≤ q̂ —
    * the finite-sample ≥ 1−α guarantee a prediction-set deployment
    * audits before shipping. k > n_cal ⇒ q̂ = ∞ (everything covered,
    * NULL q̂); labels absent from calibration have no prototype and are
    * excluded.
    *
    * Shape: one scan to (point × dim) components, calibration centroid
    * table at (label × dim) grain broadcast, own-label scores by one
    * hash aggregate; the quantile is a windowed rank in REAL per-label
    * partitions; coverage is a label-grain census. */
  def conformalCoverageE6(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, calPred: Column, alphaNum: Long,
      alphaDen: Long): DataFrame = {
    require(alphaDen > 0L && alphaNum > 0L && alphaNum < alphaDen,
      s"conformalCoverageE6: need 0 < α < 1, got $alphaNum/$alphaDen")
    val comps = emb.select(col(idCol).as("id"), col(labelCol).as("label"),
        calPred.as("cal"), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("id"), col("label"), col("cal"), col("dim"),
        round((col("x").cast("double") + lit(1.0)) * lit(1000.0))
          .cast("long").as("x_e3"))
    val cent = comps.where(col("cal"))
      .groupBy(col("label"), col("dim"))
      .agg(expr("sum(x_e3) div count(1)").as("c_e3"))
    val scores = comps.join(broadcast(cent), Seq("label", "dim"))
      .withColumn("d2",
        (col("x_e3") - col("c_e3")) * (col("x_e3") - col("c_e3")))
      .groupBy(col("id"), col("label"), col("cal"))
      .agg(sum(col("d2")).as("s"))
    val wL = Window.partitionBy(col("label")).orderBy(col("s"), col("id"))
    val kExpr = s"((n_cal + 1) * ${alphaDen - alphaNum}" +
      s" + ${alphaDen - 1}) div $alphaDen"
    val qhat = scores.where(col("cal"))
      .withColumn("r", row_number().over(wL))
      .withColumn("n_cal",
        count(lit(1)).over(Window.partitionBy(col("label"))))
      .where(col("r").cast("long") === expr(kExpr))
      .select(col("label"), col("s").as("qhat_d2"), col("n_cal"))
    scores.where(!col("cal"))
      .join(broadcast(qhat), Seq("label"), "left")
      .groupBy(col("label"))
      .agg(max(col("n_cal")).as("n_cal"),
        max(col("qhat_d2")).as("qhat_d2"),
        count(lit(1)).as("n_test"),
        sum(when(col("qhat_d2").isNull || col("s") <= col("qhat_d2"), 1L)
          .otherwise(0L)).as("n_covered"))
      .withColumn("coverage_e6", expr(
        """CAST(CAST(n_covered AS DECIMAL(38,0)) * 1000000
          | div n_test AS BIGINT)""".stripMargin))
  }
}

