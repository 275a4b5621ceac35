package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PolyHash64

/** Data Selection via Importance Resampling — the DSIR shape (Xie et al.,
  * "Data Selection for Language Models via Importance Resampling",
  * NeurIPS 2023): estimate hashed n-gram feature distributions on a small
  * TARGET corpus (the domain you want more of) and on the RAW pool, then
  * weight every raw document by its log importance ratio
  * Σ_tokens [ln p̂_target(h(tok)) − ln p̂_raw(h(tok))] and select the top
  * slice (or feed the weights to weighted reservoir sampling, q73).
  *
  * Features are hashed token buckets: bucket = polyHash64(token) & (B−1),
  * B a power of two — the bitmask equals unsigned-mod, so a 128-bit-integer
  * SQL oracle replays it exactly (signed pmod would diverge on negative
  * hashes). Bucket distributions use add-one smoothing over B buckets, so
  * empty buckets still carry a (nonzero) default ratio.
  *
  * Scale shape: bucket censuses are B-row aggregates (map-side combine;
  * B bounds the shuffle regardless of corpus size) and come back as ONE
  * broadcast-joined pair of B-row frames — scoring is a single narrow pass
  * over the raw token stream plus one per-document rollup exchange. Nothing
  * corpus-sized is ever collected or broadcast.
  *
  * Exactness: per-token contributions are pinned double pipelines (two
  * `ln`s on integer-derived operands, one subtraction) rounded to integer
  * micro-nats BEFORE the per-document LONG sum (the q72 rule), so totals
  * are associative and partition-order independent.
  */
object Dsir {

  /** Importance-weight every `docs` row. Output: (idCol, n_tokens,
    * w_micro, rank) — w_micro the summed log-ratio in micro-nats, rank
    * total-ordered (w desc, id asc). `buckets` must be a power of two. */
  def importanceWeights(target: DataFrame, raw: DataFrame, docs: DataFrame,
      idCol: String, textCol: String, buckets: Int): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    PolyHash64.register(docs.sparkSession)
    val b = lit(buckets.toLong)

    def tokens(df: DataFrame): DataFrame = df
      .select(col(idCol).as("id"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("tok"))
      .select(col("id"),
        PolyHash64.polyHash64(col("tok")).bitwiseAND(b - lit(1L)).as("bucket"))

    def census(df: DataFrame, cnt: String): DataFrame =
      tokens(df).groupBy(col("bucket")).agg(count(lit(1)).as(cnt))

    val ct = census(target, "ct")
    val cr = census(raw, "cr")
    // Global token totals derive from the B-row censuses (no second scan
    // of either corpus); they cross-join back as 1-row broadcasts because
    // scoring rows that miss a census bucket still need them.
    val gt = ct.agg(sum(col("ct")).as("nt_g"))
    val gr = cr.agg(sum(col("cr")).as("nr_g"))

    // Pinned double pipeline (mirrored in the q101 oracle):
    //   w_micro = round((ln((ct+1)/(Nt+B)) − ln((cr+1)/(Nr+B))) · 1e6)
    val contrib = round((
      log((coalesce(col("ct"), lit(0L)) + lit(1)).cast("double") /
        (col("nt_g") + b).cast("double")) -
      log((coalesce(col("cr"), lit(0L)) + lit(1)).cast("double") /
        (col("nr_g") + b).cast("double"))) * lit(1000000.0)).cast("long")

    val scored = tokens(docs)
      .join(broadcast(ct), Seq("bucket"), "left")
      .join(broadcast(cr), Seq("bucket"), "left")
      .crossJoin(broadcast(gt)).crossJoin(broadcast(gr))
      .select(col("id"), contrib.as("c"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("c")).as("w_micro"))

    scored.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(Census.onePartKey(col("w_micro")))
            .orderBy(col("w_micro").desc, col("id"))).cast("long"))
      .select(col("id").as(idCol), col("n_tokens"), col("w_micro"), col("rank"))
  }
}
