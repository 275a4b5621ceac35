package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Checkpoints.TruncateOps

/** Integer-exact Lloyd k-means (Lloyd 1982, "Least squares quantization
  * in PCM" — public result) over an embedding column, the clustering pass
  * a curation pipeline runs to bucket a corpus for stratified sampling,
  * semantic sharding, or per-cluster quality review.
  *
  * Exactness discipline (the [[Graph]] fixed-point idea applied to
  * clustering): vectors quantize ONCE to e3 integer grids
  * (round(x·1000)), distances are exact BIGINT sums of squared integer
  * differences, and centroid updates use elementwise truncating integer
  * division (`sum div n`) so every round's centroids are integer vectors
  * again. A fixed iteration count is therefore bit-reproducible across
  * engines, partitionings, and summation orders — double-arithmetic
  * k-means is none of those. The e3 grid loses < 0.05% relative on unit
  * float vectors, noise far below any assignment boundary that matters;
  * [[Similarity.trainIvfCentroids]] keeps the float/e9 flavor for ANN
  * index training, this one buys a hash-gateable clustering.
  *
  * Scale shape: centroids (k·d longs) BROADCAST to every assignment
  * pass — the corpus never shuffles for assignment; the only shuffles
  * are the (cluster, pos) component-sum aggregations (map-side partial
  * sums, k·d result rows) per update. Assignment arithmetic is
  * codegen'd higher-order functions (`zip_with`/`aggregate`), no UDF.
  * Empty clusters keep their previous centroid (standard choice, made
  * explicit so the oracle can mirror it).
  */
object KMeansExact {

  private def quantized(emb: DataFrame, idCol: String, vecCol: String) =
    emb.select(col(idCol).cast("long").as("vid"),
      transform(col(vecCol), x => round(x.cast("double") * 1000).cast("long"))
        .as("iq"))

  private def sqDist(v: Column, c: Column): Column =
    aggregate(zip_with(v, c, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, d) => acc + d)

  /** `iters` full Lloyd rounds (assign → update) from deterministic
    * seeds (the k smallest ids' vectors), then a final assignment.
    * Output: (idCol, cluster, dist) with `dist` the exact integer
    * squared L2 on the e3 grid — the per-point inertia term. */
  def assign(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    require(k >= 1 && iters >= 0 && iters <= 16)
    val v = quantized(emb, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents = v.orderBy(col("vid")).limit(k)
      .select(col("vid").as("cid"), col("iq").as("c"))
    def assigned(cs: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("vid"))
        .orderBy(col("dist"), col("cid"))
      v.join(broadcast(cs))
        .withColumn("dist", sqDist(col("iq"), col("c")))
        .withColumn("__r", row_number().over(w))
        .where(col("__r") === 1)
        .select(col("vid"), col("cid"), col("dist"))
    }
    for (_ <- 0 until iters) {
      val a = assigned(cents)
      // order-independent elementwise integer mean: true partial agg on
      // (cid, pos), then one k-row array rebuild
      val upd = a.join(v, "vid")
        .select(col("cid"), posexplode(col("iq")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .groupBy(col("cid"))
        .agg(collect_list(struct(col("pos"), col("s"), col("n"))).as("ps"))
        .select(col("cid"),
          expr("transform(sort_array(ps), e -> e.s div e.n)").as("cNew"))
      // keep empty clusters' previous centroid
      cents = cents.join(upd, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("cNew"), col("c")).as("c"))
        .truncate(true)
    }
    val out = assigned(cents)
      .select(col("vid").as(idCol), col("cid").as("cluster"), col("dist"))
    out
  }
}
