package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over whitespace tokens (Manning, Raghavan &
  * Schütze, IIR ch.13 — public textbook algorithm) — the cheap supervised
  * baseline a corpus pipeline trains on its own labels (language, source,
  * quality tier) to audit them: a confusion matrix over a held-out split
  * is the standard label-noise smoke test, and the same scorer doubles as
  * a fasttext-style quality filter when labels are curated/web.
  *
  * Determinism discipline (the q179 entropy rule): every log-space
  * quantity is rounded to integer e6 PER TERM — round((ln a − ln b)·1e6)
  * — and only integers are summed thereafter, so scores are independent
  * of summation order and partitioning; the argmax totalizes ties as
  * (score desc, label asc). OOV test tokens (absent from the train
  * vocabulary) are dropped — documented semantics the oracle mirrors.
  *
  * Scale shape: the model is |vocab|·|labels| rows — tiny relative to the
  * corpus — built by one (label, tok) count and a vocab × labels dense
  * left join, then BROADCAST into the single scoring join on `tok`; the
  * corpus is scanned once for training counts and once for scoring. The
  * per-(doc,label) score is one map-side-combinable integer sum. */
object NaiveBayes {

  private def toks(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String): DataFrame =
    docs.select(col(idCol).as("id"), col(labelCol).as("label"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("tok"))
      .where(length(col("tok")) > 0)

  /** Train on even-id docs, score odd-id docs, Laplace(+1) smoothing.
    * Output: (actual, predicted, n) — the held-out confusion matrix. */
  def heldOutConfusion(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String): DataFrame = {
    val all = toks(docs, idCol, textCol, labelCol)
    val train = all.where(pmod(col("id"), lit(2)) === 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val counts = train.groupBy(col("label"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = counts.select(col("tok")).distinct()
    val labelTotals = counts.groupBy(col("label"))
      .agg(sum(col("cnt")).as("tot"))
    // |V| rides the label frame (one tiny cross join), so the smoothing
    // denominator ln(tot + V) is a per-label constant column
    val vsize = vocab.agg(count(lit(1)).as("v"))
    val labels = labelTotals.crossJoin(broadcast(vsize))

    // dense (tok, label) log-likelihoods: missing (tok, label) pairs get
    // the smoothed-zero term ln(1) - ln(tot + V)
    val model = vocab.crossJoin(broadcast(labels))
      .join(counts, Seq("tok", "label"), "left")
      .select(col("tok"), col("label"),
        round((log(coalesce(col("cnt"), lit(0L)) + 1) -
          log(col("tot") + col("v"))) * 1e6).cast("long").as("term_e6"))

    // log-priors from train doc counts, same per-term e6 rounding
    val trainDocs = train.select(col("id"), col("label")).distinct()
    val nDocs = trainDocs.groupBy(col("label"))
      .agg(count(lit(1)).as("nd"))
    val total = trainDocs.agg(count(lit(1)).as("ntot"))
    val priors = nDocs.crossJoin(broadcast(total))
      .select(col("label"),
        round((log(col("nd")) - log(col("ntot"))) * 1e6).cast("long")
          .as("prior_e6"))

    val testCounts = all.where(pmod(col("id"), lit(2)) === 1)
      .groupBy(col("id"), col("label").as("actual"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val scored = testCounts
      .join(broadcast(model), "tok")
      .groupBy(col("id"), col("actual"), col("label"))
      .agg(sum(col("c") * col("term_e6")).as("ll_e6"))
      .join(broadcast(priors), "label")
      .select(col("id"), col("actual"), col("label"),
        (col("ll_e6") + col("prior_e6")).as("score_e6"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("score_e6").desc, col("label"))
    val pred = scored.withColumn("__r", row_number().over(w))
      .where(col("__r") === 1)
    train.unpersist()
    counts.unpersist()
    pred.groupBy(col("actual"), col("label").as("predicted"))
      .agg(count(lit(1)).as("n"))
  }
}
