package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication family for event streams and LLM training-data pipelines:
  *
  *  - `keepFirst`: keyed first-wins dedupe — batch analogue of the
  *    reference's KeepFirstRow (P:common/functions/KeepFirstRow.java:14-48);
  *    streaming form is `dropDuplicatesWithinWatermark`.
  *  - `fingerprintDedup`: exact near-identical text dedup via normalized md5.
  *  - `shingles` / `ngramJaccardPairs`: exact n-gram Jaccard near-dup pairs
  *    through an inverted-index self-join (explode shingle → equi-join) —
  *    never an all-pairs cross join, so it scales with shingle collision
  *    counts, not |docs|².
  *  - `minHashLshPairs`: MinHash+banded-LSH candidate generation, the
  *    sub-quadratic path at 100 TB; candidates carry the signature-estimated
  *    Jaccard for thresholding, and can be re-ranked with exact Jaccard.
  *  - `simHash64`: 64-bit SimHash fingerprints; near-dups = small Hamming
  *    distance (use `bit_count(a ^ b)`).
  */
object Dedup {

  /** First row per key by `orderCols` (make it total for determinism). */
  def keepFirst(df: DataFrame, keys: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** Distinct word n-gram shingles per doc: (id, shingle) exploded rows. */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    // Guard: sequence(1, k) walks backwards when k < 1 (Spark auto-negative
    // step), so short docs must map to an empty shingle set explicitly.
    val grams = when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
    ).otherwise(array().cast("array<string>"))
    docs.select(col(idCol), explode(grams).as("shingle"))
  }

  /** Exact-Jaccard near-dup pairs via inverted-index join.
    * Keeps pairs with jaccard >= minJaccardNum/minJaccardDen, decided in
    * integer arithmetic (c·den >= num·(na+nb-c)) — no float thresholds.
    * Output: a_id, b_id, inter, na, nb (a_id < b_id). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minJaccardNum: Long, minJaccardDen: Long): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n)
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
    val a = sh.as("a"); val b = sh.as("b")
    val pairs = a.join(b,
        col(s"a.shingle") === col(s"b.shingle") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("a_id"), col(s"b.$idCol").as("b_id"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed(idCol, "a_id").withColumnRenamed("__n", "na"), "a_id")
      .join(sizes.withColumnRenamed(idCol, "b_id").withColumnRenamed("__n", "nb"), "b_id")
      .where(col("inter") * minJaccardDen >= (col("na") + col("nb") - col("inter")) * minJaccardNum)
      .select("a_id", "b_id", "inter", "na", "nb")
  }

  /** MinHash signatures: k per-doc minima of independently-salted hashes of
    * the doc's shingles. One shuffle (groupBy doc), k map-side min aggs. */
  def minHashSignatures(docs: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n)
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
    sh.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
  }

  /** Banded-LSH candidate pairs from MinHash signatures with the
    * signature-estimated Jaccard (fraction of matching components).
    * bands·rowsPerBand must equal numHashes. Output:
    * a_id, b_id, matching, numHashes — filter `matching/numHashes` as the
    * estimate; re-rank with `ngramJaccardPairs` semantics where exactness
    * matters. Sub-quadratic: pairs only form inside equal band buckets. */
  def minHashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sig = minHashSignatures(docs, idCol, textCol, n, numHashes)
    val bandCols = (0 until bands).map { bIdx =>
      struct(lit(bIdx).as("band"),
        xxhash64((bIdx * r until (bIdx + 1) * r).map(i => col(s"h$i")): _*).as("bucket"))
    }
    val exploded = sig.withColumn("__band", explode(array(bandCols: _*)))
    val a = exploded.as("a"); val b = exploded.as("b")
    val sigEq = (0 until numHashes)
      .map(i => when(col(s"a.h$i") === col(s"b.h$i"), 1).otherwise(0))
      .reduce(_ + _)
    a.join(b, col("a.__band") === col("b.__band") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("a_id"), col(s"b.$idCol").as("b_id"),
        sigEq.as("matching"), lit(numHashes).as("num_hashes"))
      .distinct()
  }

  /** 64-bit SimHash over whitespace tokens (term-frequency weighted). */
  def simHash64(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .withColumn("__h", xxhash64(col("tok")))
    val bitSums: Seq[Column] = (0 until 64).map { j =>
      sum(when(col("__h").bitwiseAND(shiftleft(lit(1L), j)) =!= 0, 1).otherwise(-1)).as(s"b$j")
    }
    val agg = tok.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sim: Column = (0 until 64).map { j =>
      when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce((x: Column, y: Column) => x.bitwiseOR(y))
    agg.select(col(idCol), sim.as("simhash"))
  }
}
