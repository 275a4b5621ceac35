package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Checkpoints.TruncateOps

/** Positional inverted index + exact phrase search — the text-retrieval
  * primitive BM25 (q72) deliberately ignores: BM25's postings are
  * (term, doc, tf) bags, phrase search needs (term, doc, POSITION) and
  * adjacency joins (Zobel & Moffat 2006's survey, §6; every search
  * engine's "quoted query" path).
  *
  * Scale shape: the posting build prunes to the PHRASE'S OWN TERMS
  * before anything shuffles — a |phrase| non-equi-selective filter
  * directly on the tokenizer output, so a 100 TB corpus shuffles only
  * the few posting lists the query touches, not its whole index. The
  * L−1 adjacency joins then key on (doc, normalized start) so every
  * join is an equi-join on the same key — one shuffle partitioning
  * reused across the chain, candidate lists shrinking monotonically
  * (each join can only drop rows). No windows, no per-doc sorts.
  */
object PhraseIndex {

  /** Docs containing `phrase` as consecutive tokens (single-space
    * tokenization, 1-based positions). Output: one row per matching doc
    * — (doc_id, n_matches BIGINT, first_pos BIGINT). */
  def phraseMatches(docs: DataFrame, idCol: Column, textCol: Column,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val postings = docs
      .select(idCol.as("doc_id"),
        posexplode(split(textCol, " ")).as(Seq("pos0", "term")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
        col("term"))
      .where(col("term").isin(phrase.distinct: _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var m = postings.where(col("term") === phrase.head)
        .select(col("doc_id"), col("pos").as("start"))
      for (i <- 1 until phrase.length)
        m = m.join(postings.where(col("term") === phrase(i))
            .select(col("doc_id"), (col("pos") - i).as("start")),
          Seq("doc_id", "start"))
      m.groupBy("doc_id")
        .agg(count(lit(1)).as("n_matches"),
          min(col("start")).as("first_pos"))
        .truncate(true)
    } finally postings.unpersist(): Unit
  }
}
