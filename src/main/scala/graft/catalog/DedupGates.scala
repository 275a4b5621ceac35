package graft
package catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.agg.{ContentMetrics, Windows}
import graft.functions.{GraftFunctions, TextFunctions}
import graft.operators._
import graft.schema.{DeliveryLogLite, JoinSideEvent, ScopedEvent}
import graft.streaming.{CombineDeliveryLog, InferredJoin}
import GateSupport._
import CatalogDefs._

/** Near-duplicate mining: n-gram/minhash/simhash/ppjoin/substring/winnowing, record linkage, fuzzy matching.
  *
  * 29 gates; split from SparkEntry.scala in round 14 (pure
  * refactor — every entry verbatim, hashes pinned by the sf0.01 sweep). */
object DedupGates extends GateFamily {

  def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // D1: keyed first-wins dedupe
    "q12_dedup_first" -> ((s, dir) =>
      Dedup.keepFirst(
        ev(s, dir).select(col("user_id"), col("event_type"), col("event_id"), col("ts_ms")),
        Seq("user_id", "event_type"), Seq(col("ts_ms"), col("event_id")))),

    // Dedup/exact: hash-groupBy duplicate groups
    "q13_dedup_exact" -> ((s, dir) =>
      ev(s, dir)
        .groupBy(col("event_type"), cents(col("value")).as("value_cents"))
        .agg(min(col("event_id")).as("first_event_id"), count(lit(1)).as("n_dups"))
        .where(col("n_dups") >= 2)),

    // Dedup/fingerprint: md5 of normalized text
    "q18_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fp"))),

    // Dedup/near-dup: exact n-gram Jaccard via inverted-index join
    // (materialized once; q41/q42 consume the same pair graph)
    "q19_ngram_jaccard" -> ((s, dir) => minedDocPairs(s, dir)),

    // Dedup/MinHash-LSH: the full production near-dup path — banded
    // candidates exact-verified to Jaccard >= 3/5. Oracled against exact
    // all-pairs SQL: at r=1/b=32 a qualifying pair escapes blocking with
    // P = (1-s)^32 (~1e-13 at the threshold), so the gate detects any
    // recall miss as a row diff. Signature internals: MinHashSpec.
    "q21_minhash_pairs" -> ((s, dir) =>
      Dedup.minHashVerifiedPairs(t(s, dir, "documents"), "doc_id", "text",
        3, 32, 32, 3L, 5L)),

    // Dedup/SimHash 64-bit fingerprints. Oracled: token hashes are
    // splitMix64-finished Karp–Rabin fingerprints, replicated bit-exactly
    // in 128-bit SQL arithmetic (q22OracleSql); bit-mix quality pinned by
    // SimHashSpec/PolyHash64Spec.
    "q22_simhash" -> ((s, dir) =>
      Dedup.simHash64(t(s, dir, "documents"), "doc_id", "text")),

    // SimHash near-dup PAIRS at Hamming ≤ 3 via Manku-style pigeonhole
    // banding (4 disjoint 16-bit blocks — the web-scale setting; exact
    // by construction, bit_count verify) — the pairing stage q22's
    // fingerprints feed; the oracle is exact all-pairs over the same
    // replicated signature chain (r15: the previously missing SimHash
    // mining step).
    "q462_simhash_pairs" -> ((s, dir) =>
      Dedup.hammingPairs(
        Dedup.simHash64(t(s, dir, "documents"), "doc_id", "text"),
        "doc_id", "simhash", maxDist = 3)),

    // Dedup/embedding: banded sign-LSH blocking → exact quantized re-rank —
    // the sub-quadratic production path (all-pairs cosineNearDupPairs is the
    // tests-only recall baseline). The oracle mirrors the integer-quantized
    // blocking exactly, so the gate checks the whole shipped pipeline.
    "q27_embed_neardup" -> ((s, dir) =>
      Similarity.lshBandedNearDupPairs(
        t(s, dir, "embeddings").where(col("vec_id") < 1000),
        "vec_id", "embedding", 400000L, bands = 8, rowsPerBand = 4)),

    // Text analysis: Karp–Rabin rolling-hash fingerprints. Oracled: the
    // window hash is a plain mod-(2^61-1) polynomial, so the oracle
    // evaluates it positionally with precomputed power literals in
    // HUGEINT arithmetic (q30OracleSql); RollingHashSpec pins the kernel.
    "q30_rolling_fp" -> ((s, dir) => {
      graft.functions.RollingMinHash.register(s)
      t(s, dir, "documents").select(col("doc_id"),
        graft.functions.RollingMinHash.rollingMinHash(col("text"), 32).as("fp"))
    }),

    // Corpus prep: line-level boilerplate dedup (CCNet/RefinedWeb method)
    // — drop lines appearing in >= maxDocFreq distinct docs. The corpus
    // has no newlines, so the gate first re-lines each doc into 3-word
    // chunks deterministically (same derivation in the oracle); with the
    // tiny synthetic vocabulary many chunks recur, so the threshold
    // genuinely removes lines (no doc in this corpus loses every line,
    // but a fully-boilerplate doc would drop — CorpusOpsSpec pins that).
    "q53_line_dedup" -> ((s, dir) => {
      // tokenize ONCE per row behind a projection boundary — inlining the
      // split into the chunking lambda re-splits the text per chunk
      val tokd = t(s, dir, "documents").select(col("doc_id"),
        split(trim(col("text")), "\\s+").as("__tk"))
      val tk = col("__tk")
      val lined = tokd.select(col("doc_id"),
        array_join(
          transform(sequence(lit(0), ((size(tk) - 1) / 3).cast("int")),
            i => array_join(slice(tk, i * 3 + 1, lit(3)), " ")),
          "\n").as("text"))
      CorpusOps.lineDedup(lined, "doc_id", "text", maxDocFreq = 20L)
        .select(col("doc_id"), col("text"))
    }),

    // The composed cleaning pipeline — what a training-data user actually
    // runs: quality floor + language filter + repetition cap + near-dup
    // canonical-only, one declarative plan over the four signal families
    "q42_clean_corpus" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val signals = d.select(col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("quality"),
        TextFunctions.langIdHeuristic(col("text")).as("detected"))
      val rep = TextFunctions.repetitionStats(d, "doc_id", "text", "\\s+")
        .select(col("doc_id"), col("dup_unit_chars"), col("total_unit_chars"))
      val comp = minedDocComponents(s, dir).withColumnRenamed("node", "doc_id")
      signals
        .join(rep, Seq("doc_id"))
        .join(comp, Seq("doc_id"), "left")
        .where(col("quality") >= 72 &&
          col("detected") === "en" &&
          col("dup_unit_chars") * 10 <= col("total_unit_chars") * 7 &&
          (col("component").isNull || col("component") === col("doc_id")))
        .select(col("doc_id"), col("quality"), col("detected"),
          coalesce(col("component"), col("doc_id")).as("component"))
    }),

    // Dedup complete: near-dup pairs → connected components → canonical
    // doc per component (dedup keeps the minimum id, everything else
    // drops — the step real pipelines run after pair mining)
    "q41_neardup_components" -> ((s, dir) => {
      val comp = minedDocComponents(s, dir)
      t(s, dir, "documents").select(col("doc_id"))
        .join(comp.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("component"),
          (col("component").isNull ||
            col("component") === col("doc_id")).as("is_canonical"))
    }),

    // Corpus prep: EXACT-SUBSTRING dedup (Lee et al. 2022 §3, the
    // ExactSubstr pass paired with document-level MinHash) — duplicated
    // 8-token windows keep their lowest-(doc, pos) occurrence, every
    // other occurrence's span cuts, docs reassemble from surviving
    // tokens. The tiny synthetic vocabulary makes window collisions
    // plentiful, so the cut path is genuinely exercised.
    "q57_exact_substring" -> ((s, dir) =>
      operators.CorpusOps.exactSubstringDedup(
        t(s, dir, "documents"), "doc_id", "text", k = 8)),

    // Corpus prep: SemDeDup (Abbas et al. 2023) — SEMANTIC dedup: k-means
    // blocks the corpus, ε-similar cluster-mates resolve by the
    // keep-farthest-from-centroid tournament. Fully deterministic (cosine
    // Lloyd trainer + e9-integer scoring), so the oracle replays training,
    // assignment and the tournament end-to-end in SQL.
    "q58_sem_dedup" -> ((s, dir) =>
      operators.Similarity.semDedup(t(s, dir, "embeddings"),
        "vec_id", "embedding", k = 16, iters = 2, minCosE6 = 400000L)
        .withColumnRenamed("id", "vec_id")),

    // Cross-source duplicate census: two overlapping ingest slices,
    // md5 content fingerprints over integer/string canonical fields,
    // fingerprints seen by both sources surface with their row counts.
    "q161_source_overlap" -> ((s, dir) => {
      val e = ev(s, dir).select(col("user_id"), col("event_type"),
        cents(col("value")).as("cents"), col("ts_ms"))
      val splitLo = 1705017600000L   // 2024-01-12
      val splitHi = 1705622400000L   // 2024-01-19 — a 7-day overlap
      val tagged = e.where(col("ts_ms") < splitHi)
        .withColumn("src", lit("a"))
        .unionByName(e.where(col("ts_ms") >= splitLo)
          .withColumn("src", lit("b")))
      Dedup.crossSourceDuplicates(tagged, "src",
        Seq("user_id", "event_type", "cents", "ts_ms"))
    }),

    // Jaro–Winkler fuzzy name matching (the record-linkage scorer,
    // prefix-weighted where Levenshtein is edit-weighted): all distinct
    // part-name pairs ≥ 0.6, the codegen'd kernel pinned bit-for-bit
    // against DuckDB's jaro_winkler_similarity.
    "q176_jaro_winkler" -> ((s, dir) => {
      graft.functions.StringSimilarity.register(s)
      val names = t(s, dir, "part").select(col("p_name").as("nm")).distinct()
      names.as("a").join(names.as("b"), col("a.nm") < col("b.nm"))
        .select(col("a.nm").as("a_name"), col("b.nm").as("b_name"),
          graft.functions.StringSimilarity.jaroWinklerE6(
            col("a.nm"), col("b.nm")).as("jw_e6"))
        .where(col("jw_e6") >= 600000L)
    }),

    // Entity resolution end-to-end: JW-scored name pairs at the match
    // threshold become edges, connected components canonicalize, every
    // name maps to its cluster representative (min name) + cluster size
    // — the q176 scorer feeding the q41 component machinery.
    "q177_entity_clusters" -> ((s, dir) => {
      graft.functions.StringSimilarity.register(s)
      val names = t(s, dir, "part").select(col("p_name").as("nm")).distinct()
        .withColumn("id", xxhash64(col("nm")))
      val pairs = names.as("a").join(names.as("b"),
          col("a.nm") < col("b.nm"))
        .where(graft.functions.StringSimilarity.jaroWinklerE6(
          col("a.nm"), col("b.nm")) >= 870000L)
        .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      val comp = Dedup.connectedComponents(pairs, "a_id", "b_id")
      val labeled = names.join(comp,
          names("id") === comp("node"), "left")
        .select(col("nm"), coalesce(col("component"), col("id"))
          .as("component"))
      val canon = labeled.groupBy(col("component"))
        .agg(min(col("nm")).as("canonical"),
          count(lit(1)).as("cluster_size"))
      labeled.join(canon, "component")
        .select(col("nm").as("name"), col("canonical"),
          col("cluster_size"))
    }),

    // Dedup audit report: component-size histogram over the mined
    // near-dup graph (singletons included) — the dedup-rate data card a
    // corpus pipeline publishes; rides the materialized component map.
    "q123_dedup_audit" -> ((s, dir) => {
      val comp = minedDocComponents(s, dir).withColumnRenamed("node", "doc_id")
      t(s, dir, "documents").select(col("doc_id"))
        .join(comp, Seq("doc_id"), "left")
        .select(coalesce(col("component"), col("doc_id")).as("component"))
        .groupBy(col("component")).agg(count(lit(1)).as("size"))
        .groupBy(col("size")).agg(count(lit(1)).as("n_components"))
    }),

    // Asymmetric CONTAINMENT dedup pairs (|A∩B|/|A| ≥ 1/2 over 3-gram
    // sets): catches a short document embedded in a longer one, which
    // Jaccard's symmetric denominator structurally caps out on. Probe-side
    // prefix filtering (index side posts all tokens), integer threshold,
    // sorted-merge exact verify.
    "q116_containment" -> ((s, dir) =>
      operators.Dedup.containmentPairs(t(s, dir, "documents"),
        "doc_id", "text", 3, 1L, 2L)),

    // Fuzzy-join HOT-GRAM stress (the q55 pattern, for string blocking):
    // every synthetic name carries a corpus-wide shared prefix whose
    // grams have df=1200 — the exact shape that melts a naive gram join.
    // maxGramDf=400 drops them from blocking via the exactness-preserving
    // stop-gram tier; the oracle is the brute-force levenshtein join, so
    // any lost pair fails loudly as a row diff.
    "q95_fuzzy_stress" -> ((s, dir) => {
      val stems = array(lit("salamander"), lit("salamanders"),
        lit("velocirapt"), lit("velociraptor"))
      val rows = s.range(1200).select(col("id"),
        concat(lit("sharedhotprefix"),
          element_at(stems, (col("id") % 4 + 1).cast("int")),
          lit("-"), (col("id") % 211).cast("string")).as("name"))
      operators.FuzzyJoin.selfJoin(rows, "id", "name",
          q = 3, maxDist = 2, maxGramDf = Some(400L))
        .select(col("a_id"), col("b_id"), col("dist").cast("long").as("dist"))
    }),

    // Fuzzy (edit-distance ≤ 2) self-join over part names: q-gram count
    // blocking (Gravano et al. VLDB'99 — a NECESSARY condition, so no
    // qualifying pair is lost) + built-in levenshtein verify on the
    // survivors only. The quarter-subset keeps the DuckDB oracle's
    // all-pairs check tractable; Spark runs the blocked plan.
    "q92_fuzzy_join" -> ((s, dir) =>
      operators.FuzzyJoin.selfJoin(
        t(s, dir, "part").where(col("p_partkey") % 4 === 0)
          .select(col("p_partkey"), col("p_name")),
        "p_partkey", "p_name", q = 3, maxDist = 2)
        .select(col("a_id"), col("b_id"), col("dist").cast("long").as("dist"))),

    // Sorted-neighborhood blocking (the third ER blocking strategy next
    // to q92's gram-count filter and q176's length blocking): sort
    // within 4-char prefix blocks, compare only rank-adjacent names
    // (window 3), score survivors with the codegen JW kernel — n·w
    // candidates, no index, no cross product.
    "q213_sorted_neighborhood" -> ((s, dir) => {
      graft.functions.StringSimilarity.register(s)
      operators.FuzzyJoin.sortedNeighborhoodPairs(
          t(s, dir, "part").select(col("p_name")), "p_name",
          substring(col("p_name"), 1, 4), window = 3)
        .withColumn("jw_e6", graft.functions.StringSimilarity
          .jaroWinklerE6(col("a_val"), col("b_val")))
        .where(col("jw_e6") >= 800000L)
        .select(col("a_val").as("a_name"), col("b_val").as("b_name"),
          col("rank_gap"), col("jw_e6"))
    }),

    // Fellegi–Sunter probabilistic record linkage (1969; the Splink/
    // dedupe.io scoring core): candidate pairs from noun-token blocking
    // (pairs scale with Σ block², never n² — the blocking key IS the
    // scale decision), then fixed integer log-odds agreement weights
    // per field (first token, brand, type, size band) summed and
    // thresholded into link / possible / non_link. Bounded output:
    // per-(block, class) pair counts + score mass.
    "q266_fs_linkage" -> ((s, dir) => {
      // block = (noun, size div 8): the second key is the standard
      // multi-key blocking refinement — pairs drop ~8x while the
      // size-band agreement field (|diff| <= 2) stays decided within
      // +-1 band of the block, documented as the recall trade
      val p = t(s, dir, "part").select(col("p_partkey").as("id"),
        element_at(split(col("p_name"), " "), 1).as("tok1"),
        concat(element_at(split(col("p_name"), " "), 2), lit("#"),
          expr("p_size div 8")).as("blk"),
        col("p_brand").as("brand"), col("p_type").as("typ"),
        col("p_size").as("size"))
      val a = p.columns.foldLeft(p)((d, c) => d.withColumnRenamed(c, s"a_$c"))
      val b = p.columns.foldLeft(p)((d, c) => d.withColumnRenamed(c, s"b_$c"))
      a.join(b, col("a_blk") === col("b_blk") && col("a_id") < col("b_id"))
        .withColumn("score",
          when(col("a_tok1") === col("b_tok1"), 240L).otherwise(-80L) +
          when(col("a_brand") === col("b_brand"), 160L).otherwise(-60L) +
          when(col("a_typ") === col("b_typ"), 120L).otherwise(-40L) +
          when(abs(col("a_size") - col("b_size")) <= 2, 80L).otherwise(-30L))
        .withColumn("class", when(col("score") >= 400L, "link")
          .when(col("score") >= 100L, "possible").otherwise("non_link"))
        .groupBy(col("a_blk").as("block"), col("class"))
        .agg(count(lit(1)).as("n_pairs"), sum(col("score")).as("sum_score"))
    }),

    // Golden-record survivorship (MDM merge): two sources disagree per
    // FIELD — each field independently survives by (freshest ts, then
    // source priority) among non-null candidates, as one max(struct)
    // aggregation per field (no per-field joins, one shuffle total).
    // Sources synthesized deterministically from customer: CRM drops
    // bal for key%3=0, WEB uppercases names and drops segment for
    // key%2=0; per-source freshness varies by key.
    "q277_survivorship" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val a = c.select(col("c_custkey").as("k"),
        (lit(100L) + col("c_custkey") % 7).as("ts"), lit(2L).as("pri"),
        col("c_name").as("name"),
        when(col("c_custkey") % 3 =!= 0,
          round(col("c_acctbal") * 100).cast("long")).as("bal"),
        col("c_mktsegment").as("seg"))
      val b = c.select(col("c_custkey").as("k"),
        (lit(100L) + col("c_custkey") % 5).as("ts"), lit(1L).as("pri"),
        upper(col("c_name")).as("name"),
        round(col("c_acctbal") * 100).cast("long").as("bal"),
        when(col("c_custkey") % 2 =!= 0, col("c_mktsegment")).as("seg"))
      def survive(v: String, out: String) =
        max(when(col(v).isNotNull,
          struct(col("ts"), col("pri"), col(v).as("v"))))
          .getField("v").as(out)
      a.unionByName(b).groupBy(col("k"))
        .agg(survive("name", "name"), survive("bal", "bal_cents"),
          survive("seg", "segment"))
    }),

    // MinHash-LSH parameter planner: the (bands, rows) S-curve table
    // for a 64-hash signature at threshold 0.6 — p at threshold and
    // FP/FN grid areas, the knob-tuning readout consulted before any
    // corpus-scale dedup run. Pure constants table, no data scan.
    "q434_lsh_planner" -> ((s, dir) =>
      operators.Dedup.lshPlannerE6(s, signatureSize = 64,
        thresholdE6 = 600000L)),

    // Winnowing fingerprint sharing (Schleimer et al. 2003 — MOSS's
    // selection rule): word-3-gram Karp–Rabin+splitmix hashes, window-4
    // minima with rightmost ties via ONE struct-min aggregate (no
    // window function), then the shared-fingerprint pair report —
    // the plagiarism/near-copy candidate list.
    "q378_winnowing" -> ((s, dir) =>
      operators.Dedup.winnowingSharedPairs(
        operators.Dedup.winnowingFingerprints(t(s, dir, "documents"),
          "doc_id", "text", k = 3, w = 4), minShared = 2L)),

    // Fellegi–Sunter record linkage: customers vs a deterministically
    // perturbed copy (typo'd names, shifted balances, corrupted
    // segments), blocked on nation; data-estimated u probabilities,
    // pinned-ln integer weights, score histogram with true-pair counts
    // (id equality) showing the match/non-match separation.
    "q343_record_linkage" -> ((s, dir) => {
      // the histogram is a linear transform of the shared pattern
      // census (r15 optimization round — see GateSupport.fsPatternCensus);
      // score arithmetic (u estimation, pinned-ln weights) unchanged
      operators.RecordLinkage.fellegiSunterScoresFromCensus(
          fsPatternCensus(s, dir), q343Sides(s, dir)._2, "rid",
          Seq("blk"),
          Seq(("k_name", 900000L), ("k_bal", 850000L), ("k_seg", 800000L)))
        // floor-bucket via offset (scores go negative; div truncates
        // toward zero): weights bound |score| ≪ 1024 units
        .withColumn("bucket",
          expr("(score_e6 + 1024000000) div 1000000 - 1024"))
        .groupBy(col("bucket"))
        .agg(sum(col("__cnt")).as("n_pairs"),
          sum(col("__true") * col("__cnt")).as("n_true"))
    }),

    // Unsupervised FS parameter fitting: hard EM over the agreement-
    // pattern histogram (ONE blocked-join pass; the 2^3-row pattern
    // frame carries all rounds). Starts from a deliberately-wrong
    // uniform m = 0.8 and recovers each field's linked-agreement rate.
    "q346_linkage_em" -> ((s, dir) =>
      // EM over the shared pattern census (truth bit aggregates away);
      // identical pattern histogram, identical rounds
      operators.RecordLinkage.fellegiSunterEmMFromCensus(
        fsPatternCensus(s, dir), q343Sides(s, dir)._2, "rid",
        Seq("blk"),
        Seq(("k_name", 800000L), ("k_bal", 800000L), ("k_seg", 800000L)),
        thresholdE6 = 0L, rounds = 2)),

    // Entity consolidation: FS links above threshold → undirected match
    // graph → connected components → cluster-size census. The
    // linkage-to-golden-record step every MDM pipeline runs after
    // scoring. Components via [[operators.Dedup.connectedComponents]]:
    // a match graph is tiny-diameter near-clique clusters, so its
    // bounded-fetch union-find fast path (≤4M edges, probed) applies and
    // the distributed loop returns above the bound — the r15 probe
    // measured the alternating-star rounds here as pure per-iteration
    // job floor (2.4 s vs 0.5 s warm for an identical size census; the
    // star operator keeps its own coverage via q328/q361's gates).
    "q347_link_clusters" -> ((s, dir) => {
      val (aSide, bSide) = q343Sides(s, dir)
      val scored = operators.RecordLinkage.fellegiSunterScores(
        aSide, bSide, "rid", Seq("blk"),
        Seq(("k_name", 900000L), ("k_bal", 850000L), ("k_seg", 800000L)))
      val links = scored
        .where(col("score_e6") >= 3000000L && col("id_a") =!= col("id_b"))
        .select(col("id_a"), col("id_b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      operators.Dedup.connectedComponents(links, "id_a", "id_b")
        .groupBy(col("component")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz")).agg(count(lit(1)).as("n_clusters"))
    }),
  )

  def oracleSql: Seq[(String, String)] = Seq(

    // LSH-with-verify == exact all-pairs whenever blocking recall is
    // complete (P(miss) ~ 1e-13 at this threshold/config — see the q21
    // gate comment), so the oracle is the exact SQL at jaccard >= 3/5.
    "q21_minhash_pairs" ->
      """WITH t AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk FROM documents),
        |g AS (
        | SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS s
        | FROM t, LATERAL (SELECT unnest(generate_series(1, len(tk)-2)) AS i) ix
        | WHERE len(tk) >= 3),
        |z AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
        |      FROM g a JOIN g b ON a.s = b.s AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT a_id, b_id, inter, za.n AS na, zb.n AS nb
        |FROM p JOIN z za ON za.doc_id = a_id JOIN z zb ON zb.doc_id = b_id
        |WHERE inter * 5 >= (za.n + zb.n - inter) * 3""".stripMargin,
    "q22_simhash" -> q22OracleSql,

    // q462: exact all-pairs xor/bit_count over the q22 signature chain
    // — at document counts the n² SQL is trivial, while the Spark side
    // proves the banded plan (pigeonhole candidates ≡ all-pairs truth)
    "q462_simhash_pairs" ->
      s"""WITH sigs AS ($q22OracleSql)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         | CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS dist
         |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin,
    // same deterministic 3-word re-lining, df over distinct docs per
    // line, lines under the threshold reassembled in position order
    "q53_line_dedup" ->
      """WITH t AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk FROM documents),
        |lined AS (
        | SELECT doc_id, i AS pos,
        |  array_to_string(tk[i*3+1 : i*3+3], ' ') AS line
        | FROM t, LATERAL (SELECT unnest(generate_series(0, (len(tk)-1)//3)) AS i) ix),
        |df AS (
        | SELECT line, count(DISTINCT doc_id) AS d FROM lined
        | WHERE trim(line) <> '' GROUP BY 1),
        |kept AS (
        | SELECT l.doc_id, l.pos, l.line FROM lined l LEFT JOIN df ON df.line = l.line
        | WHERE l.line IS NOT NULL AND (df.d IS NULL OR df.d < 20))
        |SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
        |FROM kept GROUP BY doc_id""".stripMargin,
    "q30_rolling_fp" -> q30OracleSql,

    "q12_dedup_first" ->
      """SELECT user_id, event_type, event_id, ts_ms FROM (
        | SELECT user_id, event_type, event_id, epoch_ms(ts) AS ts_ms,
        |  row_number() OVER (PARTITION BY user_id, event_type
        |                     ORDER BY epoch_ms(ts), event_id) AS rn
        | FROM events) WHERE rn = 1""".stripMargin,

    "q13_dedup_exact" ->
      """SELECT event_type, CAST(round(value*100) AS BIGINT) AS value_cents,
        | min(event_id) AS first_event_id, count(*) AS n_dups
        |FROM events GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,

    "q18_fingerprint" ->
      """SELECT doc_id,
        | md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents""".stripMargin,

    "q19_ngram_jaccard" ->
      """WITH t AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk FROM documents),
        |g AS (
        | SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS s
        | FROM t, LATERAL (SELECT unnest(generate_series(1, len(tk)-2)) AS i) ix
        | WHERE len(tk) >= 3),
        |z AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
        |      FROM g a JOIN g b ON a.s = b.s AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT a_id, b_id, inter, za.n AS na, zb.n AS nb
        |FROM p JOIN z za ON za.doc_id = a_id JOIN z zb ON zb.doc_id = b_id
        |WHERE inter * 2 >= (za.n + zb.n - inter) * 1""".stripMargin,

    "q27_embed_neardup" -> q27BandedOracleSql,

    "q42_clean_corpus" ->
      s"""WITH RECURSIVE tok AS (
         | SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS tk
         | FROM documents),
         |q AS (
         | SELECT doc_id,
         |  greatest(least(
         |    CAST(floor(least(len(tk), 40) * 25 / 40) AS BIGINT)
         |    + CASE WHEN len(tk) > 0
         |       THEN CAST(floor(len(list_distinct(tk)) * 50 / len(tk)) AS BIGINT)
         |       ELSE 0 END
         |    + (25 - CASE WHEN length(text) > 0
         |       THEN least(CAST(floor((length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))) * 100 / length(text)) AS BIGINT), 25)
         |       ELSE 0 END),
         |   100), 0) AS quality
         | FROM tok),
         |h AS (SELECT doc_id, $langHitsSql FROM tok),
         |lg AS (SELECT doc_id, $langCaseSql AS detected FROM h),
         |ru AS (SELECT doc_id, unnest(tk) AS un FROM tok),
         |rf AS (SELECT doc_id, un FROM ru WHERE trim(un) <> ''),
         |rc AS (SELECT doc_id, un, count(*) AS cnt FROM rf GROUP BY 1, 2),
         |rep AS (SELECT doc_id,
         |  CAST(sum(CASE WHEN cnt > 1 THEN cnt * length(un) ELSE 0 END) AS BIGINT) AS dup_chars,
         |  CAST(sum(cnt * length(un)) AS BIGINT) AS tot_chars
         | FROM rc GROUP BY 1),
         |g AS (
         | SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS s
         | FROM tok, LATERAL (SELECT unnest(generate_series(1, len(tk)-2)) AS i) ix
         | WHERE len(tk) >= 3),
         |z AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
         |p0 AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
         |      FROM g a JOIN g b ON a.s = b.s AND a.doc_id < b.doc_id
         |      GROUP BY 1, 2),
         |p AS (
         | SELECT a_id, b_id FROM p0
         | JOIN z za ON za.doc_id = a_id JOIN z zb ON zb.doc_id = b_id
         | WHERE inter * 2 >= (za.n + zb.n - inter) * 1),
         |e AS (SELECT a_id AS a, b_id AS b FROM p
         |      UNION SELECT b_id, a_id FROM p),
         |reach(src, dst) AS (
         | SELECT a, a FROM e
         | UNION
         | SELECT r.src, e.b FROM reach r JOIN e ON e.a = r.dst),
         |comp AS (SELECT src AS doc_id, min(dst) AS component
         |         FROM reach GROUP BY src)
         |SELECT q.doc_id, q.quality, lg.detected,
         | coalesce(c.component, q.doc_id) AS component
         |FROM q JOIN lg ON lg.doc_id = q.doc_id
         |JOIN rep r ON r.doc_id = q.doc_id
         |LEFT JOIN comp c ON c.doc_id = q.doc_id
         |WHERE q.quality >= 72 AND lg.detected = 'en'
         |  AND r.dup_chars * 10 <= r.tot_chars * 7
         |  AND (c.component IS NULL OR c.component = q.doc_id)""".stripMargin,

    // Recursive-CTE oracle: transitive closure over the (symmetric) pair
    // graph, component = min reachable node; docs outside the graph are
    // their own canonical.
    "q41_neardup_components" ->
      """WITH RECURSIVE t AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk FROM documents),
        |g AS (
        | SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS s
        | FROM t, LATERAL (SELECT unnest(generate_series(1, len(tk)-2)) AS i) ix
        | WHERE len(tk) >= 3),
        |z AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
        |p0 AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
        |      FROM g a JOIN g b ON a.s = b.s AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2),
        |p AS (
        | SELECT a_id, b_id FROM p0
        | JOIN z za ON za.doc_id = a_id JOIN z zb ON zb.doc_id = b_id
        | WHERE inter * 2 >= (za.n + zb.n - inter) * 1),
        |e AS (SELECT a_id AS a, b_id AS b FROM p
        |      UNION SELECT b_id, a_id FROM p),
        |reach(src, dst) AS (
        | SELECT a, a FROM e
        | UNION
        | SELECT r.src, e.b FROM reach r JOIN e ON e.a = r.dst),
        |comp AS (SELECT src AS doc_id, min(dst) AS component
        |         FROM reach GROUP BY src)
        |SELECT d.doc_id,
        | coalesce(c.component, d.doc_id) AS component,
        | (c.component IS NULL OR c.component = d.doc_id) AS is_canonical
        |FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id""".stripMargin,

    // same window derivation, canonical = first by (doc_id, p) per window
    // text, non-canonical spans explode to per-token marks, anti-join,
    // ordered reassembly; docs losing every token drop in both engines
    "q57_exact_substring" ->
      """WITH t AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
        | FROM documents),
        |win AS (
        | SELECT doc_id, i AS p, array_to_string(tk[i+1 : i+8], ' ') AS w
        | FROM t, LATERAL (SELECT unnest(generate_series(0, len(tk)-8)) AS i) ix
        | WHERE len(tk) >= 8),
        |c AS (
        | SELECT w, doc_id AS cd, p AS cp FROM (
        |  SELECT *, row_number() OVER (PARTITION BY w ORDER BY doc_id, p) AS rn,
        |         count(*) OVER (PARTITION BY w) AS n
        |  FROM win) WHERE rn = 1 AND n > 1),
        |marks AS (
        | SELECT DISTINCT x.doc_id, x.p + j AS ti
        | FROM win x JOIN c ON c.w = x.w
        |  AND NOT (x.doc_id = c.cd AND x.p = c.cp),
        |  LATERAL (SELECT unnest(generate_series(0, 7)) AS j) g),
        |tokens AS (
        | SELECT doc_id, i-1 AS ti, tk[i] AS tok
        | FROM t, LATERAL (SELECT unnest(generate_series(1, len(tk))) AS i) ix),
        |kept AS (
        | SELECT k.doc_id, k.ti, k.tok FROM tokens k
        | LEFT JOIN marks m ON m.doc_id = k.doc_id AND m.ti = k.ti
        | WHERE m.doc_id IS NULL)
        |SELECT doc_id, string_agg(tok, ' ' ORDER BY ti) AS text
        |FROM kept GROUP BY doc_id""".stripMargin,

    "q58_sem_dedup" -> q58OracleSql,

    // q161: the same md5-over-unit-separated-fields fingerprint (chr(31)
    // = the 0x1F separator), both slices tagged, ≥2-source census.
    "q161_source_overlap" ->
      """WITH e AS (SELECT user_id, event_type,
        |  CAST(round(value * 100) AS BIGINT) AS cents,
        |  epoch_ms(ts) AS ts_ms FROM events),
        |s AS (SELECT 'a' AS src, * FROM e WHERE ts_ms < 1705622400000
        |      UNION ALL
        |      SELECT 'b' AS src, * FROM e WHERE ts_ms >= 1705017600000),
        |f AS (SELECT src, md5(concat_ws(chr(31),
        |  CAST(user_id AS VARCHAR), event_type,
        |  CAST(cents AS VARCHAR), CAST(ts_ms AS VARCHAR))) AS fp FROM s)
        |SELECT fp, CAST(count(DISTINCT src) AS BIGINT) AS n_sources,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM f GROUP BY 1 HAVING count(DISTINCT src) >= 2""".stripMargin,

    // q176: DuckDB's own jaro_winkler_similarity, e6-rounded.
    "q176_jaro_winkler" ->
      """WITH n AS (SELECT DISTINCT p_name AS nm FROM part)
        |SELECT a.nm AS a_name, b.nm AS b_name,
        |  CAST(round(jaro_winkler_similarity(a.nm, b.nm) * 1000000)
        |    AS BIGINT) AS jw_e6
        |FROM n a JOIN n b ON a.nm < b.nm
        |WHERE round(jaro_winkler_similarity(a.nm, b.nm) * 1000000)
        |  >= 600000""".stripMargin,

    // q177: JW ≥ 0.87 edges, recursive reachability, min-name canon.
    "q177_entity_clusters" ->
      """WITH RECURSIVE n AS (SELECT DISTINCT p_name AS nm FROM part),
        |p AS (SELECT a.nm AS a_nm, b.nm AS b_nm FROM n a JOIN n b
        |      ON a.nm < b.nm
        |      WHERE round(jaro_winkler_similarity(a.nm, b.nm) * 1000000)
        |        >= 870000),
        |e AS (SELECT a_nm AS a, b_nm AS b FROM p
        |      UNION SELECT b_nm, a_nm FROM p),
        |reach(src, dst) AS (
        | SELECT a, a FROM e
        | UNION
        | SELECT r.src, e.b FROM reach r JOIN e ON e.a = r.dst),
        |comp AS (SELECT src AS nm, min(dst) AS rep FROM reach GROUP BY 1),
        |lab AS (SELECT n.nm, coalesce(c.rep, n.nm) AS rep FROM n
        |        LEFT JOIN comp c ON c.nm = n.nm),
        |canon AS (SELECT rep, min(nm) AS canonical, count(*) AS cluster_size
        |          FROM lab GROUP BY 1)
        |SELECT lab.nm AS name, canonical,
        |  CAST(cluster_size AS BIGINT) AS cluster_size
        |FROM lab JOIN canon ON canon.rep = lab.rep""".stripMargin,

    // q123: q41's component replay + the size histogram (singletons via
    // the left-join coalesce).
    "q123_dedup_audit" ->
      """WITH RECURSIVE t AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk FROM documents),
        |g AS (
        | SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS s
        | FROM t, LATERAL (SELECT unnest(generate_series(1, len(tk)-2)) AS i) ix
        | WHERE len(tk) >= 3),
        |z AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
        |p0 AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
        |      FROM g a JOIN g b ON a.s = b.s AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2),
        |p AS (
        | SELECT a_id, b_id FROM p0
        | JOIN z za ON za.doc_id = a_id JOIN z zb ON zb.doc_id = b_id
        | WHERE inter * 2 >= (za.n + zb.n - inter) * 1),
        |e AS (SELECT a_id AS a, b_id AS b FROM p
        |      UNION SELECT b_id, a_id FROM p),
        |reach(src, dst) AS (
        | SELECT a, a FROM e
        | UNION
        | SELECT r.src, e.b FROM reach r JOIN e ON e.a = r.dst),
        |comp AS (SELECT src AS doc_id, min(dst) AS component
        |         FROM reach GROUP BY src),
        |sizes AS (SELECT coalesce(c.component, d.doc_id) AS component,
        |   count(*) AS size
        |  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
        |  GROUP BY 1)
        |SELECT CAST(size AS BIGINT) AS size,
        |  CAST(count(*) AS BIGINT) AS n_components
        |FROM sizes GROUP BY size""".stripMargin,

    // q116: exact all-pairs DIRECTED containment over distinct 3-gram
    // sets (the q19 replay with an asymmetric threshold on |A|): the
    // prefix/size/positional filters are exactness-preserving, so the
    // oracle never needs to see them.
    "q116_containment" ->
      """WITH t AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
        | FROM documents),
        |g AS (
        | SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS s
        | FROM t, LATERAL (SELECT unnest(generate_series(1, len(tk)-2)) AS i) ix
        | WHERE len(tk) >= 3),
        |z AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
        |      FROM g a JOIN g b ON a.s = b.s AND a.doc_id <> b.doc_id
        |      GROUP BY 1, 2)
        |SELECT a_id, b_id, CAST(inter AS BIGINT) AS inter,
        |  za.n AS na, zb.n AS nb
        |FROM p JOIN z za ON za.doc_id = a_id JOIN z zb ON zb.doc_id = b_id
        |WHERE inter * 2 >= za.n * 1""".stripMargin,

    "q95_fuzzy_stress" ->
      """WITH s AS (
        | SELECT i AS id, 'sharedhotprefix' ||
        |   CASE WHEN i % 4 = 0 THEN 'salamander'
        |        WHEN i % 4 = 1 THEN 'salamanders'
        |        WHEN i % 4 = 2 THEN 'velocirapt'
        |        ELSE 'velociraptor' END || '-' || CAST(i % 211 AS VARCHAR) AS name
        | FROM range(1200) t(i))
        |SELECT a.id AS a_id, b.id AS b_id,
        |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
        |FROM s a JOIN s b ON a.id < b.id
        |WHERE levenshtein(a.name, b.name) <= 2""".stripMargin,

    "q92_fuzzy_join" ->
      """WITH p AS (SELECT p_partkey, p_name FROM part WHERE p_partkey % 4 = 0)
        |SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM p a JOIN p b ON a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 2""".stripMargin,

    // q213: prefix-block sorted ranks, window-3 neighbors, JW ≥ 0.9.
    "q213_sorted_neighborhood" ->
      """WITH n AS (SELECT DISTINCT p_name AS nm FROM part),
        |r AS (SELECT nm, substr(nm, 1, 4) AS blk,
        |  row_number() OVER (PARTITION BY substr(nm, 1, 4)
        |    ORDER BY nm) AS rk FROM n)
        |SELECT a.nm AS a_name, b.nm AS b_name,
        | CAST(b.rk - a.rk AS BIGINT) AS rank_gap,
        | CAST(round(jaro_winkler_similarity(a.nm, b.nm) * 1000000)
        |   AS BIGINT) AS jw_e6
        |FROM r a JOIN r b ON a.blk = b.blk
        | AND b.rk - a.rk BETWEEN 1 AND 3
        |WHERE round(jaro_winkler_similarity(a.nm, b.nm) * 1000000)
        | >= 800000""".stripMargin,

    // q266: same blocking, same fixed agreement weights.
    "q266_fs_linkage" ->
      """WITH p AS (SELECT p_partkey AS id,
        |  string_split(p_name, ' ')[1] AS tok1,
        |  string_split(p_name, ' ')[2] || '#' ||
        |    CAST(p_size // 8 AS VARCHAR) AS blk,
        |  p_brand AS brand, p_type AS typ, p_size AS size FROM part),
        |pairs AS (SELECT a.blk AS block,
        |  (CASE WHEN a.tok1 = b.tok1 THEN 240 ELSE -80 END) +
        |  (CASE WHEN a.brand = b.brand THEN 160 ELSE -60 END) +
        |  (CASE WHEN a.typ = b.typ THEN 120 ELSE -40 END) +
        |  (CASE WHEN abs(a.size - b.size) <= 2 THEN 80 ELSE -30 END)
        |    AS score
        | FROM p a JOIN p b ON a.blk = b.blk AND a.id < b.id)
        |SELECT block,
        |  CASE WHEN score >= 400 THEN 'link'
        |       WHEN score >= 100 THEN 'possible'
        |       ELSE 'non_link' END AS class,
        |  count(*) AS n_pairs,
        |  CAST(sum(score) AS BIGINT) AS sum_score
        |FROM pairs GROUP BY 1, 2""".stripMargin,

    // q277: arg_max over the [ts, pri] list key, filtered to non-null —
    // field-independent survivorship, same tie discipline.
    "q277_survivorship" ->
      """WITH a AS (SELECT c_custkey AS k, 100 + c_custkey % 7 AS ts,
        |  2 AS pri, c_name AS name,
        |  CASE WHEN c_custkey % 3 <> 0
        |       THEN CAST(round(c_acctbal*100) AS BIGINT) END AS bal,
        |  c_mktsegment AS seg FROM customer),
        |b AS (SELECT c_custkey, 100 + c_custkey % 5, 1, upper(c_name),
        |  CAST(round(c_acctbal*100) AS BIGINT),
        |  CASE WHEN c_custkey % 2 <> 0 THEN c_mktsegment END
        | FROM customer),
        |u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
        |SELECT k,
        |  arg_max(name, ts * 10 + pri) FILTER (WHERE name IS NOT NULL)
        |    AS name,
        |  arg_max(bal, ts * 10 + pri) FILTER (WHERE bal IS NOT NULL)
        |    AS bal_cents,
        |  arg_max(seg, ts * 10 + pri) FILTER (WHERE seg IS NOT NULL)
        |    AS segment
        |FROM u GROUP BY 1""".stripMargin,

    "q343_record_linkage" -> q343OracleSql,

    "q346_linkage_em" -> q346OracleSql,

    // q434: divisor layouts × the 1%-step grid, per-point pinned pow
    // chain, truncating grid means.
    "q434_lsh_planner" ->
      """WITH l AS (SELECT b, 64 // b AS r
        | FROM (SELECT unnest(generate_series(1, 64)) AS b)
        | WHERE 64 % b = 0),
        |g AS (SELECT CAST(s * 10000 AS BIGINT) AS s_e6
        | FROM (SELECT unnest(generate_series(1, 99)) AS s)),
        |pc AS (SELECT b, r, s_e6,
        |  CAST(round((1.0 - pow(1.0 - pow(s_e6 / 1000000.0,
        |    CAST(r AS DOUBLE)), CAST(b AS DOUBLE))) * 1000000.0)
        |   AS BIGINT) AS p_e6
        | FROM l, g)
        |SELECT CAST(b AS INTEGER) AS b, CAST(r AS INTEGER) AS r,
        | CAST(max(CASE WHEN s_e6 = 600000 THEN p_e6 END) AS BIGINT)
        |  AS p_at_threshold_e6,
        | CAST(sum(CASE WHEN s_e6 < 600000 THEN p_e6 ELSE 0 END) // 99
        |  AS BIGINT) AS fp_area_e6,
        | CAST(sum(CASE WHEN s_e6 >= 600000 THEN 1000000 - p_e6
        |   ELSE 0 END) // 99 AS BIGINT) AS fn_area_e6,
        | CAST((sum(CASE WHEN s_e6 < 600000 THEN p_e6 ELSE 0 END)
        |   + sum(CASE WHEN s_e6 >= 600000 THEN 1000000 - p_e6
        |      ELSE 0 END)) // 99 AS BIGINT) AS total_err_e6
        |FROM pc GROUP BY 1, 2""".stripMargin,

    // q378: the full winnowing chain replayed — char-fold Karp–Rabin
    // mod 2⁶¹−1, the splitmix64 finisher in 128-bit halves, >>1 to the
    // signed-safe domain, window membership by generate_series, the
    // struct-min (h, −pos) rightmost-tie argmin, pair join.
    "q378_winnowing" -> {
      val z1 = mulMod64Sql("xor(z0, z0 >> 30)", 0xBF58476D1CE4E5B9L)
      val z2 = mulMod64Sql("xor(z1, z1 >> 27)", 0x94D049BB133111EBL)
      s"""WITH t AS (SELECT doc_id AS doc,
         |  list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
         |    x -> x <> '') AS tk
         | FROM documents),
         |g0 AS (SELECT doc, len(tk) - 2 AS ng, i AS pos,
         |  array_to_string(tk[i:i+2], ' ') AS g
         | FROM t, LATERAL (SELECT unnest(generate_series(1, len(tk)-2))
         |   AS i) ix
         | WHERE len(tk) >= 3),
         |k0 AS (SELECT doc, ng, pos,
         |  list_reduce(list_prepend(CAST(0 AS HUGEINT),
         |    list_transform(range(1, length(g)+1),
         |      i -> CAST(unicode(g[i]) AS HUGEINT))),
         |   (a,b) -> (a*257+b) % 2305843009213693951) AS h0
         | FROM g0),
         |s0 AS (SELECT doc, ng, pos,
         |  CAST((h0 + 11400714819323198485) % 18446744073709551616
         |   AS UBIGINT) AS z0 FROM k0),
         |s1 AS (SELECT doc, ng, pos, $z1 AS z1 FROM s0),
         |s2 AS (SELECT doc, ng, pos, $z2 AS z2 FROM s1),
         |f AS (SELECT doc, ng, pos,
         |  CAST(xor(z2, z2 >> 31) >> 1 AS BIGINT) AS h FROM s2),
         |m AS (SELECT doc, pos, h, ws FROM f,
         |  LATERAL (SELECT unnest(generate_series(greatest(1, pos - 3),
         |    least(pos, greatest(1, ng - 3)))) AS ws) wx),
         |mn AS (SELECT doc, ws,
         |  struct_extract(min(struct_pack(h := h, np := -pos)), 'h')
         |    AS h
         | FROM m GROUP BY 1, 2),
         |fp AS (SELECT DISTINCT doc, h FROM mn)
         |SELECT x.doc AS doc_a, y.doc AS doc_b,
         | CAST(count(*) AS BIGINT) AS shared
         |FROM fp x JOIN fp y ON x.h = y.h AND x.doc < y.doc
         |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin
    },

    "q347_link_clusters" -> q347OracleSql,
  )
}
