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
import graft.Checkpoints.TruncateOps

/** Storage/table machinery: upsert/mor, cdc, time travel, layout (z-order, rle, dict, buckets), ingest, schema evolution, profiling, data quality.
  *
  * 36 gates; split from SparkEntry.scala in round 14 (pure
  * refactor — every entry verbatim, hashes pinned by the sf0.01 sweep). */
object TableGates extends GateFamily {

  def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // K4: Hudi-style merge-on-read upsert table over orders — three
    // commits (full load; price-update + delete batch; second update that
    // resurrects some deleted keys) with a compaction between c2 and c3,
    // so the snapshot read merges a compacted base with a live delta.
    // Latest-per-(partition, key) by (ver DESC, commit DESC), deletes
    // applied; the oracle replays the same commit log as a window query
    // The commit log is built ONCE per data dir ([[GateSupport.ordersUpsertScenario]],
    // r15 — the write path was 75%+ of this gate AND q209 rebuilt the
    // same table); whichever of the two gates runs first pays the build,
    // exactly like the BT-duels family.
    "q50_upsert_snapshot" -> ((s, dir) => {
      val (ut, _, _) = ordersUpsertScenario(s, dir)
      ut.snapshot(s).select("k", "dt", "price_cents", "ver")
    }),

    // K4 incremental: the CDC pull a downstream incremental job runs —
    // current resolved record of every key touched after the checkpointed
    // commit, tombstones included. Same orders-derived scenario as q50
    // plus a delete commit; sinceCommit = the compaction horizon (the
    // furthest back Hudi semantics allow).
    "q51_upsert_incremental" -> ((s, dir) => {
      // an eighth of orders: q50 already exercises write weight; this
      // gate is about incremental-read semantics, not write volume
      val base = t(s, dir, "orders").where(col("o_orderkey") % 8 === 0)
        .select(
          col("o_orderkey").as("k"),
          date_format(col("o_orderdate"), "yyyy").as("dt"),
          round(col("o_totalprice") * 100).cast("long").as("price_cents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val c1 = base.withColumn("ver", lit(1L)).withColumn("del", lit(false))
      val c2 = base.where(col("k") % 7 === 0 || col("k") % 13 === 0)
        .withColumn("price_cents", col("price_cents") + 1000L)
        .withColumn("ver", lit(2L)).withColumn("del", col("k") % 13 === 0)
      val c3 = base.where(col("k") % 21 === 0)
        .withColumn("price_cents", col("price_cents") + 5000L)
        .withColumn("ver", lit(3L)).withColumn("del", lit(false))
      val c4 = base.where(col("k") % 35 === 0)
        .withColumn("price_cents", col("price_cents") + 7000L)
        .withColumn("ver", lit(4L)).withColumn("del", lit(true))
      val path = queryTmp("graft_upsert_q51") + "/t"
      val ut = new sinks.UpsertTable(path, Seq("k"), "ver", Seq("dt"), Some("del"))
      // back-to-back commits with no read between them write as
      // overlapped jobs; the commit log (1,2,compact,3,4) is identical
      ut.upsertAll(Seq(c1, c2))
      ut.compact(s)
      ut.upsertAll(Seq(c3, c4))
      ut.incrementalRead(s, sinceCommit = 2L, includeDeletes = true)
        .select("k", "dt", "price_cents", "ver", "del")
    }),

    // K4 consumer pattern: a CDC-MAINTAINED derived aggregate (per-year
    // count + cents over the mutable source) refreshed incrementally after
    // each commit pair — touched-group recompute only, with a compaction
    // between refreshes proving the horizon contract holds for a
    // keeping-up consumer. The gate compares the INCREMENTALLY maintained
    // table against the oracle's full recompute of the final state.
    "q54_derived_agg" -> ((s, dir) => {
      val base = t(s, dir, "orders").where(col("o_orderkey") % 8 === 0)
        .select(
          col("o_orderkey").as("k"),
          date_format(col("o_orderdate"), "yyyy").as("dt"),
          round(col("o_totalprice") * 100).cast("long").as("price_cents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val c1 = base.withColumn("ver", lit(1L)).withColumn("del", lit(false))
      val c2 = base.where(col("k") % 7 === 0 || col("k") % 13 === 0)
        .withColumn("price_cents", col("price_cents") + 1000L)
        .withColumn("ver", lit(2L)).withColumn("del", col("k") % 13 === 0)
      val c3 = base.where(col("k") % 21 === 0)
        .withColumn("price_cents", col("price_cents") + 5000L)
        .withColumn("ver", lit(3L)).withColumn("del", lit(false))
      val c4 = base.where(col("k") % 35 === 0)
        .withColumn("price_cents", col("price_cents") + 7000L)
        .withColumn("ver", lit(4L)).withColumn("del", lit(true))
      val root = queryTmp("graft_upsert_q54")
      val src = new sinks.UpsertTable(s"$root/src", Seq("k"), "ver",
        Seq("dt"), Some("del"))
      val drv = new sinks.UpsertTable(s"$root/drv", Seq("dt"), "__ver",
        Nil, Some("__dead"))
      val derived = new sinks.DerivedAggTable(src, drv, Seq("dt"),
        df => df.groupBy("dt").agg(count(lit(1)).as("n"),
          sum("price_cents").as("cents")),
        s"$root/_cdc_ckpt")
      src.upsertAll(Seq(c1, c2)) // overlapped writes, same commit log
      derived.refresh(s)
      src.compact(s) // the consumer kept up: horizon == checkpoint, legal
      src.upsertAll(Seq(c3, c4))
      derived.refresh(s)
      drv.snapshot(s).select("dt", "n", "cents")
    }),

    // Layout: z-order clustering + manifest data skipping — write events
    // z-ordered by (user_id, ts_ms), read a user×time rectangle through
    // the bucket-pruned path. The oracle filters the raw table directly,
    // so the gate proves the skipping read is EXACT regardless of layout;
    // ZOrderTableSpec pins that the pruning actually skips buckets on
    // BOTH dimensions (the property a single-key sort can't give).
    "q61_zorder_read" -> ((s, dir) => {
      // shared once-per-dir z-order build (see GateSupport.zorderEventsTable)
      val path = zorderEventsTable(s, dir)
      sinks.ZOrderTable.read(s, path,
        Map("user_id" -> (100L, 299L),
          "ts_ms" -> (1704067200000L, 1705276799999L)))
        .select(col("event_id"), col("user_id"), col("ts_ms"))
    }),

    // Layout: bucketed co-located fact⋈fact join — pay the shuffle once
    // at write time (16 buckets on the order key, per-bucket sorted),
    // then the merge join runs with NO exchange on either side (pinned in
    // BucketedTableSpec); the gate checks the write→catalog→join
    // round-trip against the plain-join oracle.
    "q74_bucketed_join" -> ((s, dir) => {
      // bucketed layout built once per data dir (r15 optimization
      // round — bucketing IS pay-the-shuffle-once; rebuilding both
      // tables per invocation contradicted the technique the gate
      // demonstrates). Table names carry the dir digest so two data
      // dirs in one JVM never collide. NOTE: only the first invocation
      // per process exercises the write→catalog half of the round-trip;
      // the tableExists guard (r16, ADVICE) re-registers if a harness
      // ever resets the session catalog between invocations (the path
      // map alone would then hand coLocatedJoin a missing table).
      val dg = dirDigest(dir)
      val (liTab, ordTab) = (s"graft_q74_li_$dg", s"graft_q74_ord_$dg")
      if (!s.catalog.tableExists(liTab) || !s.catalog.tableExists(ordTab))
        bucketedQ74Paths.remove(dir)
      bucketedQ74Paths.computeIfAbsent(dir, { d =>
        val root = s"$sharedTmp/bucketed_q74_$dg"
        sinks.BucketedTable.writeBucketed(
          t(s, d, "lineitem")
            .select("l_orderkey", "l_extendedprice", "l_discount"),
          liTab, root + "/li", 16, "l_orderkey", "l_orderkey")
        sinks.BucketedTable.writeBucketed(
          t(s, d, "orders")
            .select("o_orderkey", "o_orderdate", "o_orderpriority"),
          ordTab, root + "/ord", 16, "o_orderkey", "o_orderkey")
        root
      })
      sinks.BucketedTable.coLocatedJoin(s, liTab, ordTab,
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
          col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * 100).cast("long")).as("revenue_cents"))
    }),

    // Layout: Bloom-augmented z-order manifest — point lookups on a
    // SCATTERED key (event_id, uncorrelated with the (user_id, ts)
    // Morton order, so every bucket's min/max covers it) prune via the
    // per-bucket bloom bitsets instead of scanning all 64 directories.
    // Probes are the five smallest event_ids ≡ 7 (mod 1000) — a bounded
    // driver action the oracle replays as a subquery.
    "q76_bloom_skip" -> ((s, dir) => {
      val path = zorderEventsTable(s, dir)
      val e = ev(s, dir).select(col("event_id"), col("user_id"),
        col("ts_ms"), col("event_type"))
      val probes = e.where(col("event_id") % 1000 === 7)
        .select(col("event_id")).orderBy(col("event_id")).limit(5)
        .collect().map(_.getLong(0)).toSeq
      probes.map(id => sinks.ZOrderTable.readEq(s, path, Map.empty,
          Map("event_id" -> id)))
        .reduce(_ unionByName _)
        .select(col("event_id"), col("user_id"), col("ts_ms"),
          col("event_type"))
    }),

    // Data profiling: the pre-ingest census — per-column null/distinct
    // counts and min/max for five lineitem columns in ONE scan (a single
    // Expand feeds every countDistinct; stack unpivots the one-row agg).
    // Integral/text columns only, so min/max strings render identically
    // cross-engine.
    "q79_profile" -> ((s, dir) =>
      operators.Profile.profile(t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag",
          "l_linestatus"))),

    // Ops: keyed snapshot diff — classify inserts/deletes/updates between
    // orders and a derived second version (deletes %17, price bumps %13,
    // key-shifted inserts %50) in one full-outer shuffle; unchanged keys
    // drop before output. Null-safe struct equality does the compare.
    "q81_table_diff" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val newv = o.where(col("o_orderkey") % 17 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 13 === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")))
        .unionByName(o.where(col("o_orderkey") % 50 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 10000000L))
      operators.TableDiff.diff(o, newv, Seq("o_orderkey"))
    }),

    // Data quality: the constraint gate before publishing a snapshot —
    // null/duplicate counts in one lineitem scan, referential integrity
    // as left-anti joins against orders and part. unique:l_orderkey
    // genuinely FAILS (multi-line orders), so both verdicts exercise.
    "q80_quality_checks" -> ((s, dir) =>
      operators.Profile.checks(t(s, dir, "lineitem"),
        completeness = Seq("l_orderkey", "l_returnflag"),
        uniqueness = Seq("l_orderkey"),
        referential = Seq(
          ("l_orderkey", t(s, dir, "orders"), "o_orderkey"),
          ("l_partkey", t(s, dir, "part"), "p_partkey")))),

    // SCD Type-2 dimension build: keyed change stream → versioned
    // validity intervals, consecutive repeats collapsed, one per-key
    // sort carrying both windows.
    "q157_scd2" -> ((s, dir) =>
      TableDiff.scd2History(
        ev(s, dir).select(col("user_id"), col("event_type"),
          col("ts_ms"), col("event_id")),
        "user_id", "event_type", "ts_ms", "event_id")),

    // Content-defined chunking (LBFS/rsync boundaries on tokens): chunk
    // ids from a per-doc cumulative boundary census, ordered reassembly,
    // PolyHash64 fingerprints — identical passages fingerprint
    // identically wherever they sit, the storage-dedup primitive.
    "q132_cdc_chunks" -> ((s, dir) =>
      operators.CorpusOps.cdcChunks(t(s, dir, "documents"),
        "doc_id", "text", boundaryMod = 8)),

    // Multi-round ingestion: batch 1 dedups against history, its ACCEPTED
    // docs append to the corpus, batch 2 dedups against the grown corpus
    // — the shape a daily pipeline actually runs, pinning that today's
    // accepted near-dup source blocks tomorrow's copy of it. Rounds are
    // doc_id ≡ 0 and ≡ 3 (mod 6); history is everything else.
    "q97_ingest_rounds" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val h0 = docs.where(col("doc_id") % 3 =!= 0)
      val b1 = docs.where(col("doc_id") % 6 === 0)
      val b2 = docs.where(col("doc_id") % 6 === 3)
      val d1 = operators.IncrementalIngest.ingest(h0, b1, "doc_id", "text",
          n = 3, numHashes = 32, minJacNum = 1L, minJacDen = 2L)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val accepted1 = docs.join(
        d1.where(col("verdict") === "new").select("doc_id"), "doc_id")
      val d2 = operators.IncrementalIngest.ingest(
        h0.unionByName(accepted1), b2, "doc_id", "text",
        n = 3, numHashes = 32, minJacNum = 1L, minJacDen = 2L)
      d1.withColumn("round", lit(1L))
        .unionByName(d2.withColumn("round", lit(2L)))
    }),

    // Incremental corpus ingestion: new batch (doc_id ≡ 0 mod 3) vs
    // historical corpus (the rest) — exact tier (hash-keyed, text-
    // verified) + MinHash-banded near tier (batch probes history buckets;
    // cost scales with the batch, not history²), with greedy-by-id
    // batch-internal semantics so the full decision table is exactly
    // SQL-expressible. Same τ=1/2 trigram Jaccard as q19.
    "q91_incremental_ingest" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.IncrementalIngest.ingest(
        docs.where(col("doc_id") % 3 =!= 0),
        docs.where(col("doc_id") % 3 === 0),
        "doc_id", "text", n = 3, numHashes = 32,
        minJacNum = 1L, minJacDen = 2L)
    }),

    // Training-shard export: deterministic pmod sharding + per-shard dirs
    // + manifest — the corpus→trainer hop. The gate returns the manifest
    // (docs/tokens/bytes per shard), which the oracle recomputes from the
    // same deterministic assignment; the round-trip through the written
    // layout (one repartition shuffle, partitionBy dirs, manifest read)
    // is what's actually under test.
    "q90_shard_export" -> ((s, dir) => {
      val out = queryTmp("graft_shards_q90") + "/shards"
      sinks.ShardExport.write(
        t(s, dir, "documents"), out, 16,
        shardKey = col("doc_id"),
        orderBy = col("doc_id"),
        tokens = TextFunctions.tokenCount(col("text")),
        bytes = octet_length(col("text")))
    }),

    // Bucketed PRE-AGGREGATION layout: the aggregation twin of q74's
    // co-located join — grouping on the bucket key of a natively
    // bucketed table runs with NO exchange (scan partitioning satisfies
    // the agg requirement; pinned in PlanSpec). The recurring-rollup
    // pattern: pay the shuffle once at layout time, never per query.
    "q208_bucketed_agg" -> ((s, dir) => {
      val root = queryTmp("graft_bucketed_q208")
      sinks.BucketedTable.writeBucketed(
        t(s, dir, "lineitem")
          .select("l_suppkey", "l_quantity", "l_extendedprice"),
        "graft_q208_li", root + "/li", 16, "l_suppkey", "l_suppkey")
      s.table("graft_q208_li")
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).cast("long").as("sum_qty"),
          sum(round(col("l_extendedprice") * 100).cast("long"))
            .as("sum_cents"))
    }),

    // Time-travel diff census: the q50 upsert scenario read at two
    // commits (travel ACROSS a compaction boundary) and keyed-diffed —
    // the c3 slice shows as updates, its resurrected c2-deleted subset
    // (k % 273) as inserts; the oracle replays both resolutions and the
    // full-outer compare.
    // Shares the memoized commit log with q50 ([[GateSupport.ordersUpsertScenario]]);
    // this gate is the time-travel READ path: two as-of resolutions
    // across the compaction boundary plus the keyed full-outer diff.
    "q209_time_travel_diff" -> ((s, dir) => {
      val (ut, s2, s3) = ordersUpsertScenario(s, dir)
      operators.TableDiff.diff(
        ut.snapshotAt(s, s2).select("k", "dt", "price_cents", "ver"),
        ut.snapshotAt(s, s3).select("k", "dt", "price_cents", "ver"),
        Seq("k"))
    }),

    // Nested semi-structured round-trip: order documents with item
    // ARRAYS built deterministically (line-number order), re-parsed with
    // a nested from_json schema, array-exploded, re-aggregated — the
    // oracle computes the same census STRAIGHT from the relational rows,
    // so any loss or garbling anywhere in the build→parse→flatten chain
    // mismatches. Complements q193 (scalar corrupt-channel ingestion).
    "q205_json_nested" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").where(col("l_orderkey") % 5 === 0)
      val doc = li.groupBy(col("l_orderkey"))
        .agg(concat(lit("{\"o\":"), col("l_orderkey"),
          lit(",\"items\":["),
          array_join(transform(
            array_sort(collect_list(struct(col("l_linenumber"),
              concat(lit("{\"p\":"), col("l_partkey"), lit(",\"q\":"),
                col("l_quantity").cast("long"), lit("}")).as("s")))),
            e => e.getField("s")), ","),
          lit("]}")).as("line"))
      doc
        .withColumn("j", from_json(col("line"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "o BIGINT, items ARRAY<STRUCT<p: BIGINT, q: BIGINT>>")))
        .select(explode(col("j.items")).as("it"))
        .groupBy(col("it.p").as("p_partkey"))
        .agg(sum(col("it.q")).as("total_qty"),
          count(lit(1)).as("n_lines"))
    }),

    // Referential-integrity audit across the star schema: per FK
    // relation, child-row and orphan censuses (key-grouped child side
    // joined against parent existence — no per-relation driver action,
    // one union of four aggregates). TPC-H ships conformant, so orphan
    // columns gate at exactly zero — the point of an RI audit is proving
    // the zero.
    "q202_ref_integrity" -> ((s, dir) => {
      def rel(name: String, child: DataFrame, fk: String,
          parent: DataFrame, pk: String): DataFrame =
        child.select(col(fk).as("k")).groupBy(col("k"))
          .agg(count(lit(1)).as("cnt"))
          .join(parent.select(col(pk).as("k")).distinct()
            .withColumn("ex", lit(1)), Seq("k"), "left")
          .agg(sum(col("cnt")).as("n_child"),
            count(lit(1)).as("n_keys"),
            coalesce(sum(when(col("ex").isNull, col("cnt"))), lit(0L))
              .as("n_orphan_rows"),
            coalesce(sum(when(col("ex").isNull, 1L)), lit(0L))
              .as("n_orphan_keys"))
          .withColumn("relation", lit(name))
          .select(col("relation"), col("n_child"), col("n_keys"),
            col("n_orphan_rows"), col("n_orphan_keys"))
      rel("lineitem.orderkey", t(s, dir, "lineitem"), "l_orderkey",
          t(s, dir, "orders"), "o_orderkey")
        .unionByName(rel("lineitem.partkey", t(s, dir, "lineitem"),
          "l_partkey", t(s, dir, "part"), "p_partkey"))
        .unionByName(rel("lineitem.suppkey", t(s, dir, "lineitem"),
          "l_suppkey", t(s, dir, "supplier"), "s_suppkey"))
        .unionByName(rel("orders.custkey", t(s, dir, "orders"),
          "o_custkey", t(s, dir, "customer"), "c_custkey"))
    }),

    // Schema-on-read JSON ingestion with a corrupt-record channel: a
    // deterministic JSON-lines feed (1 in 37 truncated mid-object) parsed
    // with from_json — malformed rows surface as null structs and are
    // COUNTED, never silently dropped (the P3 reject-channel discipline
    // applied to semi-structured ingestion); per-lang valid/corrupt
    // census plus the extracted-field sum proving typed fields survive.
    "q193_json_ingest" -> ((s, dir) => {
      val feed = t(s, dir, "documents").select(col("lang"),
        when(col("doc_id") % 37 === 0,
          concat(lit("{\"id\":"), col("doc_id"), lit(",\"lang\":\"")))
          .otherwise(concat(lit("{\"id\":"), col("doc_id"),
            lit(",\"lang\":\""), col("lang"), lit("\",\"n\":"),
            col("n_chars"), lit("}"))).as("line"))
      feed
        .withColumn("j", from_json(col("line"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "id BIGINT, lang STRING, n BIGINT")))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_lines"),
          count(col("j.id")).as("n_valid"),
          sum(when(col("j.id").isNull, 1L).otherwise(0L)).as("n_corrupt"),
          sum(col("j.n")).as("sum_n"))
    }),

    // Compaction planner: (source, lang) "files" with byte stats packed
    // into ~64 KiB bins by contiguous cumulative-sum assignment over the
    // (bytes desc) order — the deterministic small-file-compaction plan
    // shape, one census + one vocab-sized window.
    "q190_compaction_bins" -> ((s, dir) => {
      val files = t(s, dir, "documents")
        .groupBy(col("source"), col("lang"))
        .agg(sum(octet_length(col("text"))).as("bytes"),
          count(lit(1)).as("n_docs"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(operators.Census.onePartKey(col("bytes")))
            .orderBy(col("bytes").desc, col("source"), col("lang"))
      files
        .withColumn("csum", sum(col("bytes"))
          .over(w.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)))
        .withColumn("bin", expr("coalesce(csum, 0L) div 65536"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("tot_bytes"),
          sum(col("n_docs")).as("tot_docs"))
    }),

    // Wide↔long round-trip: daily event counts pivoted to one column
    // per type, melted back with stack(), gated against the straight
    // relational census — any pivot/melt loss or null-garbling breaks
    // the hash. The unpivot twin of q149's pivot gate.
    "q215_melt_roundtrip" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val wide = ev(s, dir)
        .select(expr("ts_ms - ts_ms % 86400000").as("day_ms"),
          col("event_type"))
        .groupBy(col("day_ms")).pivot("event_type", types).count()
      wide.select(col("day_ms"), expr(
          "stack(5, " + types.map(t => s"'$t', `$t`").mkString(", ") +
            ") AS (event_type, n)"))
        .select(col("day_ms"), col("event_type"),
          coalesce(col("n"), lit(0L)).as("n"))
        .where(col("n") > 0)
    }),

    // Functional-dependency audit over the order⋈lineitem join: exact
    // FDs (join key → order attrs) prove 0 violating groups; the
    // deliberately-false candidates (part→supplier, supplier→flag)
    // report their violation census. The FD-verification half of
    // TANE-style profiling, one partial-distinct aggregate per
    // candidate.
    "q216_fd_audit" -> ((s, dir) => {
      val joined = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
      operators.Profile.fdAudit(joined, Seq(
        ("l_orderkey", "o_custkey"), ("l_orderkey", "o_orderdate"),
        ("l_partkey", "l_suppkey"), ("l_suppkey", "l_returnflag")))
    }),

    // Order-invariant table checksum over the canonical customer
    // projection — the O(1)-output replica comparator (q81's full diff
    // at three-scalars cost); poly_hash64 rows, XOR + SUM combine, the
    // whole fingerprint replayed bit-exactly by the oracle.
    "q255_table_checksum" -> ((s, dir) =>
      decStr(operators.TableDiff.checksum(
        t(s, dir, "customer").select(col("c_custkey"), col("c_name"),
          col("c_nationkey"), cents(col("c_acctbal")).as("bal_cents"),
          col("c_mktsegment")),
        Seq("c_custkey", "c_name", "c_nationkey", "bal_cents",
          "c_mktsegment")))),

    // RLE layout advisor: per-column run counts under two candidate
    // sort orders — distributed run counting (range-sort + one
    // mapPartitions pass + boundary-seam stitch), never a global-order
    // window. The run ratio between orders IS the sort-key decision.
    "q261_rle_layout" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val cols = Seq("l_suppkey", "l_partkey", "l_returnflag",
        "l_linestatus", "l_shipdate")
      operators.RunLength.runProfile(li,
          Seq(col("l_orderkey"), col("l_linenumber")), cols)
        .withColumn("sort_order", lit("natural"))
        .unionByName(operators.RunLength.runProfile(li,
          Seq(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
            col("l_linenumber")), cols)
          .withColumn("sort_order", lit("supplier_ship")))
        .select(col("sort_order"), col("col_name"), col("runs"),
          col("n_rows"))
    }),

    // Frequency-ranked dictionary encode (the Parquet/ORC dictionary-
    // page decision as a query): codes by (count desc, term) via the
    // distributed global row-number — no single-reducer window — and
    // per-term encoded-size contribution cnt·bitlen(code).
    "q264_dict_encode" -> ((s, dir) => {
      val counts = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("cnt"))
      operators.GlobalRank.withGlobalRowNumber(counts,
          Seq(col("cnt").desc, col("term").asc), "rn")
        .withColumn("code", col("rn") - 1)
        .withColumn("bits_total",
          col("cnt") * length(bin(col("code"))).cast("long"))
        .select(col("term"), col("cnt"), col("code"), col("bits_total"))
    }),

    // Bitemporal as-of read: every row carries BOTH a valid-time and a
    // transaction-time interval (corrections restate history — r2
    // re-asserts the old price for the pre-change validity range, r3
    // carries the new price, both born at the correction's tx time).
    // The read is two independent as-of filters (tx ≤ T2 < tx_to AND
    // valid ≤ T1 < valid_to) — "what did we BELIEVE at T2 about the
    // state AT T1" — the audit/backtest question SCD2 (q157) and time
    // travel (q209) each answer only half of. Pure scans + one
    // bounded agg; interval construction needs no window.
    "q274_bitemporal" -> ((s, dir) => {
      val INF = 9000000000000000L
      val D10 = 864000000L; val D15 = 1296000000L; val D30 = 2592000000L
      val o = t(s, dir, "orders").select(col("o_orderkey").as("k"),
        col("o_orderpriority").as("prio"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("od"),
        round(col("o_totalprice") * 100).cast("long").as("p"),
        (col("o_orderkey") % 5 === 0).as("corr"))
      val plain = o.where(!col("corr")).select(col("k"), col("prio"),
        col("od").as("vf"), lit(INF).as("vt"),
        col("od").as("tf"), lit(INF).as("tt"), col("p"))
      val r1 = o.where(col("corr")).select(col("k"), col("prio"),
        col("od").as("vf"), lit(INF).as("vt"),
        col("od").as("tf"), (col("od") + D15).as("tt"), col("p"))
      val r2 = o.where(col("corr")).select(col("k"), col("prio"),
        col("od").as("vf"), (col("od") + D10).as("vt"),
        (col("od") + D15).as("tf"), lit(INF).as("tt"), col("p"))
      val r3 = o.where(col("corr")).select(col("k"), col("prio"),
        (col("od") + D10).as("vf"), lit(INF).as("vt"),
        (col("od") + D15).as("tf"), lit(INF).as("tt"),
        expr("p * 9 div 10").as("p"))
      val tab = plain.unionByName(r1).unionByName(r2).unionByName(r3)
      val ts = o.agg(min("od").as("mn"), max("od").as("mx"))
        .select(expr("(mn + mx) div 2").as("t2"),
          expr(s"(mn + mx) div 2 - $D30").as("t1"))
      tab.crossJoin(broadcast(ts))
        .where(col("tf") <= col("t2") && col("t2") < col("tt") &&
          col("vf") <= col("t1") && col("t1") < col("vt"))
        .groupBy(col("prio"))
        .agg(count(lit(1)).as("n_orders"), sum(col("p")).as("sum_cents"))
    }),

    // Delta-encoding advisor: zigzag-delta bit mass per numeric column
    // under the q261 sort orders — DELTA_BINARY_PACKED's payload size,
    // computed in one scan with seam re-pricing; with q261 (RLE runs)
    // and q264 (dict codes) this completes the three-way encoding
    // decision a columnar writer makes per column.
    "q276_delta_layout" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey")
      operators.RunLength.deltaProfile(li,
          Seq(col("l_orderkey"), col("l_linenumber")), cols)
        .withColumn("sort_order", lit("natural"))
        .unionByName(operators.RunLength.deltaProfile(li,
          Seq(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
            col("l_linenumber")), cols)
          .withColumn("sort_order", lit("supplier_ship")))
        .select(col("sort_order"), col("col_name"), col("delta_bits"),
          col("n_rows"))
    }),

    // Foreign-key inference (schema discovery over a lake): for each
    // candidate (child.col → parent.col) pair, distinct-value
    // containment + parent uniqueness — the Spider/metanome-style
    // IND-detection core. Distinct sets first (the shuffle carries
    // |distinct|, not |rows|), then one left join per pair. The
    // l_suppkey→p_partkey row is the honest false positive pure
    // containment yields (dense integer ranges) — the verdict column
    // reports exactly what the signals support, nothing more.
    "q278_fk_inference" -> ((s, dir) => {
      def pair(label: String, child: DataFrame, cc: String,
          parent: DataFrame, pc: String) = {
        val cd = child.select(col(cc).as("v")).where(col("v").isNotNull)
          .distinct()
        val pd = parent.groupBy(col(pc).as("v"))
          .agg(count(lit(1)).as("__n"))
        val parentUnique = pd.agg(
          max(col("__n")).as("mx"), count(lit(1)).as("n_parent"))
        cd.join(pd.select(col("v"), lit(1L).as("__hit")), Seq("v"), "left")
          .agg(count(lit(1)).as("n_child_distinct"),
            sum(coalesce(col("__hit"), lit(0L))).as("n_contained"))
          .crossJoin(parentUnique)
          .select(lit(label).as("candidate"), col("n_child_distinct"),
            col("n_parent").as("n_parent_distinct"), col("n_contained"),
            expr("n_contained * 1000000 div n_child_distinct")
              .as("containment_ppm"),
            (col("mx") === 1L).as("parent_unique"),
            (col("mx") === 1L &&
              col("n_contained") === col("n_child_distinct")).as("is_fk"))
      }
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      pair("lineitem.l_orderkey->orders.o_orderkey", li, "l_orderkey",
          o, "o_orderkey")
        .unionByName(pair("lineitem.l_partkey->part.p_partkey", li,
          "l_partkey", t(s, dir, "part"), "p_partkey"))
        .unionByName(pair("orders.o_custkey->customer.c_custkey", o,
          "o_custkey", t(s, dir, "customer"), "c_custkey"))
        .unionByName(pair("lineitem.l_suppkey->part.p_partkey", li,
          "l_suppkey", t(s, dir, "part"), "p_partkey"))
        .unionByName(pair("customer.c_custkey->orders.o_orderkey",
          t(s, dir, "customer"), "c_custkey", o, "o_orderkey"))
    }),

    // Hilbert vs Z-order locality audit: index every occupied cell of
    // a 256×256 grid under both curves (pure codegen column
    // expressions, xy2d unrolled over 8 bits), then for three 2-D
    // query boxes count the CONTIGUOUS index ranges a scan would
    // touch — the fragmentation metric that decides which curve to
    // cluster a 100 TB table by (Hilbert's adjacent-positions-are-
    // adjacent-cells property shows up as fewer ranges).
    "q280_hilbert_locality" -> ((s, dir) => {
      import graft.functions.SpaceCurves
      SpaceCurves.register(s)
      val cells = t(s, dir, "customer").select(
          pmod(col("c_custkey") * 7919, lit(32L)).as("x"),
          pmod(expr("c_custkey div 32") * 104729, lit(32L)).as("y"))
        .distinct()
      val boxes = Seq(("box_a", 3, 19, 5, 11),
        ("box_b", 0, 31, 12, 16), ("box_c", 9, 25, 9, 25))
      val curves: Seq[(String, (Column, Column) => Column)] = Seq(
        ("hilbert", (x, y) => SpaceCurves.hilbertIndex(x, y, 5)),
        ("zorder", (x, y) => SpaceCurves.zOrderIndex(x, y, 5)))
      val pts = (for ((bn, x0, x1, y0, y1) <- boxes; (cn, f) <- curves)
        yield cells
          .where(col("x").between(x0, x1) && col("y").between(y0, y1))
          .select(lit(cn).as("curve"), lit(bn).as("box"),
            f(col("x"), col("y")).as("i"))).reduce(_ unionByName _)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("curve"), col("box")).orderBy(col("i"))
      pts.withColumn("p", lag(col("i"), 1).over(w))
        .groupBy(col("curve"), col("box"))
        .agg(count(lit(1)).as("n_cells"),
          sum(when(col("p").isNull || col("i") =!= col("p") + 1, 1L)
            .otherwise(0L)).as("n_ranges"))
    }),

    // Event-sourcing state rebuild: replay an op log (signup = SET,
    // purchase = INCR, error = RESET) to final per-key state WITHOUT
    // per-key ordered windows — the last reset is one max(struct)
    // aggregation, increments after it one filtered sum (struct
    // comparison gives the (ts, id) total order), stitched by a full
    // outer join. The CQRS read-model rebuild at table scale.
    "q288_event_sourcing" -> ((s, dir) => {
      val ops = ev(s, dir).where(col("value").isNotNull &&
          col("event_type").isin("signup", "purchase", "error"))
        .select(col("user_id"), col("ts_ms"), col("event_id"),
          col("event_type"), round(col("value") * 100).cast("long")
            .as("cents"))
      val resets = ops.where(col("event_type").isin("signup", "error"))
        .groupBy(col("user_id"))
        .agg(max(struct(col("ts_ms"), col("event_id"),
          col("event_type").as("rtype"), col("cents").as("rcents")))
          .as("r"))
      val incr = ops.where(col("event_type") === "purchase")
        .join(resets, Seq("user_id"), "left")
        .where(col("r").isNull ||
          struct(col("ts_ms"), col("event_id")) >
            struct(col("r.ts_ms"), col("r.event_id")))
        .groupBy(col("user_id")).agg(sum(col("cents")).as("incr"))
      resets.join(incr, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          (coalesce(when(col("r.rtype") === "signup", col("r.rcents"))
            .otherwise(0L), lit(0L)) + coalesce(col("incr"), lit(0L)))
            .as("balance_cents"))
    }),

    // Hierarchy flattening by POINTER DOUBLING: each round the
    // ancestor pointer jumps 2× as far (anc ← anc.anc, dist adds), so
    // a depth-D tree flattens in ⌈log₂D⌉ self-joins instead of D
    // chained ones — the dimension-tree (category/org) flatten that a
    // per-level loop would make 100-round-deep on real taxonomies.
    // Tree: parent(k) = k div 4 over custkeys, root 0. Output: every
    // node's (root, depth) — the oracle walks the chain recursively.
    "q290_tree_flatten" -> ((s, dir) => {
      val nodes = t(s, dir, "customer")
        .select(col("c_custkey").as("node"))
      var f = nodes.select(col("node"),
        when(col("node") === 0L, col("node"))
          .otherwise(expr("node div 4")).as("anc"),
        when(col("node") === 0L, 0L).otherwise(1L).as("dist"))
      for (_ <- 1 to 4) { // 2^4 = 16 ≥ max depth of div-4 over ≤ 2^63
        val g = f.select(col("node").as("g_node"), col("anc").as("g_anc"),
          col("dist").as("g_dist"))
        f = f.join(g, col("anc") === col("g_node"))
          .select(col("node"), col("g_anc").as("anc"),
            (col("dist") + col("g_dist")).as("dist"))
          .truncate(true) // two consumers next round: truncate
      }
      f.select(col("node"), col("anc").as("root"),
        col("dist").as("depth"))
    }),

    // Subtree rollup over q290's tree: every customer's order revenue
    // accumulates into ALL its ancestors by exploding the ancestor
    // chain (bounded by tree depth) and one re-aggregation — the
    // category-tree revenue report, no recursion at query time.
    "q291_subtree_rollup" -> ((s, dir) => {
      val rev = t(s, dir, "orders")
        .groupBy(col("o_custkey").as("node"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long"))
          .as("cents"))
      // the i−1 shift is clamped at 0: vectorized engines (DuckDB) may
      // evaluate BOTH disjuncts, and a negative shift raises there —
      // the clamped value is only read when i = 0, where the left
      // disjunct already keeps the row (found by the sf0.1 full sweep)
      rev.select(col("node"), col("cents"),
          explode(sequence(lit(0), lit(10))).as("i"))
        .where(col("i") === 0 ||
          expr("node div shiftleft(CAST(1 AS BIGINT)," +
            " 2 * greatest(i - 1, 0))") > 0L)
        .withColumn("anc",
          expr("node div shiftleft(CAST(1 AS BIGINT), 2 * i)"))
        .where(col("anc") < 64)
        .groupBy(col("anc").as("node"))
        .agg(count(lit(1)).as("n_contrib"),
          sum(col("cents")).as("subtree_cents"))
    }),

    // Source-format parity: the SAME events projection written to CSV
    // and JSON-lines, re-read through Spark's csv/json readers with
    // explicit schemas, and aggregated identically to the parquet
    // original — one result set with a format label per row proves the
    // ingestion surface (parquet/CSV/JSON) is semantics-identical.
    "q293_format_parity" -> ((s, dir) => {
      val base = ev(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("cents"),
          col("ts_ms"))
      val root = queryTmp("graft_fmt")
      base.coalesce(4).write.mode("overwrite")
        .option("header", "true").csv(s"$root/csv")
      base.coalesce(4).write.mode("overwrite").json(s"$root/json")
      val schema = base.schema
      def agg(d: DataFrame, fmt: String) =
        d.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
            sum(col("ts_ms") % 1000003L).as("ts_check"))
          .withColumn("format", lit(fmt))
      agg(base, "parquet")
        .unionByName(agg(s.read.schema(schema)
          .option("header", "true").csv(s"$root/csv"), "csv"))
        .unionByName(agg(s.read.schema(schema).json(s"$root/json"),
          "json"))
    }),

    // Schema evolution: an old batch written WITHOUT the column a new
    // batch carries, read back as ONE table via mergeSchema — the
    // add-a-column lake migration that must not rewrite history; rows
    // from the pre-schema batch surface as a labeled NULL group.
    "q294_schema_evolution" -> ((s, dir) => {
      val root = queryTmp("graft_evo")
      val o = t(s, dir, "orders")
      o.where(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .write.mode("overwrite").parquet(s"$root/b1")
      o.where(col("o_orderkey") % 2 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice") * 100).cast("long").as("cents"),
          col("o_orderpriority").as("priority"))
        .write.mode("overwrite").parquet(s"$root/b2")
      s.read.option("mergeSchema", "true")
        .parquet(s"$root/b1", s"$root/b2")
        .groupBy(coalesce(col("priority"), lit("(pre-schema)"))
          .as("priority"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
    }),

    // DSv2 aggregate pushdown (`SupportsPushDownAggregates`): the
    // grouped COUNT/SUM/MIN/MAX computes INSIDE the generator source —
    // each partition ships one partial row per group instead of 200k
    // generated rows, and Spark's final aggregate merges the partials
    // (SUM of counts/sums, MIN of mins, MAX of maxes). SynthSourceSpec
    // pins PushedAggregates/PushedGroupByExpressions in the scan plus
    // the decline paths (distinct, expression aggregates). The oracle
    // replays the generator chain in unsigned SQL over the RAW rows —
    // parity proves the pushed partials compose to the unpushed answer.
    "q326_synth_agg" -> ((s, _) => {
      s.read.format("graft-synth")
        .option("rows", 300000L).option("seed", 11L).option("partitions", 16)
        .load()
        .where(col("id") >= 60000L && col("id") < 260000L)
        .groupBy(col("day"), col("event_type"))
        .agg(count(col("id")).as("n"), sum(col("cents")).as("cents"),
          min(col("user_id")).as("min_uid"),
          max(col("user_id")).as("max_uid"))
    }),

    // DataSource V2 surface: the graft-synth deterministic generator
    // table read through Spark's connector API — id-range filters
    // narrow the GENERATED range (source-side partition pruning,
    // SynthSourceSpec pins the scan description + pruned schema), and
    // the oracle replays splitMix64 in unsigned SQL arithmetic, so the
    // source's bit-exactness is itself the gate.
    "q304_synth_source" -> ((s, _) => {
      s.read.format("graft-synth")
        .option("rows", 200000L).option("seed", 7L)
        .option("partitions", 32)
        .load()
        .where(col("id") >= 50000L && col("id") < 150000L)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
          sum(col("user_id") % 97).as("user_check"),
          sum(col("day")).as("day_sum"))
    }),
  )

  def oracleSql: Seq[(String, String)] = Seq(

    // replay the upsert commit log declaratively: union the three
    // commits with their sequence numbers, pick the latest version per
    // (partition, key) with the same (ver DESC, commit DESC) order the
    // merge-on-read resolver uses, drop delete-flagged winners
    "q50_upsert_snapshot" ->
      """WITH base AS (
        | SELECT o_orderkey AS k, strftime(o_orderdate, '%Y-%m') AS dt,
        |  CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
        | FROM orders),
        |c1 AS (SELECT k, dt, price_cents, CAST(1 AS BIGINT) AS ver, false AS del, 1 AS cseq FROM base),
        |c2 AS (SELECT k, dt, price_cents + 1000, CAST(2 AS BIGINT), k % 13 = 0, 2 FROM base
        |       WHERE k % 7 = 0 OR k % 13 = 0),
        |c3 AS (SELECT k, dt, price_cents + 5000, CAST(3 AS BIGINT), false, 3 FROM base
        |       WHERE k % 21 = 0),
        |allv AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2 UNION ALL SELECT * FROM c3),
        |r AS (SELECT *, row_number() OVER (
        |        PARTITION BY dt, k ORDER BY ver DESC, cseq DESC) AS rn
        |      FROM allv)
        |SELECT k, dt, price_cents, ver FROM r WHERE rn = 1 AND NOT del""".stripMargin,

    // changed keys = commits 3..4 (k%21 or k%35); each resolved against
    // FULL history by (ver DESC, commit DESC) with tombstones visible —
    // the same replay as q50 plus the delete commit
    "q51_upsert_incremental" ->
      """WITH base AS (
        | SELECT o_orderkey AS k, strftime(o_orderdate, '%Y') AS dt,
        |  CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
        | FROM orders WHERE o_orderkey % 8 = 0),
        |c1 AS (SELECT k, dt, price_cents, CAST(1 AS BIGINT) AS ver, false AS del, 1 AS cseq FROM base),
        |c2 AS (SELECT k, dt, price_cents + 1000, CAST(2 AS BIGINT), k % 13 = 0, 2 FROM base
        |       WHERE k % 7 = 0 OR k % 13 = 0),
        |c3 AS (SELECT k, dt, price_cents + 5000, CAST(3 AS BIGINT), false, 3 FROM base
        |       WHERE k % 21 = 0),
        |c4 AS (SELECT k, dt, price_cents + 7000, CAST(4 AS BIGINT), true, 4 FROM base
        |       WHERE k % 35 = 0),
        |allv AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2
        |         UNION ALL SELECT * FROM c3 UNION ALL SELECT * FROM c4),
        |r AS (SELECT *, row_number() OVER (
        |        PARTITION BY dt, k ORDER BY ver DESC, cseq DESC) AS rn
        |      FROM allv)
        |SELECT k, dt, price_cents, ver, del FROM r
        |WHERE rn = 1 AND (k % 21 = 0 OR k % 35 = 0)""".stripMargin,

    // full recompute of the FINAL state — the incrementally-maintained
    // derived table must land on exactly this
    "q54_derived_agg" ->
      """WITH base AS (
        | SELECT o_orderkey AS k, strftime(o_orderdate, '%Y') AS dt,
        |  CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
        | FROM orders WHERE o_orderkey % 8 = 0),
        |c1 AS (SELECT k, dt, price_cents, CAST(1 AS BIGINT) AS ver, false AS del, 1 AS cseq FROM base),
        |c2 AS (SELECT k, dt, price_cents + 1000, CAST(2 AS BIGINT), k % 13 = 0, 2 FROM base
        |       WHERE k % 7 = 0 OR k % 13 = 0),
        |c3 AS (SELECT k, dt, price_cents + 5000, CAST(3 AS BIGINT), false, 3 FROM base
        |       WHERE k % 21 = 0),
        |c4 AS (SELECT k, dt, price_cents + 7000, CAST(4 AS BIGINT), true, 4 FROM base
        |       WHERE k % 35 = 0),
        |allv AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2
        |         UNION ALL SELECT * FROM c3 UNION ALL SELECT * FROM c4),
        |r AS (SELECT *, row_number() OVER (
        |        PARTITION BY dt, k ORDER BY ver DESC, cseq DESC) AS rn
        |      FROM allv)
        |SELECT dt, count(*) AS n, CAST(sum(price_cents) AS BIGINT) AS cents
        |FROM r WHERE rn = 1 AND NOT del GROUP BY dt""".stripMargin,

    // layout-independent truth: the raw filter over the source table
    "q61_zorder_read" ->
      """SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events
        |WHERE user_id BETWEEN 100 AND 299
        |  AND epoch_ms(ts) BETWEEN 1704067200000 AND 1705276799999""".stripMargin,

    // q157: IS DISTINCT FROM change filter, the same one-sort windows.
    "q157_scd2" ->
      """WITH e AS (SELECT user_id AS k, event_type AS value,
        |  epoch_ms(ts) AS ts, event_id AS tie FROM events),
        |f AS (SELECT *, lag(value) OVER (PARTITION BY k ORDER BY ts, tie)
        |  AS prev FROM e),
        |v AS (SELECT k, value, ts, tie FROM f
        |      WHERE prev IS DISTINCT FROM value),
        |o AS (SELECT k, value, ts AS valid_from,
        |  coalesce(lead(ts) OVER w2, -1) AS valid_to,
        |  row_number() OVER w2 AS version
        | FROM v WINDOW w2 AS (PARTITION BY k ORDER BY ts, tie))
        |SELECT k AS user_id, value, valid_from, valid_to,
        |  CAST(version AS BIGINT) AS version,
        |  valid_to = -1 AS is_current
        |FROM o""".stripMargin,

    // q132: the full PolyHash64 chain (KR fold + splitMix64) replayed
    // per token for boundaries and per chunk for fingerprints.
    "q132_cdc_chunks" -> q132OracleSql,

    // Two sequential q91 rounds: round 2's history is h0 plus round 1's
    // accepted docs, so the oracle replays the grown-corpus semantics.
    "q97_ingest_rounds" ->
      """WITH docs AS (SELECT doc_id, trim(text) AS t FROM documents),
        |tb AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk FROM documents),
        |g AS (
        | SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS s
        | FROM tb, LATERAL (SELECT unnest(generate_series(1, len(tk)-2)) AS i) ix
        | WHERE len(tk) >= 3),
        |z AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
        |jac AS (SELECT x.doc_id AS x, y.doc_id AS y, count(*) AS inter
        |        FROM g x JOIN g y ON x.s = y.s AND x.doc_id <> y.doc_id
        |        GROUP BY 1, 2),
        |near AS (SELECT jac.x, jac.y FROM jac
        |         JOIN z zx ON zx.doc_id = jac.x JOIN z zy ON zy.doc_id = jac.y
        |         WHERE inter * 2 >= (zx.n + zy.n - inter) * 1),
        |h0 AS (SELECT * FROM docs WHERE doc_id % 3 <> 0),
        |b1 AS (SELECT * FROM docs WHERE doc_id % 6 = 0),
        |b2 AS (SELECT * FROM docs WHERE doc_id % 6 = 3),
        |eh1 AS (SELECT b.doc_id, MIN(h.doc_id) AS r FROM b1 b JOIN h0 h ON b.t = h.t GROUP BY 1),
        |eb1 AS (SELECT y.doc_id, MIN(x.doc_id) AS r FROM b1 y
        |        JOIN b1 x ON x.t = y.t AND x.doc_id < y.doc_id GROUP BY 1),
        |nh1 AS (SELECT near.y AS doc_id, MIN(near.x) AS r FROM near
        |        JOIN h0 ON h0.doc_id = near.x JOIN b1 ON b1.doc_id = near.y GROUP BY 1),
        |nb1 AS (SELECT near.y AS doc_id, MIN(near.x) AS r FROM near
        |        JOIN b1 p ON p.doc_id = near.x JOIN b1 w ON w.doc_id = near.y
        |        WHERE near.x < near.y GROUP BY 1),
        |v1 AS (
        | SELECT b1.doc_id,
        |  CASE WHEN eh1.r IS NOT NULL THEN 'dup_exact_history'
        |       WHEN eb1.r IS NOT NULL THEN 'dup_exact_batch'
        |       WHEN nh1.r IS NOT NULL THEN 'dup_near_history'
        |       WHEN nb1.r IS NOT NULL THEN 'dup_near_batch'
        |       ELSE 'new' END AS verdict,
        |  CAST(COALESCE(eh1.r, eb1.r, nh1.r, nb1.r) AS BIGINT) AS ref_id
        | FROM b1
        | LEFT JOIN eh1 ON eh1.doc_id = b1.doc_id
        | LEFT JOIN eb1 ON eb1.doc_id = b1.doc_id
        | LEFT JOIN nh1 ON nh1.doc_id = b1.doc_id
        | LEFT JOIN nb1 ON nb1.doc_id = b1.doc_id),
        |h1 AS (SELECT * FROM h0 UNION ALL
        |       SELECT docs.* FROM docs JOIN v1 ON v1.doc_id = docs.doc_id
        |       WHERE v1.verdict = 'new'),
        |eh2 AS (SELECT b.doc_id, MIN(h.doc_id) AS r FROM b2 b JOIN h1 h ON b.t = h.t GROUP BY 1),
        |eb2 AS (SELECT y.doc_id, MIN(x.doc_id) AS r FROM b2 y
        |        JOIN b2 x ON x.t = y.t AND x.doc_id < y.doc_id GROUP BY 1),
        |nh2 AS (SELECT near.y AS doc_id, MIN(near.x) AS r FROM near
        |        JOIN h1 ON h1.doc_id = near.x JOIN b2 ON b2.doc_id = near.y GROUP BY 1),
        |nb2 AS (SELECT near.y AS doc_id, MIN(near.x) AS r FROM near
        |        JOIN b2 p ON p.doc_id = near.x JOIN b2 w ON w.doc_id = near.y
        |        WHERE near.x < near.y GROUP BY 1),
        |v2 AS (
        | SELECT b2.doc_id,
        |  CASE WHEN eh2.r IS NOT NULL THEN 'dup_exact_history'
        |       WHEN eb2.r IS NOT NULL THEN 'dup_exact_batch'
        |       WHEN nh2.r IS NOT NULL THEN 'dup_near_history'
        |       WHEN nb2.r IS NOT NULL THEN 'dup_near_batch'
        |       ELSE 'new' END AS verdict,
        |  CAST(COALESCE(eh2.r, eb2.r, nh2.r, nb2.r) AS BIGINT) AS ref_id
        | FROM b2
        | LEFT JOIN eh2 ON eh2.doc_id = b2.doc_id
        | LEFT JOIN eb2 ON eb2.doc_id = b2.doc_id
        | LEFT JOIN nh2 ON nh2.doc_id = b2.doc_id
        | LEFT JOIN nb2 ON nb2.doc_id = b2.doc_id)
        |SELECT doc_id, verdict, ref_id, CAST(1 AS BIGINT) AS round FROM v1
        |UNION ALL
        |SELECT doc_id, verdict, ref_id, CAST(2 AS BIGINT) AS round FROM v2""".stripMargin,

    // Decision-table replay: the greedy-by-id + precedence semantics are
    // deliberately non-transitive so this stays a plain SQL program (the
    // q19 trigram machinery + equality tiers + CASE precedence).
    "q91_incremental_ingest" ->
      """WITH h AS (SELECT doc_id, trim(text) AS t FROM documents WHERE doc_id % 3 <> 0),
        |b AS (SELECT doc_id, trim(text) AS t FROM documents WHERE doc_id % 3 = 0),
        |tb AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk FROM documents),
        |g AS (
        | SELECT DISTINCT doc_id, array_to_string(tk[i:i+2], ' ') AS s
        | FROM tb, LATERAL (SELECT unnest(generate_series(1, len(tk)-2)) AS i) ix
        | WHERE len(tk) >= 3),
        |z AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
        |jac AS (SELECT x.doc_id AS x, y.doc_id AS y, count(*) AS inter
        |        FROM g x JOIN g y ON x.s = y.s AND x.doc_id <> y.doc_id
        |        GROUP BY 1, 2),
        |near AS (SELECT jac.x, jac.y FROM jac
        |         JOIN z zx ON zx.doc_id = jac.x JOIN z zy ON zy.doc_id = jac.y
        |         WHERE inter * 2 >= (zx.n + zy.n - inter) * 1),
        |eh AS (SELECT b.doc_id, MIN(h.doc_id) AS r FROM b JOIN h ON b.t = h.t GROUP BY 1),
        |eb AS (SELECT y.doc_id, MIN(x.doc_id) AS r FROM b y
        |       JOIN b x ON x.t = y.t AND x.doc_id < y.doc_id GROUP BY 1),
        |nh AS (SELECT y AS doc_id, MIN(x) AS r FROM near
        |       WHERE x % 3 <> 0 AND y % 3 = 0 GROUP BY 1),
        |nb AS (SELECT y AS doc_id, MIN(x) AS r FROM near
        |       WHERE x % 3 = 0 AND y % 3 = 0 AND x < y GROUP BY 1)
        |SELECT b.doc_id,
        |  CASE WHEN eh.r IS NOT NULL THEN 'dup_exact_history'
        |       WHEN eb.r IS NOT NULL THEN 'dup_exact_batch'
        |       WHEN nh.r IS NOT NULL THEN 'dup_near_history'
        |       WHEN nb.r IS NOT NULL THEN 'dup_near_batch'
        |       ELSE 'new' END AS verdict,
        |  CAST(COALESCE(eh.r, eb.r, nh.r, nb.r) AS BIGINT) AS ref_id
        |FROM b
        |LEFT JOIN eh ON eh.doc_id = b.doc_id
        |LEFT JOIN eb ON eb.doc_id = b.doc_id
        |LEFT JOIN nh ON nh.doc_id = b.doc_id
        |LEFT JOIN nb ON nb.doc_id = b.doc_id""".stripMargin,

    "q90_shard_export" ->
      """SELECT doc_id % 16 AS shard, CAST(count(*) AS BIGINT) AS docs,
        |  CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS tokens,
        |  CAST(SUM(strlen(text)) AS BIGINT) AS bytes
        |FROM documents
        |GROUP BY 1""".stripMargin,

    // replays the derived second snapshot, then classifies via the same
    // full-outer + IS DISTINCT FROM comparison
    "q81_table_diff" ->
      """WITH o AS (SELECT * FROM orders),
        |n AS (
        | SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1
        |       ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate, o_orderpriority
        | FROM orders WHERE o_orderkey % 17 <> 0
        | UNION ALL
        | SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
        |  o_totalprice, o_orderdate, o_orderpriority
        | FROM orders WHERE o_orderkey % 50 = 0),
        |j AS (SELECT coalesce(o.o_orderkey, n.o_orderkey) AS k,
        |  CASE WHEN o.o_orderkey IS NULL THEN 'insert'
        |       WHEN n.o_orderkey IS NULL THEN 'delete'
        |       WHEN o.o_custkey IS DISTINCT FROM n.o_custkey
        |         OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
        |         OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
        |         OR o.o_orderdate IS DISTINCT FROM n.o_orderdate
        |         OR o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
        |       THEN 'update' END AS ct
        | FROM o FULL JOIN n ON o.o_orderkey = n.o_orderkey)
        |SELECT k AS o_orderkey, ct AS change_type FROM j
        |WHERE ct IS NOT NULL""".stripMargin,

    "q80_quality_checks" ->
      """WITH v AS (
        | SELECT 'complete:l_orderkey' AS check_name,
        |  CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS violations FROM lineitem
        | UNION ALL
        | SELECT 'complete:l_returnflag',
        |  CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem
        | UNION ALL
        | SELECT 'unique:l_orderkey',
        |  CAST(count(l_orderkey) - count(DISTINCT l_orderkey) AS BIGINT)
        |  FROM lineitem
        | UNION ALL
        | SELECT 'ref:l_orderkey->o_orderkey', CAST(count(*) AS BIGINT)
        | FROM lineitem WHERE l_orderkey IS NOT NULL
        |  AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        | UNION ALL
        | SELECT 'ref:l_partkey->p_partkey', CAST(count(*) AS BIGINT)
        | FROM lineitem WHERE l_partkey IS NOT NULL
        |  AND l_partkey NOT IN (SELECT p_partkey FROM part))
        |SELECT check_name, violations, violations = 0 AS passed FROM v""".stripMargin,

    // per-column stats as a UNION of scalar selects (oracle-side
    // simplicity; the engine side is the one-scan Expand plan)
    "q79_profile" ->
      Seq("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag",
        "l_linestatus").map(c =>
        s"""SELECT '$c' AS column, count(*) AS n_rows,
           | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |   AS n_null,
           | CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           | CAST(min($c) AS VARCHAR) AS min_value,
           | CAST(max($c) AS VARCHAR) AS max_value
           |FROM lineitem""".stripMargin).mkString("\nUNION ALL\n"),

    // the bloom skip changes which DIRECTORIES are opened, not the
    // answer: the oracle replays the probe selection as a subquery
    "q76_bloom_skip" ->
      """WITH p AS (
        | SELECT event_id FROM events WHERE event_id % 1000 = 7
        | ORDER BY event_id LIMIT 5)
        |SELECT e.event_id, e.user_id, epoch_ms(e.ts) AS ts_ms, e.event_type
        |FROM events e JOIN p USING (event_id)""".stripMargin,

    // the bucketed layout changes the PLAN, not the answer — the oracle
    // is the plain equi-join aggregate
    "q74_bucketed_join" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderpriority,
        | count(*) AS cnt,
        | CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT))
        |   AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2""".stripMargin,

    // q208: the plain census the bucketed layout must reproduce.
    "q208_bucketed_agg" ->
      """SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |   AS sum_cents
        |FROM lineitem GROUP BY 1""".stripMargin,

    // q209: both commit states replayed (q50 resolution rule), keyed
    // full-outer compare.
    "q209_time_travel_diff" ->
      """WITH base AS (SELECT o_orderkey AS k,
        |  strftime(o_orderdate, '%Y-%m') AS dt,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        | FROM orders),
        |c1 AS (SELECT k, dt, price_cents, CAST(1 AS BIGINT) AS ver,
        |  false AS del, 1 AS cseq FROM base),
        |c2 AS (SELECT k, dt, price_cents + 1000, CAST(2 AS BIGINT),
        |  k % 13 = 0, 2 FROM base WHERE k % 7 = 0 OR k % 13 = 0),
        |c3 AS (SELECT k, dt, price_cents + 5000, CAST(3 AS BIGINT),
        |  false, 3 FROM base WHERE k % 21 = 0),
        |s2 AS (SELECT k, dt, price_cents, ver FROM (
        |  SELECT *, row_number() OVER (PARTITION BY dt, k
        |    ORDER BY ver DESC, cseq DESC) AS rn
        |  FROM (SELECT * FROM c1 UNION ALL SELECT * FROM c2))
        | WHERE rn = 1 AND NOT del),
        |s3 AS (SELECT k, dt, price_cents, ver FROM (
        |  SELECT *, row_number() OVER (PARTITION BY dt, k
        |    ORDER BY ver DESC, cseq DESC) AS rn
        |  FROM (SELECT * FROM c1 UNION ALL SELECT * FROM c2
        |        UNION ALL SELECT * FROM c3))
        | WHERE rn = 1 AND NOT del),
        |d AS (SELECT coalesce(s3.k, s2.k) AS k,
        |  CASE WHEN s2.k IS NULL THEN 'insert'
        |   WHEN s3.k IS NULL THEN 'delete'
        |   WHEN s2.dt IS DISTINCT FROM s3.dt
        |    OR s2.price_cents IS DISTINCT FROM s3.price_cents
        |    OR s2.ver IS DISTINCT FROM s3.ver THEN 'update' END
        |    AS change_type
        | FROM s2 FULL JOIN s3 ON s3.k = s2.k)
        |SELECT k, change_type FROM d WHERE change_type IS NOT NULL""".stripMargin,

    // q205: the relational truth the JSON round-trip must reproduce.
    "q205_json_nested" ->
      """SELECT l_partkey AS p_partkey,
        | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
        | CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem WHERE l_orderkey % 5 = 0 GROUP BY 1""".stripMargin,

    // q202: per-relation child/orphan censuses, zeros proven.
    "q202_ref_integrity" ->
      """WITH r1 AS (SELECT 'lineitem.orderkey' AS relation,
        |  CAST(count(*) AS BIGINT) AS n_child,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_keys,
        |  CAST(count(*) FILTER (o_orderkey IS NULL) AS BIGINT)
        |    AS n_orphan_rows,
        |  CAST(count(DISTINCT l_orderkey) FILTER (o_orderkey IS NULL)
        |    AS BIGINT) AS n_orphan_keys
        | FROM lineitem LEFT JOIN orders ON o_orderkey = l_orderkey),
        |r2 AS (SELECT 'lineitem.partkey',
        |  CAST(count(*) AS BIGINT), CAST(count(DISTINCT l_partkey) AS BIGINT),
        |  CAST(count(*) FILTER (p_partkey IS NULL) AS BIGINT),
        |  CAST(count(DISTINCT l_partkey) FILTER (p_partkey IS NULL) AS BIGINT)
        | FROM lineitem LEFT JOIN part ON p_partkey = l_partkey),
        |r3 AS (SELECT 'lineitem.suppkey',
        |  CAST(count(*) AS BIGINT), CAST(count(DISTINCT l_suppkey) AS BIGINT),
        |  CAST(count(*) FILTER (s_suppkey IS NULL) AS BIGINT),
        |  CAST(count(DISTINCT l_suppkey) FILTER (s_suppkey IS NULL) AS BIGINT)
        | FROM lineitem LEFT JOIN supplier ON s_suppkey = l_suppkey),
        |r4 AS (SELECT 'orders.custkey',
        |  CAST(count(*) AS BIGINT), CAST(count(DISTINCT o_custkey) AS BIGINT),
        |  CAST(count(*) FILTER (c_custkey IS NULL) AS BIGINT),
        |  CAST(count(DISTINCT o_custkey) FILTER (c_custkey IS NULL) AS BIGINT)
        | FROM orders LEFT JOIN customer ON c_custkey = o_custkey)
        |SELECT * FROM r1 UNION ALL SELECT * FROM r2
        |UNION ALL SELECT * FROM r3 UNION ALL SELECT * FROM r4""".stripMargin,

    // q193: the same deterministic feed; validity via json_valid, typed
    // extraction only on valid lines.
    "q193_json_ingest" ->
      """WITH feed AS (SELECT lang,
        |  CASE WHEN doc_id % 37 = 0
        |   THEN '{"id":' || doc_id || ',"lang":"'
        |   ELSE '{"id":' || doc_id || ',"lang":"' || lang || '","n":'
        |     || n_chars || '}' END AS line
        | FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_lines,
        | CAST(sum(CASE WHEN json_valid(line) THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_valid,
        | CAST(sum(CASE WHEN json_valid(line) THEN 0 ELSE 1 END) AS BIGINT)
        |   AS n_corrupt,
        | CAST(sum(CASE WHEN json_valid(line)
        |   THEN CAST(json_extract(line, '$.n') AS BIGINT) END) AS BIGINT)
        |   AS sum_n
        |FROM feed GROUP BY 1""".stripMargin,

    // q190: contiguous cumulative-sum binning over the (bytes desc,
    // source, lang) total order, 64 KiB target.
    "q190_compaction_bins" ->
      """WITH f AS (SELECT source, lang, sum(strlen(text)) AS bytes,
        |   count(*) AS n_docs FROM documents GROUP BY 1, 2),
        |c AS (SELECT source, lang, bytes, n_docs,
        |   coalesce(sum(bytes) OVER (ORDER BY bytes DESC, source, lang
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |   AS csum FROM f)
        |SELECT CAST(csum // 65536 AS BIGINT) AS bin,
        | CAST(count(*) AS BIGINT) AS n_files,
        | CAST(sum(bytes) AS BIGINT) AS tot_bytes,
        | CAST(sum(n_docs) AS BIGINT) AS tot_docs
        |FROM c GROUP BY 1""".stripMargin,

    // q215: the melt of the pivot is the straight relational census.
    "q215_melt_roundtrip" ->
      """SELECT epoch_ms(ts) - epoch_ms(ts) % 86400000 AS day_ms,
        | event_type, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,

    // q216: per-candidate FD verification censuses, unioned.
    "q216_fd_audit" ->
      """WITH j AS (SELECT * FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey),
        |fd1 AS (SELECT CAST(l_orderkey AS VARCHAR) AS x,
        |  count(DISTINCT coalesce(CAST(o_custkey AS VARCHAR), ' NULL'))
        |    AS ny FROM j GROUP BY 1),
        |fd2 AS (SELECT CAST(l_orderkey AS VARCHAR) AS x,
        |  count(DISTINCT coalesce(CAST(o_orderdate AS VARCHAR), ' NULL'))
        |    AS ny FROM j GROUP BY 1),
        |fd3 AS (SELECT CAST(l_partkey AS VARCHAR) AS x,
        |  count(DISTINCT coalesce(CAST(l_suppkey AS VARCHAR), ' NULL'))
        |    AS ny FROM j GROUP BY 1),
        |fd4 AS (SELECT CAST(l_suppkey AS VARCHAR) AS x,
        |  count(DISTINCT coalesce(l_returnflag, ' NULL')) AS ny
        | FROM j GROUP BY 1)
        |SELECT 'l_orderkey' AS lhs, 'o_custkey' AS rhs,
        |  count(*) AS n_groups,
        |  CAST(sum(CASE WHEN ny > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS violating_groups,
        |  CAST(max(ny) AS BIGINT) AS max_rhs_distinct FROM fd1
        |UNION ALL
        |SELECT 'l_orderkey', 'o_orderdate', count(*),
        |  CAST(sum(CASE WHEN ny > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(max(ny) AS BIGINT) FROM fd2
        |UNION ALL
        |SELECT 'l_partkey', 'l_suppkey', count(*),
        |  CAST(sum(CASE WHEN ny > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(max(ny) AS BIGINT) FROM fd3
        |UNION ALL
        |SELECT 'l_suppkey', 'l_returnflag', count(*),
        |  CAST(sum(CASE WHEN ny > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(max(ny) AS BIGINT) FROM fd4""".stripMargin,

    "q255_table_checksum" -> q255OracleSql,

    // q261: the single-node replay IS the global-order window the Spark
    // side exists to avoid — runs = rows where the value differs from
    // its lag (IS DISTINCT FROM: null runs merge), +1 for row 1.
    "q261_rle_layout" -> {
      val cols = Seq("l_suppkey", "l_partkey", "l_returnflag",
        "l_linestatus", "l_shipdate")
      def cte(alias: String, order: String) =
        s"""$alias AS (
           | SELECT ${cols.mkString(", ")}, row_number() OVER w AS rn,
           |  ${cols.map(c => s"lag($c) OVER w AS p_$c").mkString(", ")}
           | FROM lineitem WINDOW w AS (ORDER BY $order))""".stripMargin
      def branches(alias: String, label: String) = cols.map(c =>
        s"""SELECT '$label' AS sort_order, '$c' AS col_name,
           | CAST(sum(CASE WHEN rn = 1 OR $c IS DISTINCT FROM p_$c
           |   THEN 1 ELSE 0 END) AS BIGINT) AS runs,
           | count(*) AS n_rows FROM $alias""".stripMargin)
      s"""WITH ${cte("nat", "l_orderkey, l_linenumber")},
         |${cte("sup", "l_suppkey, l_shipdate, l_orderkey, l_linenumber")}
         |${(branches("nat", "natural") ++
             branches("sup", "supplier_ship")).mkString("\nUNION ALL\n")}
         |""".stripMargin
    },

    // q264: the single-node replay IS the global-order window the
    // operator avoids; bit length via format('{:b}').
    "q264_dict_encode" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |c AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
        |r AS (SELECT term, cnt,
        |  row_number() OVER (ORDER BY cnt DESC, term) - 1 AS code FROM c)
        |SELECT term, cnt, code,
        |  CAST(cnt * length(format('{:b}', code)) AS BIGINT) AS bits_total
        |FROM r""".stripMargin,

    // q274: identical construction, identical two-axis as-of filter.
    "q274_bitemporal" ->
      """WITH o AS (SELECT o_orderkey AS k, o_orderpriority AS prio,
        |  epoch_ms(o_orderdate) AS od,
        |  CAST(round(o_totalprice*100) AS BIGINT) AS p,
        |  o_orderkey % 5 = 0 AS corr FROM orders),
        |tab AS (
        | SELECT k, prio, od AS vf, 9000000000000000 AS vt,
        |        od AS tf, 9000000000000000 AS tt, p FROM o WHERE NOT corr
        | UNION ALL SELECT k, prio, od, 9000000000000000,
        |        od, od + 1296000000, p FROM o WHERE corr
        | UNION ALL SELECT k, prio, od, od + 864000000,
        |        od + 1296000000, 9000000000000000, p FROM o WHERE corr
        | UNION ALL SELECT k, prio, od + 864000000, 9000000000000000,
        |        od + 1296000000, 9000000000000000, p * 9 // 10
        |   FROM o WHERE corr),
        |ts AS (SELECT (min(od) + max(od)) // 2 AS t2,
        |  (min(od) + max(od)) // 2 - 2592000000 AS t1 FROM o)
        |SELECT prio, count(*) AS n_orders,
        |  CAST(sum(p) AS BIGINT) AS sum_cents
        |FROM tab, ts
        |WHERE tf <= t2 AND t2 < tt AND vf <= t1 AND t1 < vt
        |GROUP BY 1""".stripMargin,

    // q276: the global-order lag replay; zigzag as a CASE, first row
    // deltas from 0 via coalesce.
    "q276_delta_layout" -> {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey")
      def cte(alias: String, order: String) =
        s"""$alias AS (
           | SELECT ${cols.mkString(", ")},
           |  ${cols.map(c => s"lag($c) OVER w AS p_$c").mkString(", ")}
           | FROM lineitem WINDOW w AS (ORDER BY $order))""".stripMargin
      def branches(alias: String, label: String) = cols.map { c =>
        val d = s"($c - coalesce(p_$c, 0))"
        s"""SELECT '$label' AS sort_order, '$c' AS col_name,
           | CAST(sum(length(format('{:b}',
           |   CASE WHEN $d >= 0 THEN 2*$d ELSE -2*$d - 1 END)))
           |  AS BIGINT) AS delta_bits,
           | count(*) AS n_rows FROM $alias""".stripMargin
      }
      s"""WITH ${cte("nat", "l_orderkey, l_linenumber")},
         |${cte("sup", "l_suppkey, l_shipdate, l_orderkey, l_linenumber")}
         |${(branches("nat", "natural") ++
             branches("sup", "supplier_ship")).mkString("\nUNION ALL\n")}
         |""".stripMargin
    },

    // q278: per-pair scalar subqueries — distinct censuses, containment
    // join, uniqueness probe; same ppm truncation.
    "q278_fk_inference" -> {
      def pair(label: String, child: String, cc: String, parent: String,
          pc: String) =
        s"""SELECT '$label' AS candidate,
           | cd.n AS n_child_distinct, pd.n AS n_parent_distinct,
           | j.n AS n_contained, j.n * 1000000 // cd.n AS containment_ppm,
           | pd.mx = 1 AS parent_unique,
           | (pd.mx = 1 AND j.n = cd.n) AS is_fk
           |FROM
           | (SELECT count(DISTINCT $cc) AS n FROM $child
           |   WHERE $cc IS NOT NULL) cd,
           | (SELECT count(*) AS n, max(c) AS mx FROM
           |   (SELECT $pc, count(*) AS c FROM $parent GROUP BY 1)) pd,
           | (SELECT count(*) AS n FROM
           |   (SELECT DISTINCT $cc AS v FROM $child
           |     WHERE $cc IS NOT NULL) x
           |   JOIN (SELECT DISTINCT $pc AS v FROM $parent) y
           |     ON x.v = y.v) j""".stripMargin
      Seq(
        pair("lineitem.l_orderkey->orders.o_orderkey", "lineitem",
          "l_orderkey", "orders", "o_orderkey"),
        pair("lineitem.l_partkey->part.p_partkey", "lineitem",
          "l_partkey", "part", "p_partkey"),
        pair("orders.o_custkey->customer.c_custkey", "orders",
          "o_custkey", "customer", "c_custkey"),
        pair("lineitem.l_suppkey->part.p_partkey", "lineitem",
          "l_suppkey", "part", "p_partkey"),
        pair("customer.c_custkey->orders.o_orderkey", "customer",
          "c_custkey", "orders", "o_orderkey"),
      ).mkString("\nUNION ALL\n")
    },

    // q280: the identical unrolled xy2d (emitted by the same Scala
    // helper as the Spark expression), Morton by shift-interleave.
    "q280_hilbert_locality" -> {
      val ctes = graft.functions.SpaceCurves
        .hilbertSqlCtes("h0", 5, Seq("ox", "oy"))
      val z = (0 until 5).map(i =>
        s"(((ox >> $i) & 1) << ${2 * i}) + (((oy >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      val boxes = Seq(("box_a", 3, 19, 5, 11),
        ("box_b", 0, 31, 12, 16), ("box_c", 9, 25, 9, 25))
      val branches = for ((bn, x0, x1, y0, y1) <- boxes;
          cn <- Seq("hilbert", "zorder")) yield {
        val ic = if (cn == "hilbert") "hil" else "zo"
        s"""SELECT '$cn' AS curve, '$bn' AS box, $ic AS i FROM idx
           | WHERE ox BETWEEN $x0 AND $x1 AND oy BETWEEN $y0 AND $y1"""
          .stripMargin
      }
      s"""WITH cells AS (SELECT DISTINCT (c_custkey*7919) % 32 AS x,
         |  ((c_custkey // 32) * 104729) % 32 AS y FROM customer),
         |h0 AS (SELECT x AS ox, y AS oy, x, y, 0 AS d FROM cells),
         |$ctes,
         |idx AS (SELECT ox, oy, d AS hil, $z AS zo FROM h5),
         |pts AS (${branches.mkString("\nUNION ALL\n")}),
         |r AS (SELECT curve, box, i,
         |  lag(i) OVER (PARTITION BY curve, box ORDER BY i) AS p
         | FROM pts)
         |SELECT curve, box, count(*) AS n_cells,
         |  CAST(sum(CASE WHEN p IS NULL OR i <> p + 1 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_ranges
         |FROM r GROUP BY 1, 2""".stripMargin
    },

    // q288: last reset via window rank, increments after it via row
    // comparison, same full-outer stitch.
    "q288_event_sourcing" ->
      """WITH o AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
        |  event_type, CAST(round(value*100) AS BIGINT) AS cents
        | FROM events WHERE value IS NOT NULL
        |   AND event_type IN ('signup', 'purchase', 'error')),
        |r AS (SELECT user_id, event_type AS rtype, cents AS rcents,
        |  ts_ms AS rts, event_id AS rid FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts_ms DESC, event_id DESC) AS rn
        |  FROM o WHERE event_type IN ('signup', 'error')) WHERE rn = 1),
        |p AS (SELECT o.user_id, CAST(sum(o.cents) AS BIGINT) AS incr
        | FROM o LEFT JOIN r USING (user_id)
        | WHERE o.event_type = 'purchase'
        |   AND (r.user_id IS NULL OR (o.ts_ms, o.event_id) > (rts, rid))
        | GROUP BY 1)
        |SELECT coalesce(r.user_id, p.user_id) AS user_id,
        |  coalesce(CASE WHEN rtype = 'signup' THEN rcents ELSE 0 END, 0)
        |    + coalesce(incr, 0) AS balance_cents
        |FROM r FULL JOIN p ON r.user_id = p.user_id""".stripMargin,

    // q290: the sequential chain walk the doubling avoids.
    "q290_tree_flatten" ->
      """WITH RECURSIVE n AS (SELECT c_custkey AS node FROM customer),
        |walk AS (
        | SELECT node, node AS cur, 0 AS depth FROM n
        | UNION ALL
        | SELECT node, cur // 4, depth + 1 FROM walk WHERE cur <> 0)
        |SELECT node, CAST(0 AS BIGINT) AS root,
        |  CAST(max(depth) AS BIGINT) AS depth
        |FROM walk GROUP BY 1""".stripMargin,

    // q291: same ancestor explode over the div-4 chain.
    "q291_subtree_rollup" ->
      """WITH rev AS (SELECT o_custkey AS node,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |    AS cents
        | FROM orders GROUP BY 1),
        |a AS (SELECT r.node // (1 << (2 * g.i)) AS anc, r.cents
        | FROM rev r JOIN range(0, 11) AS g(i)
        |  ON g.i = 0 OR r.node // (1 << (2 * greatest(g.i - 1, 0))) > 0)
        |SELECT anc AS node, count(*) AS n_contrib,
        |  CAST(sum(cents) AS BIGINT) AS subtree_cents
        |FROM a WHERE anc < 64 GROUP BY 1""".stripMargin,

    // q293: one aggregate replicated under three format labels — the
    // parity claim is that all three rows per type are identical.
    "q293_format_parity" ->
      """WITH a AS (SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS cents,
        |  CAST(sum(epoch_ms(ts) % 1000003) AS BIGINT) AS ts_check
        | FROM events GROUP BY 1)
        |SELECT event_type, n, cents, ts_check, 'parquet' AS format FROM a
        |UNION ALL SELECT event_type, n, cents, ts_check, 'csv' FROM a
        |UNION ALL SELECT event_type, n, cents, ts_check, 'json' FROM a"""
        .stripMargin,

    // q294: the merged read replayed as a NULL-padded union.
    "q294_schema_evolution" ->
      """WITH m AS (
        | SELECT CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |   CAST(NULL AS VARCHAR) AS priority
        | FROM orders WHERE o_orderkey % 2 = 0
        | UNION ALL
        | SELECT CAST(round(o_totalprice*100) AS BIGINT), o_orderpriority
        | FROM orders WHERE o_orderkey % 2 <> 0)
        |SELECT coalesce(priority, '(pre-schema)') AS priority,
        |  count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents
        |FROM m GROUP BY 1""".stripMargin,

    // q304: the generator replayed in unsigned SQL (splitMix64 chain).
    "q304_synth_source" -> q304OracleSql,

    // q326: same replay, aggregated raw — proves the pushed partials.
    "q326_synth_agg" -> q326OracleSql,
  )
}
