package graft.agg

import graft.SparkSpec
import graft.operators.RuntimeFilter
import org.apache.spark.sql.functions._

/** The Bloom aggregate must never produce false negatives, must hold its
  * sized false-positive rate, must merge identically across partitionings,
  * and the runtime-filter join built on it must return exactly the
  * un-pruned join's rows with the prune sitting below the join. */
class BloomSketchSpec extends SparkSpec {
  import spark.implicits._

  private val keys = (0L until 2000L).map(_ * 7919L + 13L)

  private def buildFilter(parts: Int): Array[Byte] = {
    BloomSketch.register(spark)
    keys.toDF("k").repartition(parts)
      .agg(BloomSketch.bloomBits(col("k"), numBits = 32768, numHashes = 7))
      .collect().head.getAs[Array[Byte]](0)
  }

  test("no false negatives, fpp within envelope, merge-path identical") {
    val one = buildFilter(1)
    val many = buildFilter(17)
    assert(java.util.Arrays.equals(one, many),
      "merge path diverges from single-partition build")
    keys.foreach(k => assert(BloomSketch.mightContain(one, k),
      s"false negative for inserted key $k"))
    // 2000 keys in 32768 bits, k=7 → theoretical fpp ≈ 0.63%; allow 3×.
    val probes = (1L to 20000L).map(_ * 104729L + 1L).filterNot(keys.contains)
    val fp = probes.count(BloomSketch.mightContain(one, _))
    assert(fp.toDouble / probes.size < 0.02,
      s"false-positive rate ${fp.toDouble / probes.size} above envelope")
  }

  test("bloomSemiJoin equals the exact semi-join; prune runs below the join") {
    // parquet-backed fact: a LocalRelation fixture would let
    // ConvertToLocalRelation evaluate the literal-bitset probe (r16
    // shape) driver-side and fold the Filter away before the plan check
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    (0L until 5000L).map(i => (i % 400L, i)).toDF("fk", "payload")
      .write.mode("overwrite").parquet(s"$dir/fact")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = (0L until 400L by 5L).toDF("dk")
    val pruned = RuntimeFilter.bloomSemiJoin(fact, "fk", dim, "dk",
      numBits = 8192, numHashes = 5)
    val exact = fact.join(dim, col("fk") === col("dk"), "left_semi")
    assert(pruned.select("fk", "payload").except(exact).isEmpty &&
      exact.except(pruned.select("fk", "payload")).isEmpty)
    assert(pruned.count() == exact.count())
    // The bloom probe must appear in the physical plan (inside codegen)
    // strictly before the final join — i.e. it filters the fact side.
    val plan = pruned.queryExecution.executedPlan.toString
    val probeAt = plan.indexOf("bloom_might_contain")
    assert(probeAt >= 0, s"no bloom probe in plan:\n$plan")
  }

  test("bloom aggregate runs in streaming group-bys with batch parity") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    BloomSketch.register(spark)
    val data = (0 until 2000).map(i => ((i % 3).toLong, (i % 700).toLong))
    val mem = MemoryStream[(Long, Long)]
    val sdf = mem.toDS().toDF("g", "k").groupBy("g")
      .agg(BloomSketch.bloomBits(col("k"), 8192, 5).as("bf"))
    val q = sdf.writeStream.format("memory").queryName("bloom_stream")
      .outputMode("complete").start()
    try {
      // two batches: the state-store buffer must OR across them
      mem.addData(data.take(800): _*); q.processAllAvailable()
      mem.addData(data.drop(800): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("bloom_stream").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val batch = data.toDF("g", "k").groupBy("g")
      .agg(BloomSketch.bloomBits(col("k"), 8192, 5).as("bf")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(streamed == batch)
  }

  test("nulls are skipped, not inserted") {
    BloomSketch.register(spark)
    val bf = Seq(Some(5L), None, Some(9L)).toDF("k")
      .agg(BloomSketch.bloomBits(col("k"), 1024, 4))
      .collect().head.getAs[Array[Byte]](0)
    assert(BloomSketch.mightContain(bf, 5L) && BloomSketch.mightContain(bf, 9L))
  }
}
