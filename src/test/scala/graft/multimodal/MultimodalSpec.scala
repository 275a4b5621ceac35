package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val s = spark

  private def item(id: Long, kind: String, n: Int, durMs: Long = 0L) =
    MediaItem(id, kind, Array.tabulate(n)(i => ((id * 31 + i) % 251).toByte),
      durationMs = durMs)

  private lazy val items = (1L to 200L).map(i =>
    item(i, if (i % 3 == 0) "video" else "image", 64 + (i % 32).toInt,
      durMs = 1000L * (i % 5))).toDS()

  test("decodeFeatures emits fixed-dim deterministic features") {
    val dec = new StubDecoder(featureDim = 16)
    val a = Multimodal.decodeFeatures(items, dec, batchSize = 7)
      .collect().map(f => f.mediaId -> f.feature.toSeq).toMap
    val b = Multimodal.decodeFeatures(items.repartition(13), dec, batchSize = 64)
      .collect().map(f => f.mediaId -> f.feature.toSeq).toMap
    assert(a.size == 200)
    assert(a.values.forall(_.size == 16))
    // independent of partitioning and batch size
    assert(a == b)
  }

  test("features carry typed metadata and stay narrow") {
    val out = Multimodal.decodeFeatures(items, new StubDecoder(8), 32)
    assert(out.columns.toSet == Set("mediaId", "kind", "nBytes", "feature"))
    assert(out.filter(_.nBytes <= 0).isEmpty)
  }

  test("frameSamplePlan explodes sampled frame offsets for videos only") {
    val frames = Multimodal.frameSamplePlan(items, everyMs = 500L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(frames.nonEmpty)
    val ids = frames.map(_._1).toSet
    assert(ids.forall(_ % 3 == 0)) // only videos
    // a 4000ms video sampled at 500ms → offsets 0,500,...,3500
    val v = frames.filter(_._1 == 9L).map(_._2).sorted
    assert(v.headOption.contains(0L))
    assert(v.forall(_ % 500 == 0))
  }

  test("dHashes: controlled gradient grids set exactly the expected bits") {
    // a decoder whose grid is fully increasing per row -> all 64 bits
    // set; fully decreasing -> none; alternating -> checkerboard rows
    class GridDecoder(fill: Int => Float) extends MediaDecoder {
      override val featureDim = 72
      override def decode(item: MediaItem): Array[Float] =
        Array.tabulate(72)(i => fill(i))
    }
    implicit val s = spark
    import spark.implicits._
    val items = Seq(
      MediaItem(1L, "image", Array[Byte](1)),
      MediaItem(2L, "image", Array[Byte](2))).toDS()
    val inc = Multimodal.dHashes(items, new GridDecoder(i => (i % 9).toFloat))
      .select("dhash").as[Long].collect()
    assert(inc.forall(_ == -1L)) // every left<right comparison true
    val dec = Multimodal.dHashes(items, new GridDecoder(i => -(i % 9).toFloat))
      .select("dhash").as[Long].collect()
    assert(dec.forall(_ == 0L))
  }

  test("dHashes + hammingPairs: stub determinism and end-to-end mining") {
    implicit val s = spark
    import spark.implicits._
    // same bytes -> same hash (near-dup at distance 0); distinct bytes
    // -> far hashes with overwhelming probability
    val items = Seq(
      MediaItem(1L, "image", Array[Byte](10, 20, 30)),
      MediaItem(2L, "image", Array[Byte](10, 20, 30)),
      MediaItem(3L, "image", Array[Byte](99, 98, 97))).toDS()
    val hashes = Multimodal.dHashes(items, new StubDecoder(72))
    val again = Multimodal.dHashes(items, new StubDecoder(72))
    assert(hashes.orderBy("mediaId").collect().toSeq ==
      again.orderBy("mediaId").collect().toSeq) // deterministic plumbing
    val pairs = graft.operators.Dedup.hammingPairs(hashes, "mediaId",
        "dhash", maxDist = 7)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L, 0L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(new StubDecoder(72).featureDim == 72)
  }
}

