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
}
