package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("binary payload round-trips with correct byte counts and digests") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length == 500)
    val one = feats.find(_.media_id == 0L).get
    assert(one.n_bytes > 0)
    assert(one.digest.matches("[0-9a-f]{32}"))
    assert(one.feature.length == Multimodal.MediaCodec.FeatureDim)
  }

  test("stub decode is deterministic across runs") {
    val a = Multimodal.decodeFeatures(Multimodal.mediaFromDocuments(spark, sf))
      .filter(_.media_id < 10).collect().sortBy(_.media_id)
    val b = Multimodal.decodeFeatures(Multimodal.mediaFromDocuments(spark, sf))
      .filter(_.media_id < 10).collect().sortBy(_.media_id)
    assert(a.map(_.digest).toSeq == b.map(_.digest).toSeq)
    assert(a.map(_.feature.toSeq).toSeq == b.map(_.feature.toSeq).toSeq)
  }

  test("frame sampling emits every stride-th fixed-size block") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val frames = Multimodal.sampleFrames(media, frameBytes = 16, stride = 2)
    val forDoc = frames.filter("media_id = 0").collect()
    assert(forDoc.nonEmpty)
    assert(forDoc.map(_.getLong(1)).forall(_ % 2 == 0))
    // all but possibly the final block are exactly frameBytes long
    val sizes = forDoc.map(_.getAs[Array[Byte]]("frame").length)
    assert(sizes.init.forall(_ == 16))
  }
}
