package graft

import graft.pipeline.Multimodal

class MultimodalSpec extends SparkTest {
  import spark.implicits._

  test("binary payload plumbing: batched decode is deterministic, schema typed, total") {
    val media = Multimodal.fromDocuments(spark, "/root/testdata/sf0.001")
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length == 500)
    feats.foreach { f =>
      assert(f.byteLen == 16) // md5 payload stub
      assert(f.width >= 16 && f.width < 80 && f.height >= 16 && f.height < 80)
      assert(f.embedding.length == 8)
      assert(Set("image", "audio", "video").contains(f.mediaType))
    }
    // deterministic across runs
    val again = Multimodal.decodeFeatures(media).collect()
    assert(feats.map(_.width).toSeq == again.map(_.width).toSeq)
  }
}
