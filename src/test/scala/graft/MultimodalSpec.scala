package graft

import graft.pipeline.Multimodal

class MultimodalSpec extends SparkTest {
  import spark.implicits._

  test("binary payload plumbing: batched decode is deterministic, schema typed, total") {
    val media = Multimodal.fromDocuments(spark, "/root/testdata/sf0.001")
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length == 500)
    val payloads = media.collect().map(r => r.doc_id -> r.payload).toMap
    feats.foreach { f =>
      assert(f.byteLen == 16) // md5 payload stub
      assert(f.width >= 16 && f.width < 16 + 2033 && f.height >= 16 && f.height < 16 + 2033)
      assert(f.channels >= 1 && f.channels <= 4)
      assert(f.embedding.length == 8)
      assert(Set("image", "audio", "video").contains(f.mediaType))
      // stub codec contract: a pure function of the payload bytes at
      // fixed offsets (what the DuckDB oracle recomputes from md5(text))
      val p = payloads(f.doc_id)
      assert(f.width == 16 + ((((p(0) & 0xff) << 8) | (p(1) & 0xff)) % 2033))
      assert(f.height == 16 + ((((p(2) & 0xff) << 8) | (p(3) & 0xff)) % 2033))
      assert(f.channels == 1 + ((p(4) & 0xff) % 4))
    }
    // deterministic across runs
    val again = Multimodal.decodeFeatures(media).collect()
    assert(feats.map(_.width).toSeq == again.map(_.width).toSeq)
  }

  test("resize stage: aspect-preserving fit, never upscales, byte size scales with area") {
    val media = Multimodal.fromDocuments(spark, "/root/testdata/sf0.001")
    val resized = Multimodal.resizeTo(Multimodal.decodeFeatures(media), 32, 32).collect()
    assert(resized.length == 500)
    resized.foreach { r =>
      assert(r.rWidth <= 32 && r.rHeight <= 32 && r.rWidth >= 1 && r.rHeight >= 1)
      assert(r.rWidth <= r.width && r.rHeight <= r.height) // fit, no upscale
      // aspect preserved within integer-floor tolerance
      val s = math.min(1.0, math.min(32.0 / r.width, 32.0 / r.height))
      assert(r.rWidth == math.max(1, math.floor(r.width * s).toInt))
      assert(r.rByteLen >= 1)
    }
  }

  test("frame sampling: 1 + doc_id % 4 frames per VIDEO row, deterministic keys") {
    val media = Multimodal.fromDocuments(spark, "/root/testdata/sf0.001")
    val frames = Multimodal.sampleFrames(media).collect()
    val videos = media.filter(_.mediaType == "video").collect()
    assert(frames.map(_.doc_id).toSet == videos.map(_.doc_id).toSet)
    val byDoc = frames.groupBy(_.doc_id)
    byDoc.foreach { case (id, fs) =>
      assert(fs.length == 1 + (id % 4).toInt, s"doc $id")
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until fs.length).toSeq)
      assert(fs.map(_.frame_key).distinct.length == fs.length)
    }
    assert(Multimodal.sampleFrames(media).collect().map(_.frame_key).sorted.toSeq ==
      frames.map(_.frame_key).sorted.toSeq)
  }
}
