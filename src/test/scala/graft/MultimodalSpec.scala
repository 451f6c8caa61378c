package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "abc", "src0", "en"),
    (1L, "hello world", "src1", "en"),
    (2L, "日本語", "src2", "zh"))
    .toDF("doc_id", "text", "source", "lang")

  test("media table carries binary payload + kind by doc_id") {
    val rows = Multimodal.mediaTable(docs).collect()
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(0L).getAs[String]("kind") == "image")
    assert(byId(1L).getAs[String]("kind") == "audio")
    assert(byId(2L).getAs[String]("kind") == "video")
    assert(byId(0L).getAs[Array[Byte]]("payload").sameElements("abc".getBytes("UTF-8")))
    // multibyte text: payload is bytes, not chars
    assert(byId(2L).getAs[Array[Byte]]("payload").length == 9)
  }

  test("feature extraction is deterministic byte arithmetic") {
    val feats = Multimodal.extractFeatures(spark, Multimodal.mediaTable(docs))
      .collect().map(f => f.doc_id -> f).toMap
    val f0 = feats(0L)
    assert(f0.n_bytes == 3 && f0.width == 64 + 3 && f0.height == 64 + 21)
    assert(f0.channels == 3)
    assert(feats(1L).channels == 1) // audio
    assert(f0.checksum == ("abc".getBytes("UTF-8").map(_ & 0xff).sum % 997))
    // run twice: identical
    val again = Multimodal.extractFeatures(spark, Multimodal.mediaTable(docs))
      .collect().map(f => f.doc_id -> f).toMap
    assert(again == feats)
  }

  test("resize dims fit within 256 preserving aspect, never below 1") {
    assert(Multimodal.resizeDims(512, 256) == (256L, 128L))
    assert(Multimodal.resizeDims(100, 400) == (64L, 256L))
    assert(Multimodal.resizeDims(1, 10000) == (1L, 256L))
  }

  test("frame sampling windows the payload with per-frame checksums") {
    val frames = Multimodal.sampleFrames(spark, Multimodal.mediaTable(docs), frameBytes = 4)
      .collect().sortBy(f => (f.doc_id, f.frame_idx))
    // only video rows (doc 2, 9 payload bytes -> 3 frames of 4/4/1 bytes)
    assert(frames.forall(_.doc_id == 2L))
    assert(frames.map(_.frame_idx).toSeq == Seq(0L, 1L, 2L))
    assert(frames.map(_.offset_bytes).toSeq == Seq(0L, 4L, 8L))
    val bytes = "日本語".getBytes("UTF-8").map(_ & 0xff)
    assert(frames(0).frame_checksum == bytes.slice(0, 4).sum % 997)
    assert(frames(2).frame_checksum == bytes.slice(8, 9).sum % 997)
  }
}
