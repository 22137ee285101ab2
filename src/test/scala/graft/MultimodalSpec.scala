package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stub decode derives deterministic features from payload bytes") {
    val item = Multimodal.MediaItem(7L, "hello".getBytes("UTF-8"), "text/plain", "t")
    val f1 = Multimodal.stubDecode(item)
    val f2 = Multimodal.stubDecode(item)
    assert(f1 == f2)
    assert(f1.byte_len == 5 && f1.first_cp == 'h'.toInt)
    assert(f1.width == 5 % 640 + 16)
  }

  test("decode runs partition-wise over a media Dataset") {
    val docs = Seq((0L, "abc"), (1L, "defgh")).toDF("doc_id", "text")
    val media = Multimodal.mediaFromText(docs, "doc_id", "text", "test")
      .as[Multimodal.MediaItem]
    val feats = Multimodal.decode(media).orderBy("media_id").collect()
    assert(feats.map(_.byte_len).toSeq == Seq(3, 5))
    assert(feats.forall(_.checksum > 0))
  }

  test("sampleFrames emits one row per sampled chunk") {
    val df = Seq((0L, "0123456789abcdef")).toDF("id", "payload")
      .withColumn("payload", col("payload").cast("binary"))
    val frames = Multimodal.sampleFrames(df, "id", "payload", chunkLen = 4, stride = 2)
    assert(frames.count() == 2) // 16 bytes / (4*2) = 2 pseudo-frames
    assert(frames.columns.toSet == Set("id", "frame_idx", "frame_bytes"))
  }
}
