package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 1, 2)
  private val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10)
  private val riff = "RIFFxxxx".getBytes

  test("binaryMeta sniffs magic bytes") {
    val df = Seq((1L, jpeg), (2L, png), (3L, riff)).toDF("id", "payload")
    val out = Multimodal.binaryMeta(df, "id", "payload")
      .select("id", "sniffed_kind").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "jpeg", 2L -> "png", 3L -> "riff"))
  }

  test("decodeFeatures: deterministic stubbed features, streamed per partition") {
    val df = Seq((1L, jpeg), (2L, png)).toDF("id", "payload").repartition(2)
    val feats = Multimodal.decodeFeatures(df, "id", "payload").collect()
      .map(f => f.id -> f).toMap
    assert(feats(1L) == Multimodal.DecodeStub.decode(1L, jpeg))
    assert(feats(2L) == Multimodal.DecodeStub.decode(2L, png))
    assert(feats(1L).meanLuma > 0)
  }

  test("sampleFrames expands then filters frame indexes") {
    val df = Seq((1L, Array.fill[Byte](7)(1))).toDF("id", "payload")
    val feats = Multimodal.decodeFeatures(df, "id", "payload")
    val n = feats.head().nFrames
    val frames = Multimodal.sampleFrames(feats, everyNth = 2)
    assert(frames.count() == (0 until n count (_ % 2 == 0)))
  }
}
