package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("binary payloads flow through batched feature extraction, one row each") {
    val media = Multimodal.syntheticMedia(spark, 30).repartition(4)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length === 30)
    assert(feats.map(_.media_id).toSet === (0L until 30L).toSet)
    // only videos get frame samples; everyone gets dims from the (stub) codec
    assert(feats.filter(_.kind == "video").forall(_.frames_sampled > 0))
    assert(feats.filter(_.kind != "video").forall(_.frames_sampled == 0))
    assert(feats.forall(f => f.width >= 64 && f.height >= 64))
  }

  test("extraction is deterministic (pure function of payload bytes)") {
    val a = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, 10))
      .collect().sortBy(_.media_id)
    val b = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, 10).repartition(3))
      .collect().sortBy(_.media_id)
    assert(a === b)
  }

  test("payload schema matches the declared media schema") {
    val media = Multimodal.syntheticMedia(spark, 3)
    assert(media.schema("payload").dataType.typeName === "binary")
    assert(media.schema("meta").dataType === Multimodal.mediaSchema("meta").dataType)
  }
}
