package graft

import graft.multimodal.Multimodal
import graft.sources.Tables

/** Multimodal plumbing: binary payload + typed metadata through the
  * partition-batched stub codec, transcode, and frame sampling. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media =
    Multimodal.syntheticMediaFrom(Tables.documents(spark, sf()), "doc_id", "text")

  test("feature extraction is deterministic and partition-batched") {
    val a = Multimodal.extractFeatures(spark, media, Multimodal.DeterministicFakeDecoder)
      .orderBy($"media_id").collect()
    val b = Multimodal.extractFeatures(spark, media.repartition(7), Multimodal.DeterministicFakeDecoder)
      .orderBy($"media_id").collect()
    assert(a.length == b.length && a.length > 0)
    assert(a.zip(b).forall { case (x, y) =>
      x.media_id == y.media_id && x.content_hash == y.content_hash &&
        x.feature.sameElements(y.feature)
    }, "features must not depend on partitioning")
    assert(a.forall(_.feature.length == 8))
  }

  test("transform preserves ids and updates metadata; frames carry ordinals") {
    val resized = Multimodal.applyTransform(spark, media, new Multimodal.StubResize(64, 64))
    assert(resized.count() == media.count())
    assert(resized.select($"meta.width").as[Int].collect().forall(_ <= 64))

    val frames = Multimodal.sampleFrames(spark, media, stride = 50, frameBytes = 16)
    assert(frames.count() > media.count(), "multi-frame expansion")
    val perDoc = frames.filter($"media_id" === 0)
      .select($"frame_idx").as[Long].collect().sorted
    assert(perDoc.head == 0L && perDoc.length == perDoc.last + 1, "dense ordinals")
  }
}
