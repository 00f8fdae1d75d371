package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkFunSuite {

  private def media = graft.Tables.load(spark, sf, "documents")
    .select(col("doc_id"), col("text").cast("binary").as("content"))

  test("feature extraction is deterministic and fixed-width") {
    val a = Multimodal.extractFeatures(media).collect()
    val b = Multimodal.extractFeatures(media).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
    assert(a.forall(_.getSeq[Double](3).length == Multimodal.StubCodec.FeatureDim))
    assert(a.forall(r => r.getLong(2) > 0)) // every doc yields frames
  }

  test("decode pipeline introduces no shuffle") {
    val plan = Multimodal.extractFeatures(media)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("frame sampling honors the stride") {
    val bytes = Array.fill[Byte](640)(1) // 10 chunks of 64
    assert(Multimodal.StubCodec.sampleFrames(bytes, 2).size == 5)
    assert(Multimodal.StubCodec.sampleFrames(bytes, 1).size == 10)
    assert(Multimodal.StubCodec.sampleFrames(Array[Byte](1, 2), 2).size == 1)
  }
}
