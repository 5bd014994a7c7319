package graft

import graft.multimodal.MediaPipeline
import org.scalatest.funsuite.AnyFunSuite

class MediaPipelineSpec extends AnyFunSuite {
  import TestSpark._

  test("media frame has the opaque-binary + typed-metadata schema") {
    val df = MediaPipeline.mediaFrame(spark, sf0001)
    assert(df.schema("content").dataType.typeName == "binary")
    assert(df.count() == 500)
  }

  test("stub decode yields normalized 16-bin histograms") {
    val feats = MediaPipeline.withFeatures(MediaPipeline.mediaFrame(spark, sf0001))
      .select("features").collect().map(_.getSeq[Float](0))
    assert(feats.forall(_.length == 16))
    // histogram over ascii text normalizes to mass ~1
    assert(feats.forall(f => math.abs(f.sum - 1f) < 1e-3))
  }

  test("resize re-bins 16 -> 4 preserving mass; pipeline aggregates per kind") {
    val out = MediaPipeline.pipeline(spark, sf0001).collect()
    assert(out.map(_.getAs[String]("kind")).toSet == Set("image", "audio"))
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("avg_mass") - 1.0) < 1e-2)
      assert(r.getAs[Long]("n_media") == 250)
    }
  }

  test("decode stub is deterministic") {
    val a = MediaPipeline.pipeline(spark, sf0001).collect().map(_.toString).toSeq
    val b = MediaPipeline.pipeline(spark, sf0001).collect().map(_.toString).toSeq
    assert(a == b)
  }
}
