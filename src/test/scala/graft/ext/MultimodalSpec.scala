package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  test("decode plumbing: deterministic stub features for every payload") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == media.count())
    // Deterministic: two runs produce identical checksums.
    val again = Multimodal.extractFeatures(media).collect()
    assert(feats.map(f => f.doc_id -> f.checksum).toMap ==
      again.map(f => f.doc_id -> f.checksum).toMap)
    feats.foreach { f =>
      assert(f.width >= 1 && f.width <= 256)
      assert(f.frames >= 1)
    }
  }

  test("mapPartitions decode preserves partitioning (no shuffle, no collect)") {
    val media = Multimodal.mediaFromDocuments(spark, sf).repartition(7)
    val out = Multimodal.extractFeatures(media)
    assert(out.rdd.getNumPartitions == 7)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"decode should not introduce a shuffle:\n$plan")
  }

  test("frame sampling: stride-2 keeps every other 256-byte chunk") {
    import spark.implicits._
    val one = Seq(Multimodal.Media(1L, Array.fill[Byte](1000)(65))).toDS()
    val frames = Multimodal.sampleFrames(one, stride = 2).collect()
    // chunks: 0..3 (256,256,256,232 bytes) -> sampled frame_no 0, 2
    assert(frames.map(_.getAs[Int]("frame_no")).toSeq.sorted == Seq(0, 2))
  }
}
