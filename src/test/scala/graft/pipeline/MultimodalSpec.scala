package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, partition-batched decode (stub codec),
  * frame-sample explosion — distribution-correct even with fake decoding. */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.syntheticMedia(spark, 300).cache()

  test("feature extraction is a narrow per-partition map with stable output") {
    val f1 = Multimodal.extractFeatures(media, dim = 16).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(media, dim = 16).orderBy("media_id").collect()
    assert(f1.length === 300)
    assert(f1.forall(r => r.getSeq[Float](r.fieldIndex("features")).length === 16))
    assert(f1.map(r => r.getSeq[Float](r.fieldIndex("features")).toList).toSeq ===
      f2.map(r => r.getSeq[Float](r.fieldIndex("features")).toList).toSeq) // deterministic stub
    // narrow plan: no shuffle exchange before the map
    val plan = Multimodal.extractFeatures(media, 16).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("frame sampling explodes one row per sampled frame") {
    val frames = Multimodal.sampleFrames(media, everyN = 10)
    val perVideo = frames.groupBy("media_id").count().collect()
    assert(perVideo.forall(_.getAs[Long]("count") === 3)) // frames 0,10,20 of 30
    assert(frames.where(col("frame_idx") % 10 =!= 0).count() === 0)
  }

  test("resize rewrites meta but keeps bytes and schema") {
    val r = Multimodal.resize(media, 32, 24)
    assert(r.schema === media.schema)
    assert(r.select("meta.width").distinct().collect().head.getInt(0) === 32)
  }
}
