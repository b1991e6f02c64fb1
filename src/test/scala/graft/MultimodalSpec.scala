package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("synthesized media has the declared schema") {
    val m = Multimodal.synthesizeMedia(spark, sf0001)
    assert(m.schema("payload").dataType.typeName === "binary")
    assert(m.schema("meta").dataType.typeName === "struct")
    assert(m.count() === 500)
  }

  test("feature extraction is deterministic and batch-shaped") {
    val f1 = Multimodal.mediaFeatures(spark, sf0001).collect()
    val f2 = Multimodal.mediaFeatures(spark, sf0001).collect()
    assert(f1.length === 500)
    assert(f1.map(_.toSeq).toSeq === f2.map(_.toSeq).toSeq)
    f1.foreach { r =>
      val mean = r.getAs[Double]("mean_pixel")
      assert(mean >= 0 && mean <= 255)
      assert(r.getAs[Long]("payload_bytes") > 0)
      assert(r.getAs[Int]("n_sampled_frames") > 0)
    }
  }

  test("feature extraction stays in the Dataset plan: no RDD hop, scan pruned") {
    val df = Multimodal.mediaFeatures(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // the old .rdd + createDataFrame shape shows up as "Scan ExistingRDD"
    assert(!plan.contains("ExistingRDD"), "feature extraction must not leave the Dataset plan")
    assert(plan.contains("MapPartitions"), "decode kernel should be a typed mapPartitions")
    // column pruning reaches the parquet scan through the typed boundary
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("doc_id") && !scan.contains("lang"),
      s"scan should read only the projected columns, got: $scan")
  }

  test("frame sampling: even spacing, degenerate cases") {
    assert(Multimodal.frameOffsets(0, 5).isEmpty)
    assert(Multimodal.frameOffsets(3, 5).toSeq === Seq(0, 1, 2))
    assert(Multimodal.frameOffsets(30, 5).toSeq === Seq(0, 6, 12, 18, 24))
  }
}
