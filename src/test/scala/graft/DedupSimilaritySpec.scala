package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

class DedupSimilaritySpec extends SparkSpec {

  test("exact dedup groups cover every document exactly once") {
    val out = Dedup.exactDedup(spark, sf0001)
    val total = out.agg(sum(col("n_copies"))).head().getLong(0)
    assert(total === 500L)
  }

  test("minhash-LSH candidates have full recall of high-Jaccard exact pairs") {
    // 16 bands × 4 rows: a pair at j≥0.9 is missed with prob (1-j⁴)^16 ≈ 1e-8
    val exact = Dedup.nearDupJaccard(spark, sf0001)
      .where(col("jaccard") >= 0.9)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(spark, sf0001)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain high-jaccard near-dups")
    assert(exact.subsetOf(lsh), s"missed: ${exact -- lsh}")
  }

  test("minhash signature similarity estimates true jaccard within 0.2 for near-dups") {
    val joined = Dedup.nearDupJaccard(spark, sf0001).as("e")
      .join(Dedup.minhashLshPairs(spark, sf0001).as("m"), Seq("d1", "d2"))
      .select(col("jaccard"), col("est_jaccard")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) <= 0.2,
        s"jaccard=${r.getDouble(0)} est=${r.getDouble(1)}")
    }
  }

  test("simhash is 16 lowercase hex chars and identical docs collide") {
    val out = Dedup.simhash(spark, sf0001).collect()
    assert(out.length === 500)
    out.foreach(r => assert(r.getString(1).matches("[0-9a-f]{16}")))
  }

  test("simhash near pairs all have hamming <= 6 and include a jaccard near-dup") {
    val pairs = Dedup.simhashNearPairs(spark, sf0001).collect()
    pairs.foreach(r => assert(r.getAs[Long]("hamming") <= 6))
    val exact = Dedup.nearDupJaccard(spark, sf0001)
      .where(col("jaccard") >= 0.95)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = pairs.map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    assert(exact.intersect(sim).nonEmpty, "0.95-jaccard dups should be simhash-near")
  }

  test("knn brute force: cosine in [-1,1], ranks 1..5 per query, no self-matches") {
    val out = Similarity.knnBrute(spark, sf0001).collect()
    assert(out.length === 25)
    out.foreach { r =>
      val cos = r.getAs[Double]("cos_sim")
      assert(cos >= -1.0000001 && cos <= 1.0000001)
      assert(r.getAs[Long]("q_id") !== r.getAs[Long]("n_id"))
    }
    val ranks = out.filter(_.getAs[Long]("q_id") == 0L).map(_.getAs[Long]("rank")).toSeq
    assert(ranks === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("ann-lsh results are a subset of the full ranking restricted to the bucket") {
    // every ANN neighbor must score <= the brute-force rank-1 neighbor
    val brute = Similarity.knnBrute(spark, sf0001)
      .where(col("rank") === 1)
      .select(col("q_id"), col("cos_sim").as("best")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ann = Similarity.annLshTop3(spark, sf0001).collect()
    assert(ann.nonEmpty)
    ann.foreach { r =>
      assert(r.getAs[Double]("cos_sim") <= brute(r.getAs[Long]("q_id")) + 1e-12)
    }
  }

  test("label centroids: 10 labels x 64 dims, components bounded by max component") {
    val out = Similarity.labelCentroids(spark, sf0001).collect()
    assert(out.length === 640)
    out.foreach(r => assert(math.abs(r.getAs[Double]("centroid")) < 1.0))
  }
}
