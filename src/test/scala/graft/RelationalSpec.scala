package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("approx_percentile sketch lands within 1% of the exact percentiles") {
    val exact = Relational.priceQuantiles(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getAs[Double]("q")) -> r.getAs[Double]("price_quantile")).toMap
    val approx = Relational.priceQuantilesApprox(spark, sf0001).collect()
    assert(approx.length === exact.size)
    approx.foreach { r =>
      val key = (r.getString(0), r.getAs[Double]("q"))
      val e = exact(key)
      val a = r.getAs[Double]("price_quantile_approx")
      assert(math.abs(a - e) / e <= 0.01, s"$key: approx $a vs exact $e")
    }
  }

  test("q11 plan: lineitem pre-aggregates before the join, no expand for countDistinct") {
    val df = Relational.revenueByNation(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "countDistinct expand should be gone after the pre-agg rewrite")
  }
}
