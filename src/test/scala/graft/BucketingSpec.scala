package graft

import org.apache.spark.sql.functions._

import graft.sources.{Bucketing, Tables}

class BucketingSpec extends SparkSpec {

  test("bucketed join: ZERO hash exchanges (counted), results equal the plain join") {
    val df = Bucketing.bucketedOrderRevenue(spark, sf0001)
    val rows = df.collect()

    // AQE has finalized the plan after collect(); the only exchange allowed
    // is the range partitioning of the final ORDER BY. Counted over the
    // actual exchange nodes (a substring test can't distinguish "none"
    // from "one hidden behind a reused stage").
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join, got:\n$plan")
    val shuffles = shuffleExchanges(df)
    import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, RangePartitioning}
    assert(shuffles.count(_.outputPartitioning.isInstanceOf[HashPartitioning]) === 0,
      s"bucketed join must not shuffle on the bucket key:\n$plan")
    assert(shuffles.count(_.outputPartitioning.isInstanceOf[RangePartitioning]) === 1,
      s"exactly the ORDER BY range exchange expected:\n$plan")

    // bucketing is physical layout only: same rows as the plain join
    val plain = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val got = rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === plain)
  }

  test("bucketed tables are reused, not rewritten, on a second call") {
    val (o, _) = Bucketing.ensureBucketed(spark, sf0001)
    val t0 = spark.table(o).inputFiles.toSeq.sorted
    Bucketing.bucketedOrderRevenue(spark, sf0001).collect()
    val t1 = spark.table(o).inputFiles.toSeq.sorted
    assert(t0 === t1, "second call must not rewrite the bucketed files")
  }

  test("bucket count is sized from data: cores floor locally, bytes-driven at scale") {
    val local = Bucketing.numBucketsFor(spark, sf0001)
    assert(local === spark.sparkContext.defaultParallelism,
      s"tiny input must floor at the core count, got $local")
    // the sizing rule itself: 100 TB of lineitem → bytes/target buckets
    val hundredTb = 100L * 1024 * 1024 * 1024 * 1024
    val buckets = math.ceil(hundredTb.toDouble / Bucketing.TargetBucketBytes).toLong
    assert(buckets === 409600L, "rule: bytes / 256 MiB target per bucket")
  }
}
