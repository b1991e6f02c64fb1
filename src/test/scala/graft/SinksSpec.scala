package graft

import org.apache.spark.sql.functions._

import graft.sources.{Artifacts, Sinks, Tables}

class SinksSpec extends SparkSpec {

  test("Artifacts.isBuilt: absent → false, committed write → true, torn write (no _SUCCESS) → false") {
    val base = java.nio.file.Files.createTempDirectory("graft_artifacts").toString
    val path = base + "/a"
    assert(!Artifacts.isBuilt(spark, path), "unbuilt path must probe false")
    spark.range(3).write.mode("overwrite").parquet(path)
    assert(Artifacts.isBuilt(spark, path), "committed parquet dir must probe true")
    // simulate a torn write: data files present, committer marker gone
    assert(new java.io.File(path, "_SUCCESS").delete())
    assert(!Artifacts.isBuilt(spark, path), "torn write must probe false (rebuild)")
  }

  test("date-partitioned read is partition-pruned to the one requested directory") {
    val df = Sinks.dailyActivity(spark, sf0001, "2024-01-15")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_date"),
      s"scan should carry a partition filter on event_date:\n$plan")
    // the executed scan's metrics reflect actual pruning: the 30-day table
    // has 30 partition dirs with one file each; a one-day read opens 1
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case s: QueryStageExec => allNodes(s.plan)
      case _ => p.children.flatMap(allNodes)
    })
    val scans = allNodes(df.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.head.metrics("numFiles").value === 1L,
      s"expected 1 pruned file, read ${scans.head.metrics("numFiles").value}")
  }

  test("partitioned-copy aggregation equals the same aggregation on the original table") {
    val got = Sinks.dailyActivity(spark, sf0001, "2024-01-15").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val plain = Tables.events(spark, sf0001)
      .where(to_date(col("ts")) === lit("2024-01-15"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("u"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === plain)
    assert(got.nonEmpty, "fixture should have events on 2024-01-15")
  }

  test("one file per date partition (no small-file explosion)") {
    val path = Sinks.ensurePartitionedEvents(spark, sf0001)
    val perDate = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("event_date="))
      .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
    assert(perDate.nonEmpty)
    perDate.foreach { case (d, n) => assert(n === 1, s"$d has $n files") }
  }
}
