package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ZOrder2
import graft.sources.{Clustering, Tables}

class ClusteringSpec extends SparkSpec {

  // --- z-order bit math ----------------------------------------------------

  test("morton interleave: hand values and round-trip identity") {
    // a=0b101 -> bits at 0,4; b=0b011 -> bits at 1,3: z = 0b011011 = 27... compute:
    // part1by1(5)=0b010001=17, part1by1(3)=0b0101=5 -> z = 17 | (5<<1) = 17|10 = 27
    assert(ZOrder2.morton(5L, 3L) === 27L)
    assert(ZOrder2.morton(0L, 0L) === 0L)
    assert(ZOrder2.morton(1L, 0L) === 1L)
    assert(ZOrder2.morton(0L, 1L) === 2L)
    for (a <- Seq(0L, 1L, 7L, 12345L, 0x7FFFFFFFL); b <- Seq(0L, 2L, 99L, 54321L, 0x7FFFFFFFL)) {
      val z = ZOrder2.morton(a, b)
      assert(z >= 0L, s"morton($a,$b) must stay non-negative")
      assert(ZOrder2.unmorton(z) === ((a, b)), s"round-trip failed for ($a,$b)")
    }
  }

  test("zorder2 is SQL-registered and codegen matches the Scala kernel") {
    val got = spark.sql("SELECT graft_zorder2(CAST(5 AS BIGINT), CAST(3 AS BIGINT)) AS z")
      .head().getLong(0)
    assert(got === 27L)
  }

  // --- data skipping -------------------------------------------------------

  /** Rows the executed scan emitted (post row-group skipping, pre the
    * exact post-scan Filter) — the honest measure of stats-based pruning. */
  private def scanOutputRows(df: DataFrame): Long = {
    df.collect() // finalize AQE so metrics are populated
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
    assert(scans.nonEmpty, "no file scan in plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  /** 32-file test copies: the fixture is tiny (6k rows → 1 row group per
    * file), so skipping granularity = files; 32 range chunks of ~190
    * rows give the stats-index resolution the 128 MiB production files
    * get from row groups/pages. */
  private def writeSorted(keys: Column*): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-sort32").toString
    Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_shipdate").cast("timestamp").cast("long").as("ship_sec"),
        Clustering.zorderScaledCol(Tables.lineitem(spark, sf0001),
          "l_partkey", "l_suppkey").as("zv"))
      .repartitionByRange(32, keys: _*)
      .sortWithinPartitions(keys: _*)
      .drop("zv")
      .write.mode("overwrite").parquet(d)
    d
  }

  test("range-clustered layout: shipdate predicate skips most files; unclustered reads all") {
    val total = Tables.lineitem(spark, sf0001).count()
    val pred = (d: DataFrame) =>
      d.where(col("ship_sec") >= lit(Clustering.epochSec("1996-01-01")) &&
          col("ship_sec") < lit(Clustering.epochSec("1996-02-01")))
        .select("l_orderkey")
    val clustered = spark.read.parquet(writeSorted(col("ship_sec"), col("l_orderkey")))
    val matching = pred(clustered).count()
    assert(matching > 0 && matching < total / 10, s"slice should be small: $matching of $total")
    val clusteredScan = scanOutputRows(pred(clustered))
    // an unordered copy of the same columns: every file spans the full
    // date range, so its min/max never exclude the predicate
    val unordered = java.nio.file.Files.createTempDirectory("graft-unord").toString
    Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"),
        col("l_shipdate").cast("timestamp").cast("long").as("ship_sec"))
      .repartition(4).write.mode("overwrite").parquet(unordered)
    val rawScan = scanOutputRows(pred(spark.read.parquet(unordered)))
    assert(rawScan > total / 2, s"unclustered scan should emit ~all rows, got $rawScan/$total")
    assert(clusteredScan < rawScan / 4,
      s"clustered scan should skip most files: $clusteredScan vs unclustered $rawScan")
  }

  test("z-ordered layout: predicates on EITHER column skip; linear sort only on its leading column") {
    val total = Tables.lineitem(spark, sf0001).count()
    // fixture key space: l_partkey 0..199, l_suppkey 0..9
    val z = spark.read.parquet(writeSorted(col("zv")))
    val partScan = scanOutputRows(z.where(col("l_partkey").between(0, 24)).select("l_orderkey"))
    val suppScan = scanOutputRows(z.where(col("l_suppkey") <= 1).select("l_orderkey"))
    assert(partScan < total / 2, s"partkey filter should skip on z-layout: $partScan/$total")
    assert(suppScan < total / 2, s"suppkey filter should skip on z-layout: $suppScan/$total")
    // a linear sort on partkey leaves suppkey unclustered: every file
    // spans ~the full suppkey range, so the suppkey predicate cannot skip
    val linear = spark.read.parquet(writeSorted(col("l_partkey")))
    val linearSuppScan = scanOutputRows(linear.where(col("l_suppkey") <= 1).select("l_orderkey"))
    assert(linearSuppScan > total / 2,
      s"partkey-sorted layout should NOT skip on suppkey: $linearSuppScan/$total")
    assert(suppScan < linearSuppScan / 2,
      s"z-order must beat linear sort on the second column: $suppScan vs $linearSuppScan")
  }

  // --- results are layout-independent --------------------------------------

  test("clustered-copy aggregations equal the same aggregation on the raw table") {
    val q62 = Clustering.shipdateRangeRevenue(spark, sf0001).collect()
    val raw62 = Tables.lineitem(spark, sf0001)
      .where(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1996-02-01"))
      .groupBy(col("l_shipdate").cast("timestamp").cast("long").as("ship_sec"))
      .agg(count(lit(1)).as("n_items"))
      .orderBy("ship_sec").collect()
    assert(q62.nonEmpty)
    assert(q62.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      raw62.map(r => (r.getLong(0), r.getLong(1))).toSeq)

    // fixture ranges (the q63 defaults target sf0.01's key space)
    val q63 = Clustering.zorderSliceStats(spark, sf0001, 0, 49, 0, 2).collect()
    val raw63 = Tables.lineitem(spark, sf0001)
      .where(col("l_partkey").between(0, 49) && col("l_suppkey").between(0, 2))
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n_items"))
      .orderBy("l_suppkey").collect()
    assert(q63.nonEmpty)
    assert(q63.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      raw63.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("file count follows the bytes/target sizing rule with a core floor") {
    val n = Clustering.numFilesFor(spark, sf0001, Seq("lineitem"))
    // local fixture is far below 128 MiB -> floor at defaultParallelism
    assert(n === spark.sparkContext.defaultParallelism)
    val path = Clustering.ensureRangeClustered(spark, sf0001)
    val files = new java.io.File(path).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files <= n && files >= 1)
  }
}
