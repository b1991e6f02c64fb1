package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (UTC, small shuffle fan-out). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  val sf0001 = "/root/testdata/sf0.001"

  /** Every physical node of a finalized plan, descending through the AQE
    * wrapper and materialized query stages (children of those wrappers
    * are invisible to a plain `collect` over the outer plan). */
  protected def allPlanNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p +: (p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      allPlanNodes(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => allPlanNodes(s.plan)
    case _ => p.children.flatMap(allPlanNodes)
  })

  /** Executes `df` (finalizing any adaptive plan) and returns the shuffle
    * exchanges it actually ran — COUNTED plan evidence, not a substring
    * match over the plan string. */
  protected def shuffleExchanges(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike] = {
    df.collect()
    allPlanNodes(df.queryExecution.executedPlan)
      .collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e }
  }

  /** Deletes every build-once warehouse artifact fingerprinted to `dir`
    * (catalog entries first — the LSH band index is a saveAsTable — then
    * the paths). Specs that run queries against a throwaway input dir
    * MUST call this, or each suite run leaks a fresh set of
    * never-read-again artifacts into /tmp/graft_warehouse — exactly the
    * accumulation the bench artifact-read adjudication watches for. */
  protected def cleanupWarehouseFor(dir: String): Unit = {
    val sanitized = dir.replaceAll("[^A-Za-z0-9]", "_")
    if (spark.catalog.databaseExists("graft_lsh"))
      spark.sql("SHOW TABLES IN graft_lsh").collect()
        .map(_.getString(1)).filter(_.contains(sanitized.toLowerCase))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS graft_lsh.`$t`"))
    val wh = new java.io.File(graft.sources.Artifacts.Warehouse)
    Option(wh.list()).getOrElse(Array.empty[String]).filter(_.contains(sanitized))
      .foreach(e => graft.sources.Artifacts.deleteIfExists(
        spark, s"${graft.sources.Artifacts.Warehouse}/$e"))
  }
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .withExtensions(new graft.functions.GraftExtensions)
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-tests")
    .getOrCreate()
}
