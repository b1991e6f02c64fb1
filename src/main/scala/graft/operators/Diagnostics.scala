package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** First-class handle on the engine's `observe()` metrics — the
  * operational counters a 100 TB deployment alarms on: LSH bucket-cap
  * overflow (q29/q29c/q31/q34b — "how much duplicate mass did the cap
  * drop?"), and CLF dead-letter counts
  * ([[graft.clf.LogParser.validLinesObserved]] — "how much input failed
  * to parse?").
  *
  * `observe()` computes its aggregates ON the operator's own pass (no
  * second scan) and delivers them through the query-execution listener
  * bus after each action. This object captures the LAST value of every
  * named observation and serves it back either as a map
  * ([[lastMetrics]]) or as a small diagnostics DataFrame ([[report]]).
  * Installation is idempotent per session; operators that carry an
  * `observe` install it at plan-construction time, so any action —
  * collect, parquet write, bench noop — feeds the capture.
  *
  * Delivery is asynchronous (the listener bus), so a metric may lag its
  * action by a moment; poll [[lastMetrics]] or call
  * `spark.sparkContext.listenerBus`-flushing actions in tests. Not an
  * oracle query: metric values depend on physical execution (they count
  * what the cap DROPPED), so they are asserted by ScalaTest, not DuckDB.
  */
object Diagnostics {

  private val lastRun =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, Any]]()
  private val installed = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** Register the capture listener once per session. */
  def install(spark: SparkSession): Unit = if (installed.add(spark)) {
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          lastRun.put(name, row.schema.fieldNames.zip(row.toSeq).toMap)
        }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    })
  }

  /** The most recent run's metrics for a named observation, if any action
    * carrying it has completed. */
  def lastMetrics(name: String): Option[Map[String, Any]] =
    Option(lastRun.get(name))

  /** All captured observations as (observation, metric, value) rows — the
    * one-stop post-run health check. */
  def report(spark: SparkSession): DataFrame = {
    install(spark)
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    lastRun.asScala.toSeq
      .flatMap { case (obs, m) => m.toSeq.map { case (k, v) => (obs, k, String.valueOf(v)) } }
      .sortBy(r => (r._1, r._2))
      .toDF("observation", "metric", "value")
  }
}
