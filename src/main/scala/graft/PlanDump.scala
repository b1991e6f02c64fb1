package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Measurement tool (optimization rounds): writes `.explain("formatted")`
  * for every declared query to a directory, one file per query, so plan
  * claims (exchange counts, join strategies, PushedFilters/ReadSchema)
  * are auditable without running Spark.
  *
  * Usage: `sbt "runMain graft.PlanDump <outDir> [suffix]"` — files land
  * as `<outDir>/<query><suffix>.txt` (suffix e.g. "_before"/"_after").
  * `SPARK_GRAFT_PLAN_ONLY=q10_...,q11_...` filters; `SPARK_GRAFT_SF_DIR`
  * and `SPARK_GRAFT_CPUS` as in Bench. Building a query's DataFrame may
  * provision its build-once artifact (the same warm-artifact plan shape
  * the bench times) — that is the plan worth auditing. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r18")
    val suffix = if (args.length > 1) args(1) else ""
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.get("SPARK_GRAFT_PLAN_ONLY").map(_.split(',').toSet)
    // extra session confs, "k=v;k=v" — e.g. spark.graft.bnljBarrier=false
    // to dump a rule-off "before" twin
    val extraConf = sys.env.get("SPARK_GRAFT_PLAN_CONF").toSeq
      .flatMap(_.split(';')).map(_.split("=", 2)).collect { case Array(k, v) => (k, v) }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    extraConf.foreach { case (k, v) => spark.conf.set(k, v) }
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/$name$suffix.txt"),
            plan.getBytes("UTF-8"))
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
