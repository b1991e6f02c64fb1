package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec
import org.apache.spark.sql.execution.window.WindowExec

/** Pins VERDICT r18 item 7: every `Window.partitionBy()` /
  * `Window.orderBy` (no partition key → single-partition WindowExec) on
  * the query surface runs over a PROVABLY BOUNDED frame — a post-
  * aggregate table whose cardinality is a data-model constant (sources,
  * IVF cells), a post-`limit` top-k, a histogram of bounded buckets, or
  * a calendar-day spine — never over corpus-scale rows. The bound is
  * measured, not assumed: each query executes and the row count of the
  * shuffle stage feeding each unpartitioned WindowExec is read from AQE
  * runtime statistics and asserted against the pin.
  *
  * At 100 TB the frames grow with sources/cells/k/days — none of which
  * scale with corpus bytes — so the single partition these windows
  * execute on stays a scalar-sized reduction, the designed shape. */
class GlobalWindowBoundSpec extends SparkSpec {

  /** query → (row bound at any SF, the structural reason). */
  private val pins: Map[String, (Long, String)] = Map(
    "q77_hybrid_rrf" -> (64L, "post-limit RRF fusion lists (≤ RrfDepth rows)"),
    "q79_source_coverage" -> (64L, "groupBy(source): data-model source count"),
    "q94_surprisal_sweep" -> (256L, "surprisal histogram buckets (bits range / SweepBucket)"),
    "q115_source_drift" -> (64L, "groupBy(source)"),
    "q123_zipf_audit" -> (64L, "post-limit(ZipfTopK) rank table"),
    "q126_retrieval_eval" -> (64L, "post-top-k BM25 list (≤ k rows)"),
    "q156_source_mixture" -> (64L, "groupBy(source)"),
    "q161_epoch_plan" -> (64L, "groupBy(source)"),
    "q163_cross_source_dup_mass" -> (2048L, "source-pair table (≤ S(S+1)/2)"),
    "q165_post_dedup_mixture" -> (64L, "groupBy(source)"),
    "q166_ivf_cell_balance" -> (64L, "groupBy(cell): ≤ NumCells trained cells"),
    "q49_range_join" -> (16384L, "calendar-day spine (grows with days, not bytes)"))

  private def descend(p: SparkPlan): Seq[SparkPlan] = allPlanNodes(p)

  test("every unpartitioned window on the query surface runs over a bounded frame") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    var checked = 0
    pins.foreach { case (name, (bound, why)) =>
      val df = SparkEntry.queries(name)(spark, sf0001)
      df.collect()
      val globals = descend(df.queryExecution.executedPlan).collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(globals.nonEmpty,
        s"$name is pinned here because it HAS an unpartitioned window; plan drifted")
      globals.foreach { w =>
        checked += 1
        // rows entering the window are bounded by the FIRST cardinality-
        // bounding node below it: a limit (structural bound), an
        // aggregate (executed numOutputRows), or the feeding shuffle
        // stage (AQE runtime row count). Nodes between (Sort, Project,
        // WindowGroupLimit, joins of bounded sides) preserve or shrink
        // the bound up to a small constant factor the pins absorb.
        val rows = descend(w.child).iterator.map {
          case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec =>
            Some(BigInt(t.limit))
          case g: org.apache.spark.sql.execution.GlobalLimitExec =>
            Some(BigInt(g.limit))
          case c: org.apache.spark.sql.execution.CollectLimitExec =>
            Some(BigInt(c.limit))
          case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
              if a.groupingExpressions.nonEmpty && a.metrics.contains("numOutputRows") =>
            Some(BigInt(a.metrics("numOutputRows").value))
          case s: ShuffleQueryStageExec => s.getRuntimeStatistics.rowCount
          case _ => None
        }.collectFirst { case Some(n) => n }
        rows match {
          case Some(n) =>
            if (n > bound) failures +=
              s"$name: unpartitioned window saw $n rows > pin $bound ($why)"
          case None => failures +=
            s"$name: no bounding node below the unpartitioned window"
        }
      }
    }
    assert(checked > 0)
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
