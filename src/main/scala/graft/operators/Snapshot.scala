package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Snapshot differencing (CDC-style change capture) — given two versions
  * of a keyed table, emit the insert/update/delete delta. A 100 TB
  * training corpus is rebuilt incrementally, so "what changed between
  * yesterday's snapshot and today's" is a first-class pipeline operator:
  * the delta feeds incremental dedup, re-embedding, and eval refresh
  * instead of reprocessing the full corpus.
  *
  * The test harness has one `events` table, so the two snapshots are
  * carved from it deterministically (pure functions of event_id — the
  * oracle re-derives the identical versions in SQL):
  * `event_id % 10 == 7` exists only in the new snapshot (inserts),
  * `% 10 == 3` only in the old (deletes), `% 5 == 0` gets `value + 1.0`
  * in the new (updates; +1.0 is an exact IEEE op, so the changed bits
  * are identical cross-engine). Everything else is unchanged and must
  * NOT appear in the output.
  */
object Snapshot {

  /** q67 — full-outer join on the key, classify, keep changed rows only.
    *
    * Scale shape: ONE shuffle per side, both keyed on `event_id`, then a
    * co-partitioned merge — no broadcast (both snapshots are corpus-sized)
    * and no pair amplification (the key is unique per side, so the join is
    * 1:1). At 100 TB both snapshots would live bucketed by key (the q46
    * layout), making the diff entirely shuffle-free; AQE's skew split
    * covers pathological key distributions in the unbucketed case. Output
    * is only the changed rows — the downstream incremental pipeline never
    * sees the unchanged bulk.
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_id"), col("event_type"), col("value"))
    val prev = ev.where(pmod(col("event_id"), lit(10)) =!= 7)
      .select(col("event_id"), col("event_type").as("old_type"), col("value").as("old_value"))
    val next = ev.where(pmod(col("event_id"), lit(10)) =!= 3)
      .select(col("event_id"), col("event_type").as("new_type"),
        when(pmod(col("event_id"), lit(5)) === 0, col("value") + lit(1.0d))
          .otherwise(col("value")).as("new_value"))
    prev.join(next, Seq("event_id"), "full_outer")
      .withColumn("change",
        when(col("new_type").isNull, lit("D"))
          .when(col("old_type").isNull, lit("I"))
          .when(col("old_value") =!= col("new_value") || col("old_type") =!= col("new_type"), lit("U")))
      .where(col("change").isNotNull)
      .select(col("event_id"), col("change"), col("old_value"), col("new_value"))
      .orderBy("event_id")
  }
}
