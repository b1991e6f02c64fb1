package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** One-pass-per-column data profiling — the ingest-time health report a
  * 100 TB curation pipeline runs before anything else touches a new drop
  * (row counts, null fractions, EXACT distinct cardinality, value range,
  * modal value). The reference has no profiling surface; this is the
  * operational complement the LLM-pipeline operators assume (q69's
  * mixture weights, q79's coverage curves and q84's quotas all start
  * from "what sources/langs are in this drop and how big is each").
  *
  * Shape per profiled column: groupBy(value) with map-side partial
  * counts (the value histogram), then a single-row reduction of that
  * histogram for count/nulls/distinct/min/max and an argmax for the
  * modal value. For the categorical columns a pipeline profiles, the
  * histogram is vocabulary-sized, so the shuffle carries the partial
  * aggregates, not rows; for a genuinely high-cardinality column the
  * same plan degrades to exactly the shuffle any EXACT distinct needs —
  * the sketch escape hatch is the declared-twin pattern (HLL, q2b).
  * Columns profile independently (a UNION of per-column plans), so the
  * per-column jobs schedule in parallel and a wide table profiles in
  * one wave per executor slot.
  *
  * Determinism: modal-value tie-break is the LEXICOGRAPHICALLY LARGEST
  * value among equal counts — `max(struct(cnt, v))` on the Spark side,
  * `ORDER BY cnt DESC, v DESC LIMIT 1` in the oracle (the q1 argmax
  * pattern). min/max/top evaluate on the TYPED column (numeric order
  * for numerics), cast to string only for the report row.
  */
object Profiling {

  /** Single-column profile: one row with the column's report fields. */
  private def profileOne(df: DataFrame, name: String): DataFrame = {
    val hist = df.groupBy(df(name).as("v")).agg(count(lit(1)).as("cnt"))
    hist.agg(
      lit(name).as("column_name"),
      sum("cnt").cast("long").as("n_rows"),
      coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L)).cast("long").as("n_nulls"),
      count(col("v")).cast("long").as("n_distinct"),
      min(col("v")).cast("string").as("min_val"),
      max(col("v")).cast("string").as("max_val"),
      max(when(col("v").isNotNull, struct(col("cnt"), col("v")))).as("top"))
      .select(
        col("column_name"), col("n_rows"), col("n_nulls"), col("n_distinct"),
        col("min_val"), col("max_val"),
        col("top.v").cast("string").as("top_val"),
        col("top.cnt").cast("long").as("top_cnt"))
  }

  /** q109 — profile of the `documents` table's categorical + numeric
    * metadata columns (`lang`, `source`, `n_chars`), one report row per
    * column, ordered by column name. */
  def documentsProfile(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Seq("lang", "n_chars", "source")
      .map(c => profileOne(docs, c))
      .reduce(_.unionAll(_))
      .orderBy("column_name")
  }
}
