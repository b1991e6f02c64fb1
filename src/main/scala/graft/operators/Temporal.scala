package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Temporal join operators Spark has no built-in for: as-of join and
  * range (interval) join, both composed from shuffle-bounded primitives
  * (brief: compose existing ops before reaching for a custom SparkPlan).
  *
  * The reference engine has neither (it has no joins at all — SURVEY.md
  * §2.2); these are the standard event-stream enrichment patterns its
  * users would need next.
  */
object Temporal {

  /** AS-OF JOIN: for every event, the most recent order of the same
    * customer at-or-before the event time (ties: latest order date, then
    * max orderkey). Events with no prior order get (-1, 0.0) sentinels.
    *
    * NOT implemented as a per-row subquery or a `t1 <= t2` theta-join
    * (quadratic): both sides merge into ONE timeline, one shuffle on the
    * customer key, one sort within partitions, and a running
    * last-non-null window carries the latest order onto each event row.
    * At 100 TB this is a single repartition + sort — the same cost as
    * any keyed aggregation over the union, regardless of how many orders
    * precede each event. Skewed keys salt like any other shuffle key. */
  def asofLatestOrder(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir).select(
      col("o_custkey").as("k"),
      unix_timestamp(col("o_orderdate")).as("t"),
      lit(1).as("is_order"),
      lit(null).cast("long").as("event_id"),
      col("o_orderkey").as("oid"),
      col("o_totalprice").as("price"))
    val events = Tables.events(spark, dir).select(
      col("user_id").as("k"),
      unix_timestamp(col("ts")).as("t"),
      lit(0).as("is_order"),
      col("event_id"),
      lit(null).cast("long").as("oid"),
      lit(null).cast("double").as("price"))
    // at equal (k, t): orders sort BEFORE events (is_order desc) so an
    // order stamped exactly at the event time is visible to it; among
    // equal-time orders the ascending oid sort makes last() pick max oid
    val timeline = Window.partitionBy("k")
      .orderBy(col("t").asc, col("is_order").desc, col("oid").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.unionByName(events)
      .withColumn("asof_oid", last(col("oid"), ignoreNulls = true).over(timeline))
      .withColumn("asof_price", last(col("price"), ignoreNulls = true).over(timeline))
      .where(col("is_order") === 0)
      .select(
        col("event_id"),
        col("k").as("user_id"),
        col("t").as("ts_sec"),
        coalesce(col("asof_oid"), lit(-1L)).as("asof_orderkey"),
        coalesce(col("asof_price"), lit(0.0)).as("asof_totalprice"))
      .orderBy("event_id")
  }

  /** Bucket width for [[eventNeighborCounts]] (seconds). */
  val RangeWindowSec = 3600L

  /** RANGE (interval) self-join: per event, how many other events fall
    * within ±1 hour — with NO equi key to bound the pair space.
    *
    * The naive formulation `|t1 - t2| <= w` is a cartesian. The scale
    * path is interval bucketing: bucket time by the window width; a pair
    * within w is always within one bucket step, so exploding the probe
    * side to (b-1, b, b+1) and EQUI-joining on the bucket covers exactly
    * the candidate space (each pair meets once — the build side's bucket
    * is unique), and the residual |Δt| <= w filter finishes. One shuffle
    * per side on the bucket key, per-bucket fan-out bounded by bucket
    * occupancy (hot buckets salt like any skewed key). Every event
    * matches itself, so zero-neighbor events survive the inner join with
    * a conditional count. */
  def eventNeighborCounts(spark: SparkSession, dir: String): DataFrame = {
    val w = RangeWindowSec
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), unix_timestamp(col("ts")).as("t"))
    val probe = ev.select(col("event_id").as("e1"), col("t").as("t1"),
        explode(expr(s"array(t div $w - 1, t div $w, t div $w + 1)")).as("b"))
    val build = ev.select(col("event_id").as("e2"), col("t").as("t2"),
      expr(s"t div $w").as("b2"))
    probe.join(build, col("b") === col("b2"))
      .where(abs(col("t1") - col("t2")) <= w)
      .groupBy(col("e1").as("event_id"))
      .agg(count(when(col("e2") =!= col("e1"), lit(1))).as("n_within_1h"))
      .orderBy("event_id")
  }
}
