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

  /** RANGE (interval) self-join COUNT: per event, how many other events
    * fall within ±1 hour — with NO equi key to bound the pair space.
    *
    * Because the payload is a COUNT, the pair space never needs to
    * materialize at all: n_within(e) = cum(t_e + w) − cum(t_e − w − 1)
    * − 1, where cum(x) = number of events with t <= x. cum comes from a
    * TWO-LEVEL distributed prefix sum — per-day running counts (window
    * partitioned by day, fully parallel) plus exclusive day offsets (one
    * tiny serial window over the calendar-day domain, broadcast back) —
    * and each probe point (t ± w) reads the running total through the
    * same union-timeline/last-non-null trick as [[asofLatestOrder]],
    * partitioned by day. Total cost: two day-keyed sorts over O(n) rows —
    * independent of how DENSE the window is, where any pair-materializing
    * plan does O(n · density) work (64× the work at 8× the data; this
    * one does 8×).
    *
    * [[eventNeighborCountsBucketed]] keeps the general bucket-decomposed
    * join for range joins whose OUTPUT is pairs (payloads, not counts);
    * TemporalSpec proves both against the naive cartesian. */
  def eventNeighborCounts(spark: SparkSession, dir: String): DataFrame = {
    val w = RangeWindowSec
    val day = 86400L
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), unix_timestamp(col("ts")).as("t"))

    // ---- two-level distributed prefix sum (no global single-task sort):
    // level 1: per-day running counts (window PARTITIONED by day — parallel)
    val dist = ev.groupBy(col("t")).agg(count(lit(1)).as("cnt"))
      .withColumn("day", expr(s"t div $day"))
      .withColumn("wcum", sum(col("cnt")).over(
        Window.partitionBy("day").orderBy("t")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // level 2: exclusive day-offsets over the DENSE day domain (tiny —
    // one row per calendar day, the only serial window in the plan; its
    // size is bounded by CALENDAR SPAN, ~37k rows for a century, never by
    // data volume — so unlike q71's bucket totals it never needs
    // PrefixSum.exclusive's auto-stacked levels). The
    // domain bounds stay IN-PLAN: a one-row min/max aggregate feeds
    // sequence()/explode for the dense days and broadcasts onto the probe
    // rows for clamping — DataFrame construction is fully lazy (no eager
    // bounds job), and an empty events table flows through as an empty
    // sequence → empty result instead of needing a guard.
    val bounds = dist.agg(
      (min(col("day")) - 1L).as("lo"), (max(col("day")) + 1L).as("hi"))
    val dayTotals = dist.groupBy(col("day")).agg(sum(col("cnt")).as("tot"))
    val denseDays = bounds
      .select(explode(expr("sequence(lo, hi)")).as("day"))
      .join(dayTotals, Seq("day"), "left")
      .withColumn("tot", coalesce(col("tot"), lit(0L)))
      .withColumn("off", coalesce(sum(col("tot")).over(
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("day"), col("off"))

    // data rows carry their within-day running count; probe rows (two per
    // event, at t±w bounds, clamped into the dense day domain by the
    // broadcast one-row bounds) resolve as-of WITHIN their day — data
    // rows sort first at equal t, so a probe exactly on a data timestamp
    // includes it
    val dataRows = dist.select(col("day"), col("t"),
      lit(null).cast("long").as("event_id"), lit(null).cast("string").as("bound"),
      col("wcum"))
    val probeRows = ev.crossJoin(broadcast(bounds)) // 1-row scalar broadcast
      .select(col("event_id"), col("t"), col("lo"), col("hi"),
        explode(expr(s"array(named_struct('pt', t + $w, 'bound', 'hi')," +
          s" named_struct('pt', t - $w - 1, 'bound', 'lo'))")).as("p"))
      .select(
        greatest(least(expr(s"p.pt div $day"), col("hi")), col("lo")).as("day"),
        col("p.pt").as("t"), col("event_id"), col("p.bound").as("bound"),
        lit(null).cast("long").as("wcum"))
    val inDay = Window.partitionBy("day")
      .orderBy(col("t").asc, col("event_id").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dataRows.unionByName(probeRows)
      .withColumn("wcum_at", last(col("wcum"), ignoreNulls = true).over(inDay))
      .where(col("event_id").isNotNull)
      .join(broadcast(denseDays), "day")
      .withColumn("cum_at", col("off") + coalesce(col("wcum_at"), lit(0L)))
      .groupBy(col("event_id"))
      .agg((max(when(col("bound") === "hi", col("cum_at")))
        - max(when(col("bound") === "lo", col("cum_at"))) - 1L).as("n_within_1h"))
      .orderBy("event_id")
  }

  /** General bucket-decomposed range join — the tool for range joins
    * whose output is PAIRS (the count-only query above never needs it).
    * Bucket time by the window width; a pair within w is always within
    * one bucket step, so exploding the probe side to (b-1, b, b+1) and
    * EQUI-joining on the bucket covers exactly the candidate space (each
    * pair meets once — the build side's bucket is unique), and the
    * residual |Δt| <= w filter finishes. One shuffle per side on the
    * bucket key; hot buckets salt like any skewed key. */
  def eventNeighborCountsBucketed(spark: SparkSession, dir: String): DataFrame = {
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
