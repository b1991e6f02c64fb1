package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.EventAnalytics

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  /** Hand-computed micro-dataset written as a parquet `events` table so the
    * operator under test runs its real scan path. Window boundary: 31-day
    * epoch-aligned windows here start 2023-12-25T00:00Z (index 636) and
    * 2024-01-25T00:00Z (index 637) — SURVEY.md §0 epoch alignment. */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-events").toString
    val rows = Seq(
      // (event_id, ts, user_id, event_type, value, props)
      (0L, "2024-01-10 00:00:00", 1L, "view", Some(10.0), """{"k": 1}"""),
      (1L, "2024-01-10 00:10:00", 1L, "view", Some(20.0), """{"k": 2}"""),
      (2L, "2024-01-23 23:59:59", 2L, "click", None, """{"k": 3}"""),
      (3L, "2024-01-24 00:00:00", 2L, "click", Some(7.0), """{"k": 4}"""),
      (4L, "2024-01-25 00:00:00", 3L, "view", Some(8.0), """{"k": 5}"""),  // exactly on the boundary → window 2
      (5L, "2024-01-25 00:00:01", 3L, "view", Some(9.0), """{"k": 6}"""))
      .toDF("event_id", "raw_ts", "user_id", "event_type", "value", "props")
      // driver data stores ts as TIMESTAMP(NANOS); Tables.events reads it
      // as a nanos BIGINT — mimic that encoding here
      .withColumn("ts", expr("unix_micros(to_timestamp(raw_ts)) * 1000")).drop("raw_ts")
    rows.write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("busiest user per window: window-scoped counts, larger-user tie-break") {
    val out = EventAnalytics.busiestUserPerWindow(spark, dir).collect()
    assert(out.length === 2)
    // window 1 (2023-12-25): users 1 and 2 both have 2 → tie → larger id 2
    assert(out(0).getAs[Long]("user_id") === 2L && out(0).getAs[Long]("cnt") === 2L)
    // window 2 (2024-01-25): user 3 has 2
    assert(out(1).getAs[Long]("user_id") === 3L && out(1).getAs[Long]("cnt") === 2L)
  }

  test("busiest user tie-break is deterministic: equal counts pick larger user_id") {
    val d2 = java.nio.file.Files.createTempDirectory("graft-tie").toString
    Seq(
      (0L, "2024-01-10 00:00:00", 5L, "view", Some(1.0), "{}"),
      (1L, "2024-01-10 00:00:01", 9L, "view", Some(1.0), "{}"))
      .toDF("event_id", "raw_ts", "user_id", "event_type", "value", "props")
      // driver data stores ts as TIMESTAMP(NANOS); Tables.events reads it
      // as a nanos BIGINT — mimic that encoding here
      .withColumn("ts", expr("unix_micros(to_timestamp(raw_ts)) * 1000")).drop("raw_ts")
      .write.mode("overwrite").parquet(s"$d2/events.parquet")
    val out = EventAnalytics.busiestUserPerWindow(spark, d2).collect()
    assert(out.head.getAs[Long]("user_id") === 9L)
  }

  test("unique users per window") {
    val out = EventAnalytics.uniqueUsersPerWindow(spark, dir).collect()
    assert(out.map(_.getAs[Long]("uniq_users")).toSeq === Seq(2L, 1L))
  }

  test("q2b band gate: exact leg equals q2, HLL verdict matches an independent recompute") {
    val exact = EventAnalytics.uniqueUsersPerWindow(spark, sf0001).collect()
      .map(r => r.getAs[Long]("w_start") -> r.getAs[Long]("uniq_users")).toMap
    val approx = graft.sources.Tables.events(spark, sf0001)
      .groupBy(expr("CAST(FLOOR(unix_seconds(ts)/2678400)*2678400 AS BIGINT)").as("w_start"))
      .agg(expr("approx_count_distinct(user_id)").as("a")).collect()
      .map(r => r.getAs[Long]("w_start") -> r.getAs[Long]("a")).toMap
    val gated = EventAnalytics.uniqueUsersApproxPerWindow(spark, sf0001).collect()
    assert(gated.length === exact.size)
    gated.foreach { r =>
      val w = r.getAs[Long]("w_start")
      assert(r.getAs[Long]("uniq_users_exact") === exact(w), s"exact leg diverges at $w")
      assert(r.getAs[Boolean]("hll_within_10pct")
        === (math.abs(approx(w) - exact(w)) * 10 <= exact(w)),
        s"band verdict disagrees with independent recompute at $w")
      assert(r.getAs[Boolean]("hll_within_10pct"), s"HLL out of 10% band at $w")
    }
  }

  test("avg value floor: nulls count as zero in numerator AND denominator") {
    val out = EventAnalytics.avgValuePerWindow(spark, dir).collect()
    // window 1: values 10,20,null→0,7 over n=4 → floor(37/4)=9
    assert(out(0).getAs[Long]("avg_value_floor") === 9L)
    assert(out(0).getAs[Long]("n_events") === 4L)
    // window 2: 8,9 over n=2 → floor(17/2)=8
    assert(out(1).getAs[Long]("avg_value_floor") === 8L)
  }

  test("window boundary: event exactly at 2024-01-25T00:00:00Z lands in the second window") {
    val out = EventAnalytics.busiestUserPerWindow(spark, dir).collect()
    // 637 * 2678400 = 1706140800 = 2024-01-25T00:00:00Z
    assert(out(1).getAs[Long]("w_start") === 1706140800L)
  }

  test("first event per user is (ts, event_id)-deterministic") {
    val out = EventAnalytics.firstEventPerUser(spark, dir).collect()
    assert(out.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("first_event_id"))).toSeq
      === Seq((1L, 0L), (2L, 2L), (3L, 4L)))
  }

  test("q125: funnel enforces stage ORDER, not mere presence; report matches a drop-off fixture") {
    import spark.implicits._
    // A: full ordered conversion; B: purchase BEFORE any view (must not
    // count as converted past the view stage, though a later click
    // does); C: view only; D: click with no view (never enters the
    // funnel past stage 1); E: view -> purchase but no click between
    // (purchase must NOT count without the click stage)
    val fixture = Seq(
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      (2L, "purchase", 50L), (2L, "view", 100L), (2L, "click", 150L),
      (3L, "view", 100L),
      (4L, "click", 100L),
      (5L, "view", 100L), (5L, "purchase", 200L))
      .toDF("user_id", "event_type", "us")
    val out = EventAnalytics.funnelOf(fixture).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, "all_users", 5L, 1000L),
      (2L, "viewed", 4L, 800L),            // A, B, C, E (not D)
      (3L, "clicked_after_view", 2L, 500L), // A; B's click follows B's view
      (4L, "purchased_after_click", 1L, 500L))) // A only: B bought too early, E never clicked
    // the graded corpus leg stays hash-gated via the oracle; here pin
    // only the structural invariant that stages never grow
    val corpus = EventAnalytics.funnel(spark, sf0001).collect()
      .map(_.getLong(2))
    assert(corpus.zip(corpus.tail).forall { case (a, b) => b <= a })
  }

  test("global reference-parity aggregate equals whole-input analytics") {
    val r = EventAnalytics.globalReferenceParity(spark, dir).head()
    assert(r.getAs[Long]("busiest_user") === 3L) // 1 and 3 tie at 2 → larger id
    assert(r.getAs[Long]("uniq_users") === 3L)
    assert(r.getAs[Long]("avg_value_floor") === 9L) // floor(54/6)
    assert(r.getAs[Long]("n_events") === 6L)
  }
}
