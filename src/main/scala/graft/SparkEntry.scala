package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every oracle-checked query obeys the determinism rules of FIXTURES.md
  * §B.4: exact-decimal sums (order-free), BIGINT epoch seconds instead of
  * timestamps, explicit tie-breaks, and a final ORDER BY mirrored in the
  * DuckDB SQL. Column names match between Spark and SQL exactly.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EventAnalytics.busiestUserPerWindow(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Reference parity (events table; SURVEY.md §2.1 rows 13–17)
    "q1_busiest_user"     -> ((s, d) => EventAnalytics.busiestUserPerWindow(s, d)),
    "q2_unique_users"     -> ((s, d) => EventAnalytics.uniqueUsersPerWindow(s, d)),
    "q2b_unique_users_approx" -> ((s, d) => EventAnalytics.uniqueUsersApproxPerWindow(s, d)),
    "q3_avg_value"        -> ((s, d) => EventAnalytics.avgValuePerWindow(s, d)),
    "q4_global_parity"    -> ((s, d) => EventAnalytics.globalReferenceParity(s, d)),
    "q5_sliding_activity" -> ((s, d) => EventAnalytics.slidingActivity(s, d)),
    "q6_session_stats"    -> ((s, d) => EventAnalytics.sessionStats(s, d)),
    "q7_first_event_per_user" -> ((s, d) => EventAnalytics.firstEventPerUser(s, d)),
    "q8_json_props_sum"   -> ((s, d) => EventAnalytics.jsonPropsSum(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_busiest_user" ->
      """WITH c AS (
        |  SELECT CAST(FLOOR(EPOCH(ts)/2678400)*2678400 AS BIGINT) AS w_start, user_id, COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT w_start, user_id, cnt FROM (
        |  SELECT w_start, user_id, cnt,
        |         ROW_NUMBER() OVER (PARTITION BY w_start ORDER BY cnt DESC, user_id DESC) AS rn
        |  FROM c) t
        |WHERE rn = 1 ORDER BY w_start""".stripMargin,
    "q2_unique_users" ->
      """SELECT CAST(FLOOR(EPOCH(ts)/2678400)*2678400 AS BIGINT) AS w_start,
        |       COUNT(DISTINCT user_id) AS uniq_users
        |FROM events GROUP BY 1 ORDER BY w_start""".stripMargin,
    "q3_avg_value" ->
      """SELECT CAST(FLOOR(EPOCH(ts)/2678400)*2678400 AS BIGINT) AS w_start,
        |       CAST(FLOOR(CAST(SUM(CAST(COALESCE(value, 0) AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) AS BIGINT) AS avg_value_floor,
        |       COUNT(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY w_start""".stripMargin,
    "q4_global_parity" ->
      """WITH per_user AS (
        |  SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1),
        |top AS (
        |  SELECT user_id AS busiest_user, cnt AS busiest_cnt FROM per_user
        |  ORDER BY cnt DESC, user_id DESC LIMIT 1),
        |g AS (
        |  SELECT COUNT(DISTINCT user_id) AS uniq_users,
        |         CAST(FLOOR(CAST(SUM(CAST(COALESCE(value, 0) AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) AS BIGINT) AS avg_value_floor,
        |         COUNT(*) AS n_events
        |  FROM events)
        |SELECT busiest_user, busiest_cnt, uniq_users, avg_value_floor, n_events FROM top, g""".stripMargin,
    "q5_sliding_activity" ->
      """WITH e AS (SELECT CAST(FLOOR(EPOCH(ts)/86400) AS BIGINT) AS d, user_id FROM events),
        |x AS (SELECT (d - s.i)*86400 AS w_start, user_id
        |      FROM e CROSS JOIN (SELECT unnest(range(0,7)) AS i) s)
        |SELECT w_start, COUNT(*) AS cnt, COUNT(DISTINCT user_id) AS uniq_users
        |FROM x GROUP BY 1 ORDER BY w_start""".stripMargin,
    "q6_session_stats" ->
      """WITH o AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |         CASE WHEN LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) >= 1800000000
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (
        |  SELECT user_id, us,
        |         SUM(brk) OVER (PARTITION BY user_id ORDER BY us ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM o)
        |SELECT user_id, MIN(us) AS sess_start_us, COUNT(*) AS n_events
        |FROM s GROUP BY user_id, sid ORDER BY user_id, sess_start_us""".stripMargin,
    "q7_first_event_per_user" ->
      """SELECT user_id, event_id AS first_event_id, epoch_us(ts) AS first_ts_us,
        |       event_type AS first_event_type
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |      FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q8_json_props_sum" ->
      """SELECT event_type,
        |       CAST(SUM(CAST(regexp_extract(props, '"k": *(-?\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        |       COUNT(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
  )
}
