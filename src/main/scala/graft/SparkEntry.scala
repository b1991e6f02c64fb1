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
    // Relational surface (TPC-H-ish; SURVEY.md §2.2 joins/aggs/sorts/set-ops)
    "q10_pricing_summary" -> ((s, d) => Relational.pricingSummary(s, d)),
    "q11_revenue_by_nation" -> ((s, d) => Relational.revenueByNation(s, d)),
    "q12_top_orders"      -> ((s, d) => Relational.topOrders(s, d)),
    "q13_priority_top3"   -> ((s, d) => Relational.priorityTop3(s, d)),
    "q14_rollup_returns"  -> ((s, d) => Relational.rollupReturns(s, d)),
    "q15_set_ops"         -> ((s, d) => Relational.setOpsCustomers(s, d)),
    "q16_customers_without_orders" -> ((s, d) => Relational.customersWithoutOrders(s, d)),
    "q17_customers_with_open_orders" -> ((s, d) => Relational.customersWithOpenOrders(s, d)),
    "q18_orders_per_month" -> ((s, d) => Relational.ordersPerMonth(s, d)),
    "q19_status_by_year"  -> ((s, d) => Relational.statusByYear(s, d)),
    "q20_above_avg_parts" -> ((s, d) => Relational.aboveAvgParts(s, d)),
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
    "q10_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_charge,
        |  ROUND(CAST(ROUND(SUM(CAST(l_discount AS DECIMAL(18,4))), 4) AS DOUBLE)/COUNT(*), 6) AS avg_disc,
        |  CAST(FLOOR(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*)) AS BIGINT) AS avg_qty_floor,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q11_revenue_by_nation" ->
      """SELECT r_name, n_name,
        |  CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue,
        |  COUNT(DISTINCT o_orderkey) AS n_orders,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q12_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q13_priority_top3" ->
      """SELECT o_orderpriority, rank_in_priority, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority,
        |         ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rank_in_priority,
        |         o_orderkey, o_totalprice
        |  FROM orders) t
        |WHERE rank_in_priority <= 3 ORDER BY o_orderpriority, rank_in_priority""".stripMargin,
    "q14_rollup_returns" ->
      """SELECT CASE WHEN GROUPING(l_returnflag)=1 THEN '(all)' ELSE l_returnflag END AS returnflag,
        |       CASE WHEN GROUPING(l_linestatus)=1 THEN '(all)' ELSE l_linestatus END AS linestatus,
        |       COUNT(*) AS n,
        |       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q15_set_ops" ->
      """SELECT c_custkey FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT
        |  SELECT c_custkey FROM customer WHERE c_acctbal < 0
        |) t ORDER BY c_custkey""".stripMargin,
    "q16_customers_without_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q17_customers_with_open_orders" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,
    "q18_orders_per_month" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |       regexp_replace(o_orderpriority, '^\d-', '') AS priority,
        |       COUNT(*) AS n_orders,
        |       COUNT(DISTINCT o_custkey) AS n_customers,
        |       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
        |FROM orders GROUP BY 1,2 ORDER BY month, priority""".stripMargin,
    "q19_status_by_year" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        |  CAST(SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |  CAST(SUM(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending,
        |  COUNT(*) AS n_total
        |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin,
    "q20_above_avg_parts" ->
      """SELECT p_brand, COUNT(*) AS n_above, MIN(p_partkey) AS min_partkey
        |FROM part
        |WHERE p_retailprice > (SELECT CAST(ROUND(SUM(CAST(p_retailprice AS DECIMAL(18,2))), 2) AS DOUBLE)/COUNT(*) FROM part)
        |GROUP BY 1 ORDER BY p_brand""".stripMargin,
  )
}
