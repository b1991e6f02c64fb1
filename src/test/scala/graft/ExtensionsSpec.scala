package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingAnalytics

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long)

  test("graft_fdot is callable from SQL via SparkSessionExtensions") {
    val r = spark.sql(
      "SELECT graft_fdot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(r === 11.0)
  }

  test("graft_simhash64 is callable from SQL and matches the operator output") {
    val viaSql = spark.sql("SELECT graft_simhash64(array('hello', 'world')) AS h").head().getString(0)
    assert(viaSql.matches("[0-9a-f]{16}"))
    // same tokens, same hash — deterministic
    val again = spark.sql("SELECT graft_simhash64(array('hello', 'world')) AS h").head().getString(0)
    assert(viaSql === again)
  }

  test("graft_fdot participates in whole-stage codegen (non-constant input)") {
    val df = spark.sql(
      "SELECT graft_fdot(array(CAST(id AS DOUBLE), 2.0D), array(CAST(id AS DOUBLE), 3.0D)) AS d FROM range(5)")
    // '*(n)' prefixes mark operators inside a WholeStageCodegen stage; the
    // projection holding graft_fdot must carry one (no CodegenFallback)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("Project")), plan)
    assert(df.collect().map(_.getDouble(0)).sorted.toSeq === Seq(6.0, 7.0, 10.0, 15.0, 22.0))
  }

  test("bounded-state streaming dedup emits first event per user") {
    val input = MemoryStream[Ev](spark)
    input.addData(Seq(
      Ev(0, Timestamp.valueOf("2024-01-10 00:00:00"), 1),
      Ev(1, Timestamp.valueOf("2024-01-10 00:05:00"), 1),
      Ev(2, Timestamp.valueOf("2024-01-10 00:06:00"), 2)))
    val q = StreamingAnalytics.firstEventPerUserBounded(input.toDF())
      .writeStream.format("memory").queryName("bounded_dedup").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val users = spark.table("bounded_dedup").collect().map(_.getAs[Long]("user_id")).sorted
    assert(users.toSeq === Seq(1L, 2L))
  }
}
