package graft

import java.nio.file.Files

import graft.clf.{LogAnalysisJob, LogParser}

/** End-to-end CLF job over a real text file — the reference's full
  * pipeline shape (file source → parse → three analytics). */
class LogAnalysisJobSpec extends SparkSpec {

  // a directory, not a bare file: readStream.text requires a directory
  private lazy val path: String = {
    val d = Files.createTempDirectory("clf")
    Files.write(d.resolve("access.log"), LogParser.FixtureLines.mkString("\n").getBytes)
    d.toString
  }

  test("text-file source + parse: 5 valid rows from the fixture file") {
    assert(LogAnalysisJob.readClf(spark, path).count() === 5)
  }

  test("typed Dataset[LogLine] view round-trips the schema") {
    val ds = LogAnalysisJob.typedLines(spark, path)
    val hosts = ds.collect().map(_.host).sorted
    assert(hosts.length === 5)
    assert(hosts.contains("proxy.example.org"))
    assert(ds.head().raw.nonEmpty)
  }

  test("Q1 busiest host with intended timestamps: windows split at 1995-08-20T00:00Z") {
    val valid = LogAnalysisJob.readClf(spark, path)
    val q1 = LogAnalysisJob.busiestHost(valid, "date").collect()
    // window 301 (ends 1995-08-20T00:00Z): three hosts tie at 1 → largest
    // host string wins; window 302: proxy (03:59:59Z) and host01 (04:00Z)
    // tie → 'proxy...' > 'host01...'
    assert(q1.length === 2)
    assert(q1(0).getAs[String]("host") === "host02.example.net")
    assert(q1(1).getAs[String]("host") === "proxy.example.org")
  }

  test("Q2/Q3 over the fixture: per-window unique hosts and truncating average") {
    val valid = LogAnalysisJob.readClf(spark, path)
    val q2 = LogAnalysisJob.uniqueHosts(valid, "date").collect()
    // host01 is active in BOTH windows: 3 + 2 distinct-per-window
    assert(q2.map(_.getAs[Long]("uniq_hosts")).toSeq === Seq(3L, 2L))
    val q3 = LogAnalysisJob.avgReplyBytes(valid, "date").collect()
    // w1: (1839+0+0)/3 = 613; w2: (999999999+77)/2 = 500000038
    assert(q3.map(_.getAs[Long]("avg_bytes")).toSeq === Seq(613L, 500000038L))
  }

  test("buggy-window mode collapses everything into epoch window 0 (reference parity)") {
    val valid = LogAnalysisJob.readClf(spark, path)
    val q1 = LogAnalysisJob.busiestHost(valid, "date_ref_buggy").collect()
    assert(q1.length === 1) // the 1000x-compressed timestamps share one window
  }

  test("streaming CLF source parses and aggregates like batch (single-agg Q3)") {
    val stream = LogAnalysisJob.readClfStream(spark, path)
    assert(stream.isStreaming)
    val q = LogAnalysisJob.avgReplyBytes(stream, "date")
      .writeStream.format("memory").queryName("clf_stream").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("clf_stream").collect()
    assert(rows.map(_.getAs[Long]("avg_bytes")).sorted.toSeq === Seq(613L, 500000038L))
  }

  test("volume corpus: 120k deterministic lines, valid + dead letters partition exactly") {
    val valid = graft.clf.LogCorpus.parsedValidVolume(spark)
    val dead = graft.clf.LogCorpus.deadLettersVolume(spark)
    val nValid = valid.count()
    val nDead = dead.count()
    assert(nValid + nDead === graft.clf.LogCorpus.NumLines)
    // exactly the ids ≡ 11 (mod 13) are near-miss dead letters
    assert(nDead === (0L until graft.clf.LogCorpus.NumLines).count(_ % 13 == 11))
    // parsed timestamps are real instants (no null dates among valid rows)
    assert(valid.where(org.apache.spark.sql.functions.col("ts_sec").isNull).count() === 0)
  }
}
