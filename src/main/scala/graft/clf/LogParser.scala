package graft.clf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Common Log Format schema + parser — the reference's native input domain.
  *
  * The regex is byte-for-byte the reference's
  * (reference StreamingJob.scala:69), including its deliberate/accidental
  * restrictions (SURVEY.md §2.3): ident/user must be `- -`, timezone only
  * negative offsets, HTTP version only 1.0/V1.0, no spaces in paths,
  * bytes is 1–9 digits or `-` (null).
  *
  * Parsing is pure column expressions (regexp_extract × groups + guarded
  * to_timestamp) — NOT a Scala UDF: the reference's row-at-a-time
  * `parseLogline` map (StreamingJob.scala:112–138) would put a Ser/De
  * barrier in the plan; this version stays inside whole-stage codegen and
  * lets the validity filter push into the scan.
  */
object LogParser {

  /** reference StreamingJob.scala:69, verbatim. */
  val Pattern: String =
    "^(\\S+) - - \\[(\\d\\d)/(\\w{1,3})/(\\d{4}):(\\d{2}):(\\d{2}):(\\d{2}) (-\\d{4})\\] \"(\\w{1,6}) ([^ \"]+) *(HTTP/V?1\\.0) *\" (\\d{3}) (\\d{1,9}|-)$"

  /** Typed row — mirrors the reference's LogLine
    * (StreamingJob.scala:37–53) with intended-semantics timestamp. */
  case class LogLine(
      raw: String, host: String, day: Int, month: String, year: Int,
      hour: Int, minute: Int, second: Int, timezone: String,
      date: java.sql.Timestamp, httpMethod: String, ressource: String,
      httpVersion: String, httpReplyCode: Int, replyBytes: Option[Int])

  private def grp(c: Column, i: Int): Column = regexp_extract(c, Pattern, i)
  private def intGrp(c: Column, i: Int): Column =
    // try_cast: empty extract (no match) → null, matching the reference's
    // Try(...).toOption under Spark 4 ANSI mode.
    nullif(grp(c, i), lit("")).try_cast("int")

  /** value:string → the 15-column LogLine schema. Unparseable lines keep
    * `raw` and get null/sentinel fields (reference StreamingJob.scala:135:
    * LogLine(raw = line)). */
  def parse(lines: DataFrame): DataFrame = {
    val v = col("value")
    val matched = v.rlike(Pattern)
    lines.select(
      v.as("raw"),
      grp(v, 1).as("host"),
      intGrp(v, 2).as("day"),
      grp(v, 3).as("month"),
      intGrp(v, 4).as("year"),
      intGrp(v, 5).as("hour"),
      intGrp(v, 6).as("minute"),
      intGrp(v, 7).as("second"),
      grp(v, 8).as("timezone"),
      // Intended semantics: a real UTC instant. Guarded by `matched` so
      // garbage lines yield null instead of an ANSI parse error.
      when(matched, to_timestamp(
        concat_ws(" ",
          concat_ws("/", grp(v, 2), grp(v, 3), grp(v, 4)),
          concat_ws(":", grp(v, 5), grp(v, 6), grp(v, 7)),
          grp(v, 8)),
        "dd/MMM/yyyy HH:mm:ss Z")).as("date"),
      // Output parity with the reference's seconds-as-millis bug
      // (StreamingJob.scala:125–126, SURVEY.md §0): epoch-seconds value
      // interpreted as milliseconds.
      when(matched, timestamp_millis(unix_timestamp(to_timestamp(
        concat_ws(" ",
          concat_ws("/", grp(v, 2), grp(v, 3), grp(v, 4)),
          concat_ws(":", grp(v, 5), grp(v, 6), grp(v, 7)),
          grp(v, 8)),
        "dd/MMM/yyyy HH:mm:ss Z")))).as("date_ref_buggy"),
      grp(v, 9).as("httpMethod"),
      grp(v, 10).as("ressource"),
      grp(v, 11).as("httpVersion"),
      intGrp(v, 12).as("httpReplyCode"),
      intGrp(v, 13).as("replyBytes"))
  }

  /** Valid rows (reference parseLoglines, StreamingJob.scala:141–143). */
  def validLines(lines: DataFrame): DataFrame =
    parse(lines).where(col("host") =!= "")

  /** Dead-letter stream of unparseable raw lines (reference
    * checkInvalidLoglineParsing, StreamingJob.scala:145–147). */
  def deadLetters(lines: DataFrame): DataFrame =
    parse(lines).where(col("host") === "").select(col("raw"))

  /** Single-pass alternative to the valid/dead-letter double scan: the
    * valid rows flow through while an `observe` metric counts total and
    * invalid lines on the same pass (SURVEY.md §2.1 row 5). Read the
    * metric from the listener or `Observation` after an action. */
  def validLinesObserved(lines: DataFrame): DataFrame =
    parse(lines)
      .observe("clf_parse",
        count(lit(1)).as("n_lines"),
        sum(when(col("host") === "", 1L).otherwise(0L)).as("n_dead_letters"))
      .where(col("host") =!= "")

  /** The FIXTURES.md §A corpus, embedded so the CLF path is exercisable
    * without external files (the NASA log itself is not shipped). */
  val FixtureLines: Seq[String] = Seq(
    "host01.example.com - - [01/Aug/1995:00:00:01 -0400] \"GET /index.html HTTP/1.0\" 200 1839",
    "192.168.7.42 - - [01/Aug/1995:00:00:07 -0400] \"GET /images/logo.gif HTTP/1.0\" 304 0",
    "host02.example.net - - [01/Aug/1995:00:00:09 -0400] \"HEAD /missions/sts-70/ HTTP/1.0\" 404 -",
    "proxy.example.org - - [19/Aug/1995:23:59:59 -0400] \"POST /cgi-bin/form HTTP/V1.0\" 500 999999999",
    "host01.example.com - - [20/Aug/1995:00:00:00 -0400] \"GET /a.txt HTTP/1.0\" 200 77",
    "host03.example.com - - [01/Aug/1995:00:01:02 -0400] \"GET /new HTTP/1.1\" 200 512",
    "host04.example.com - alice [01/Aug/1995:00:01:03 -0400] \"GET /x HTTP/1.0\" 200 512",
    "host05.example.com - - [01/Aug/1995:00:01:04 +0200] \"GET /x HTTP/1.0\" 200 512",
    "host06.example.com - - [01/Aug/1995:00:01:05 -0400] \"GET /a b.html HTTP/1.0\" 200 512",
    "not a log line at all")
}
