package graft.clf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Common Log Format schema + parser — the reference's native input domain.
  *
  * The regex is the reference's (reference StreamingJob.scala:69) with
  * ONE deliberate tightening — the HTTP-version dot is escaped; see the
  * [[Pattern]] comment — and otherwise keeps its deliberate/accidental
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

  /** reference StreamingJob.scala:69, with one deliberate tightening:
    * the reference writes `HTTP/V?1.0` (unescaped dot, matching any
    * char); here the dot is escaped (`1\.0`). Same accept set on all
    * real CLF traffic — fixture-covered in ClfParserSpec — and strictly
    * narrower on adversarial input (e.g. `HTTP/1x0`). */
  val Pattern: String =
    "^(\\S+) - - \\[(\\d\\d)/(\\w{1,3})/(\\d{4}):(\\d{2}):(\\d{2}):(\\d{2}) (-\\d{4})\\] \"(\\w{1,6}) ([^ \"]+) *(HTTP/V?1\\.0) *\" (\\d{3}) (\\d{1,9}|-)$"

  /** Typed row — mirrors the reference's LogLine
    * (StreamingJob.scala:37–53) with intended-semantics timestamp. */
  case class LogLine(
      raw: String, host: String, day: Int, month: String, year: Int,
      hour: Int, minute: Int, second: Int, timezone: String,
      date: java.sql.Timestamp, httpMethod: String, ressource: String,
      httpVersion: String, httpReplyCode: Int, replyBytes: Option[Int])

  /** Group separator for the single-pass extraction — a control char that
    * cannot appear in CLF lines (hosts/paths/tokens are printable ASCII;
    * the corpus generator and the NASA trace contain none). */
  private val Sep = ""

  /** value:string → the 15-column LogLine schema. Unparseable lines keep
    * `raw` and get null/sentinel fields (reference StreamingJob.scala:135:
    * LogLine(raw = line)).
    *
    * Single-pass extraction: 13 separate `regexp_extract(v, P, i)` calls
    * each re-run the full 13-group match (codegen CSE can't merge them —
    * the group index differs), which dominated the 1.57M-line parse. One
    * `regexp_replace` rewrites a matching line to all 13 groups
    * ``-joined, `split` fans them out, and every field references
    * the SAME subexpression — whole-stage codegen evaluates the regex
    * once per row. `rlike` (the second and last regex run) stays the
    * match authority, so valid/dead-letter classification is exactly the
    * reference's regex semantics even for pathological inputs where the
    * replace trick would mis-split. */
  def parse(lines: DataFrame): DataFrame = {
    val v = col("value")
    // Stage 1 computes the match bit and the group array ONCE per row
    // behind a projection boundary: both are referenced 13+ times below,
    // and CollapseProject declines to inline non-cheap expressions with
    // multiple references, so the regex runs exactly twice per row
    // regardless of how many fields stage 2 derives.
    fields(lines.select(
      v.as("raw"),
      v.rlike(Pattern).as("m"),
      split(regexp_replace(v, Pattern, (1 to 13).map("$" + _).mkString(Sep)), Sep).as("g")))
  }

  /** ONE-regex-per-row variant of [[parse]] for inputs guaranteed free of
    * the `` group separator (any corpus of printable-ASCII lines —
    * [[graft.clf.LogCorpus]] by construction, the NASA trace in fact).
    * Under that precondition the replace trick is itself the match
    * authority: an anchored pattern either rewrites the whole line to 13
    * ``-joined groups (`size(g) = 13`) or leaves it untouched
    * (`size(g) = 1`), so the separate `rlike` run — half the regex cost of
    * the 1.57M-line parse — is redundant. [[parse]] keeps `rlike` for
    * inputs that could smuggle the separator. */
  def parseSepFree(lines: DataFrame, passthrough: Seq[String] = Nil): DataFrame = {
    val v = col("value")
    val keep = passthrough.map(col)
    fields(lines
      .select(keep ++ Seq(
        v.as("raw"),
        split(regexp_replace(v, Pattern, (1 to 13).map("$" + _).mkString(Sep)), Sep).as("g")): _*)
      .select(keep ++ Seq(col("raw"), (size(col("g")) === 13).as("m"), col("g")): _*),
      passthrough)
  }

  /** Stage 2 shared by the parse variants: staged must carry `raw`, the
    * match bit `m`, and the 13-group array `g`; `passthrough` columns are
    * retained ahead of the parsed fields. */
  private def fields(staged: DataFrame, passthrough: Seq[String] = Nil): DataFrame = {
    val matched = col("m")
    // "" on no match — the regexp_extract contract downstream code keys on
    def grp(i: Int): Column = when(matched, element_at(col("g"), i)).otherwise(lit(""))
    def intGrp(i: Int): Column = nullif(grp(i), lit("")).try_cast("int")
    val tsStr = concat_ws(" ",
      concat_ws("/", element_at(col("g"), 2), element_at(col("g"), 3), element_at(col("g"), 4)),
      concat_ws(":", element_at(col("g"), 5), element_at(col("g"), 6), element_at(col("g"), 7)),
      element_at(col("g"), 8))
    // Intended semantics: a real UTC instant. Guarded by `matched` so
    // garbage lines yield null instead of an ANSI parse error.
    val ts = to_timestamp(when(matched, tsStr), "dd/MMM/yyyy HH:mm:ss Z")
    staged.select(passthrough.map(col) ++ Seq(
      col("raw"),
      grp(1).as("host"),
      intGrp(2).as("day"),
      grp(3).as("month"),
      intGrp(4).as("year"),
      intGrp(5).as("hour"),
      intGrp(6).as("minute"),
      intGrp(7).as("second"),
      grp(8).as("timezone"),
      ts.as("date"),
      // Output parity with the reference's seconds-as-millis bug
      // (StreamingJob.scala:125–126, SURVEY.md §0): epoch-seconds value
      // interpreted as milliseconds.
      timestamp_millis(unix_timestamp(ts)).as("date_ref_buggy"),
      grp(9).as("httpMethod"),
      grp(10).as("ressource"),
      grp(11).as("httpVersion"),
      intGrp(12).as("httpReplyCode"),
      intGrp(13).as("replyBytes")): _*)
  }

  /** Valid rows (reference parseLoglines, StreamingJob.scala:141–143). */
  def validLines(lines: DataFrame): DataFrame =
    parse(lines).where(col("host") =!= "")

  /** Dead-letter stream of unparseable raw lines (reference
    * checkInvalidLoglineParsing, StreamingJob.scala:145–147). Equivalent
    * to `parse(...).where(host === "")` — host is `\S+` so it is empty
    * iff the regex did not match — but skips the group extraction: one
    * regex run per line is the whole cost. */
  def deadLetters(lines: DataFrame): DataFrame =
    lines.where(!col("value").rlike(Pattern)).select(col("value").as("raw"))

  /** Single-pass alternative to the valid/dead-letter double scan: the
    * valid rows flow through while an `observe` metric counts total and
    * invalid lines on the same pass (SURVEY.md §2.1 row 5). Read the
    * metric from the listener or `Observation` after an action. */
  def validLinesObserved(lines: DataFrame): DataFrame = {
    graft.operators.Diagnostics.install(lines.sparkSession)
    parse(lines)
      .observe("clf_parse",
        count(lit(1)).as("n_lines"),
        sum(when(col("host") === "", 1L).otherwise(0L)).as("n_dead_letters"))
      .where(col("host") =!= "")
  }

  /** q37: the fixture corpus through [[validLines]], projected to the
    * hash-portable column set (timestamps as BIGINTs: `ts_sec` is the
    * intended-semantics epoch seconds; `ts_ref_millis` is the millis
    * count of the reference-parity `date_ref_buggy` — numerically EQUAL
    * to `ts_sec`, which is precisely the seconds-as-millis bug, so the
    * DuckDB twin states it as `ts_sec AS ts_ref_millis` and the hash
    * gate pins the parity). Ordered by `raw` — the fixture lines are
    * pairwise distinct. */
  def fixtureValid(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    validLines(FixtureLines.toDF("value"))
      .select(col("raw"), col("host"), col("day"), col("month"), col("year"),
        col("hour"), col("minute"), col("second"), col("timezone"),
        col("date").cast("long").as("ts_sec"),
        unix_millis(col("date_ref_buggy")).as("ts_ref_millis"),
        col("httpMethod"), col("ressource"), col("httpVersion"),
        col("httpReplyCode"), col("replyBytes"))
      .orderBy("raw")
  }

  /** q38: the fixture dead-letter stream, ordered by `raw`. */
  def fixtureDead(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    deadLetters(FixtureLines.toDF("value")).orderBy("raw")
  }

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
