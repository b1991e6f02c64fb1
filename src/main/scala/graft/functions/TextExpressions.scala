package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the per-document text kernels.
  *
  * Same §7.3–7.4 gate as [[VectorExpressions]]: reach for a custom
  * expression only where the declarative form's cost is interpreter
  * overhead, not work. The q64 repetition metrics spent their time in two
  * `aggregate(array_sort(...), struct-state-fold)` higher-order calls —
  * ~300 interpreted lambda invocations per document with boxed struct
  * state — for what is a sort + one linear scan.
  */

/** longest_run(arr): most-frequent element of an array<string> via
  * sort + single run-length scan, as `struct(best_cnt: bigint, best_tok:
  * string)`. Bit-identical to the HOF formulation
  * `aggregate(array_sort(arr), ...)` with keep-first-maximal-run
  * semantics: ties resolve to the lexicographically SMALLEST element
  * (ascending order + strictly-greater-replaces). Empty array →
  * (0, null), mirroring the fold's init state. Sort order is
  * UTF8String binary order — exactly `array_sort`'s.
  *
  * Codegen'd as a static call into [[LongestRun.run]] (the
  * [[HexHamming64]] pattern): the sort+scan kernel is compiled JVM code
  * either way, but a CodegenFallback would force the enclosing
  * WholeStageCodegen stage to materialize an InternalRow per document
  * just to re-enter the interpreted expression tree. */
case class LongestRun(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("best_cnt", LongType, nullable = false),
    StructField("best_tok", StringType, nullable = true)))

  override def prettyName: String = "graft_longest_run"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_longest_run expects array<string>, got $t")
    }

  override protected def nullSafeEval(input: Any): Any =
    LongestRun.run(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LongestRun.run($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LongestRun {
  /** Static kernel, called from both interpreted eval and generated code. */
  def run(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    if (n == 0) InternalRow(0L, null)
    else {
      val xs = new Array[UTF8String](n)
      var i = 0
      while (i < n) { xs(i) = arr.getUTF8String(i); i += 1 }
      java.util.Arrays.sort(xs.asInstanceOf[Array[Object]])
      var prev = xs(0)
      var run = 1L
      var bestCnt = 1L
      var bestTok = prev
      i = 1
      while (i < n) {
        if (xs(i) == prev || xs(i).equals(prev)) run += 1
        else { run = 1L; prev = xs(i) }
        if (run > bestCnt) { bestCnt = run; bestTok = prev }
        i += 1
      }
      InternalRow(bestCnt, bestTok.copy())
    }
  }
}

/** ngram_dup_mass(tokens, n): total occurrences of every token n-gram
  * that appears ≥ 2 times in the SAME array — the q158 duplicated-n-gram
  * occurrence mass (Gopher's repetition battery, occurrence-mass half).
  * Builds the n-gram strings (space-joined, matching the SQL
  * `t[i] || ' ' || …` construction), sorts, and sums run lengths ≥ 2 in
  * one pass; the HOF sort+fold formulation this replaces spent ~290
  * interpreted lambda invocations (with struct allocs) per document. */
case class NgramDupMass(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ngram_dup_mass"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if n >= 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_ngram_dup_mass expects array<string> and n >= 1, got $t / n=$n")
    }

  override protected def nullSafeEval(input: Any): Any =
    NgramDupMass.mass(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramDupMass.mass($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramDupMass {
  private val Space = UTF8String.fromString(" ")

  /** Static kernel, called from both interpreted eval and generated code. */
  def mass(arr: ArrayData, n: Int): Long = {
    val total = arr.numElements()
    val m = total - n + 1
    if (m < 2) return 0L
    val grams = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      var g = arr.getUTF8String(i)
      var j = 1
      while (j < n) { g = UTF8String.concat(g, Space, arr.getUTF8String(i + j)); j += 1 }
      grams(i) = g
      i += 1
    }
    java.util.Arrays.sort(grams.asInstanceOf[Array[Object]])
    var prev = grams(0)
    var run = 1L
    var dup = 0L
    i = 1
    while (i < m) {
      if (grams(i).equals(prev)) run += 1
      else {
        if (run >= 2) dup += run
        run = 1L; prev = grams(i)
      }
      i += 1
    }
    if (run >= 2) dup += run
    dup
  }
}

/** karp_rabin(s): Karp–Rabin ROLLING hashes of every K-byte window of a
  * string, as array<bigint> — the q97 fingerprinting kernel.
  *
  * h(i) = Σ_{j<K} byte(i+j) · (B^{K−1−j} mod P) mod P, computed with the
  * O(1)-per-position rolling update h(i+1) = ((h(i) − byte(i)·B^{K−1}) · B
  * + byte(i+K)) mod P — one pass over the document instead of O(K) work
  * per position. All arithmetic stays below 2^63 (P·B ≈ 2.6e11) and every
  * intermediate is reduced mod P, so the values equal the direct
  * per-position formula exactly — the DuckDB oracle and the HOF twin
  * compute that direct form and must match bit-for-bit. Bytes are the
  * UTF-8 encoding (≡ code points on the ASCII corpus; documented).
  * Strings shorter than K yield an empty array.
  *
  * Codegen'd as a static call into [[KarpRabin.hashes]] — same rationale
  * as [[LongestRun]]: keep the enclosing stage row-free. */
case class KarpRabin(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_karp_rabin"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_karp_rabin expects string, got $t")
    }

  override protected def nullSafeEval(input: Any): Any =
    KarpRabin.hashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.KarpRabin.hashes($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object KarpRabin {
  /** Window length in bytes, hash base, modulus, and B^(K-1) mod P. */
  val K = 8
  val B = 257L
  val P = 1000000007L
  val PowTop: Long = {
    var p = 1L; var i = 0
    while (i < K - 1) { p = p * B % P; i += 1 }
    p
  }

  /** Static kernel, called from both interpreted eval and generated code. */
  def hashes(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < K) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n - K + 1)
    var h = 0L
    var j = 0
    while (j < K) { h = (h * B + (bytes(j) & 0xFF)) % P; j += 1 }
    out(0) = h
    var i = 1
    while (i <= n - K) {
      // subtract the outgoing byte's contribution, shift, add the incoming
      h = java.lang.Math.floorMod(h - (bytes(i - 1) & 0xFF) * PowTop % P, P)
      h = (h * B + (bytes(i + K - 1) & 0xFF)) % P
      out(i) = h
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** winnow_min(arr, w): minimum of every `w` consecutive elements of an
  * array<bigint>, as array<bigint> of length n−w+1 (empty if n < w) —
  * the winnowing selection of q97, natively. Bit-identical to the HOF
  * `transform(sequence(1, n−w+1), s -> array_min(slice(arr, s, w)))`
  * (spec'd); W is small and constant, so the plain O(n·w) scan beats a
  * deque's bookkeeping. Codegen'd as a static call into
  * [[WinnowMin.mins]] with the constant window embedded as a literal. */
case class WinnowMin(child: Expression, w: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_min"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) if w >= 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_winnow_min expects array<bigint> and w >= 1, got $t / w=$w")
    }

  override protected def nullSafeEval(input: Any): Any =
    WinnowMin.mins(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowMin.mins($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowMin {
  /** Static kernel, called from both interpreted eval and generated code. */
  def mins(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n < w) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n - w + 1)
    var s = 0
    while (s <= n - w) {
      var m = arr.getLong(s)
      var j = 1
      while (j < w) { val v = arr.getLong(s + j); if (v < m) m = v; j += 1 }
      out(s) = m
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** collapse_runs(arr, k): one-pass run-length normalization of an
  * array<string> — every maximal run of the same token longer than `k`
  * is truncated to its first `k` occurrences — as `struct(n_tokens:
  * bigint, n_clean: bigint, n_runs_collapsed: bigint, max_run: bigint,
  * text_clean: string)` with the kept tokens re-joined on single
  * spaces. The q108 rewrite kernel.
  *
  * Replaces the three-HOF formulation (a filter drop-mask, a filter
  * run-start mask, an aggregate fold for the max run) that walked the
  * token array three times through interpreted lambdas with boxed
  * struct state; the kernel is one compiled scan that emits every
  * report field at once, including the joined output text — the
  * enclosing stage never materializes the intermediate cleaned array.
  * ProfilingSpec pins bit-identity against a driver-side recompute;
  * PropertySpec fuzzes run boundaries. Empty array → (0, 0, 0, 0, "");
  * NULL elements are skipped entirely (n_tokens counts the non-null
  * tokens, so every report field stays consistent with text_clean —
  * concatWs would silently drop nulls otherwise).
  *
  * Codegen'd as a static call into [[CollapseRuns.run]] (the
  * [[LongestRun]] pattern). `k` is a plan-time constant, like
  * [[WinnowMin]]'s window. */
case class CollapseRuns(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_clean", LongType, nullable = false),
    StructField("n_runs_collapsed", LongType, nullable = false),
    StructField("max_run", LongType, nullable = false),
    StructField("text_clean", StringType, nullable = false)))

  override def prettyName: String = "graft_collapse_runs"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if k >= 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_collapse_runs expects array<string> and k >= 1, got $t / k=$k")
    }

  override protected def nullSafeEval(input: Any): Any =
    CollapseRuns.run(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CollapseRuns.run($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CollapseRuns {
  private val Space = UTF8String.fromString(" ")

  /** Static kernel, called from both interpreted eval and generated code.
    * Null elements (legal in an `array<string>` from SQL text even
    * though split() never produces them) are skipped, keeping every
    * count consistent with the joined output text. */
  def run(arr: ArrayData, k: Int): InternalRow = {
    val n = arr.numElements()
    val kept = new Array[UTF8String](n)
    var keptLen = 0
    var prev: UTF8String = null
    var nTokens = 0L
    var run = 0L
    var maxRun = 0L
    var nRuns = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val cur = arr.getUTF8String(i)
        nTokens += 1
        if (prev != null && cur.equals(prev)) run += 1
        else { if (run > k) nRuns += 1; run = 1L; prev = cur }
        if (run > maxRun) maxRun = run
        if (run <= k) { kept(keptLen) = cur; keptLen += 1 }
      }
      i += 1
    }
    if (run > k) nRuns += 1
    val text = UTF8String.concatWs(Space, java.util.Arrays.copyOf(kept, keptLen): _*)
    InternalRow(nTokens, keptLen.toLong, nRuns, maxRun, text)
  }
}

/** Whitespace-token COUNT without materializing the split array:
  * semantically identical to `size(split(str, '\\s+'))` (Java-regex
  * split with limit -1, the Spark default), computed as one zero-copy
  * byte scan over the UTF8String — `\s`-run count + 1. Java's `\s` is
  * the ASCII class `[ \t\n\x0B\f\r]`; all six are single ASCII bytes,
  * and UTF-8 continuation bytes can never equal them, so a byte scan
  * is exact on any Unicode input. split-limit--1 semantics make the
  * identity trivial: n tokens = n separator matches + 1, including
  * leading/trailing empty tokens and the lone empty token of "".
  *
  * Exists for [[graft.plans.RewriteTokenCount]]: token counting is the
  * inner loop of q23/q71/q79/q83/q84/q117, and the array round-trip
  * (allocate, fill, measure, discard) is pure waste at corpus scale. */
case class CountWsTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_ws_token_count"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_ws_token_count expects string, got $t")
    }

  override protected def nullSafeEval(input: Any): Any =
    CountWsTokens.run(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CountWsTokens.run($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CountWsTokens {
  /** Static kernel, shared by interpreted eval and generated code. */
  def run(s: UTF8String): Int = {
    val n = s.numBytes()
    var runs = 0
    var inWs = false
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      val ws = b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d
      if (ws && !inWs) runs += 1
      inWs = ws
      i += 1
    }
    runs + 1
  }
}

/** count_replace(s) — ONE regex pass producing BOTH the match count and
  * the replaced string, as `struct(n: bigint, replaced: string)` — the
  * q66 email-pass kernel (r19 optimization round). Replaces the pair
  *
  * {{{
  *   size(regexp_extract_all(txt, RE, 0))   -- pass 1 over txt
  *   regexp_replace(txt, RE, REPL)          -- pass 2 over txt
  * }}}
  *
  * whose two passes walk the identical match sequence (`Matcher.find`
  * from position 0; `regexp_extract_all` collects group 0 per find,
  * `regexp_replace` appendReplacement's per find), so counting inside
  * the replace loop is byte-identical by construction: n equals the
  * extract_all length and `replaced` equals the regexp_replace output.
  * The replacement string is applied via `Matcher.appendReplacement`
  * exactly as Spark's RegExpReplace does (group references like `$1`
  * behave identically; q66's literals contain none). Only the EMAIL
  * pass merges this way — the later counts run over the ORIGINAL text
  * while the later replaces chain over this pass's output, so their
  * inputs differ and they stay separate (OPTIMIZATION_r18 "Not yet" #3).
  *
  * The pattern and replacement are plan-time constants (foldable string
  * literals at registration), compiled once per expression instance and
  * shipped to generated code as reference objects. NULL input → NULL. */
case class RegexCountReplace(child: Expression, regex: String, replacement: String)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("replaced", StringType, nullable = false)))

  override def prettyName: String = "graft_count_replace"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_count_replace expects string, got ${child.dataType}")

  @transient private lazy val pattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(regex)

  override protected def nullSafeEval(input: Any): Any =
    RegexCountReplace.countReplace(input.asInstanceOf[UTF8String], pattern, replacement)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("crPattern", pattern,
      classOf[java.util.regex.Pattern].getName)
    val replRef = ctx.addReferenceObj("crRepl", replacement, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RegexCountReplace.countReplace($c, $patRef, $replRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RegexCountReplace {
  /** Static kernel, called from both interpreted eval and generated code. */
  def countReplace(s: UTF8String, pattern: java.util.regex.Pattern,
      replacement: String): InternalRow = {
    val m = pattern.matcher(s.toString)
    val result = new java.lang.StringBuffer
    var cnt = 0L
    while (m.find()) {
      cnt += 1
      m.appendReplacement(result, replacement)
    }
    m.appendTail(result)
    InternalRow(cnt, UTF8String.fromString(result.toString))
  }
}
