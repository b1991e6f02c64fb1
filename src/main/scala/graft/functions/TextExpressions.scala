package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  * UTF8String binary order — exactly `array_sort`'s. */
case class LongestRun(child: Expression) extends UnaryExpression with CodegenFallback {

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

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
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

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
