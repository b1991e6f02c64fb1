package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Z-order (Morton) interleave of two non-negative long keys — the sort
  * key behind multi-dimensional data clustering (graft.sources.Clustering).
  *
  * Sorting by `zorder2(a, b)` arranges rows along a space-filling curve in
  * (a, b) space, so every contiguous file/row-group covers a compact
  * rectangle-ish region: parquet min/max stats stay tight on BOTH columns
  * and a predicate on EITHER column skips most row groups — the property a
  * single-column sort only provides for its leading column.
  *
  * The value is layout-only (never part of a query result), so no oracle
  * mirror is needed; correctness is pinned by the round-trip spec
  * (interleave → de-interleave is the identity on 31-bit inputs).
  *
  * Codegen'd: one static call inlined into whole-stage codegen. */
case class ZOrder2(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder2"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_zorder2 expects (bigint, bigint), got ${left.dataType} / ${right.dataType}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.morton(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder2.morton($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {

  /** Spread the low 31 bits of x so bit i lands at position 2i
    * (the standard mask-shift Morton spread). */
  def part1by1(x: Long): Long = {
    var v = x & 0x7FFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Interleave: bit i of `a` → bit 2i, bit i of `b` → bit 2i+1.
    * Inputs are masked to 31 bits so the result is always non-negative. */
  def morton(a: Long, b: Long): Long = part1by1(a) | (part1by1(b) << 1)

  /** Inverse of [[part1by1]] — collapse every second bit back. */
  def compact1by1(x: Long): Long = {
    var v = x & 0x5555555555555555L
    v = (v | (v >> 1)) & 0x3333333333333333L
    v = (v | (v >> 2)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v >> 4)) & 0x00FF00FF00FF00FFL
    v = (v | (v >> 8)) & 0x0000FFFF0000FFFFL
    v = (v | (v >> 16)) & 0x00000000FFFFFFFFL
    v
  }

  /** De-interleave a Morton code back to (a, b) — test/debug inverse. */
  def unmorton(z: Long): (Long, Long) = (compact1by1(z), compact1by1(z >> 1))
}
