package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the vector/sketch hot paths.
  *
  * SURVEY.md §7.3–7.4 reserved custom expressions for "when bench
  * demands": higher-order-function lambdas are interpreted row-at-a-time
  * (Invoke on boxed values), which made the O(n²) similarity prefilter and
  * the per-token sketches the two dominant bench costs. These expressions
  * run the same arithmetic as the HOF formulations — results are
  * bit-identical, the DuckDB oracles are unchanged — but as tight JVM
  * loops, with whole-stage codegen for the dot product.
  */

/** dot(a, b) over array<float>/array<double> in IEEE double, sequential
  * order (same fold order as aggregate(zip_with(...)) — bit-identical).
  * Codegen'd: the loop inlines into the enclosing WholeStageCodegen. */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_fdot"

  private def elemAccessor(e: Expression): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => "getFloat"
      case DoubleType => "getDouble"
      case t => throw new IllegalArgumentException(s"graft_fdot: unsupported element type $t")
    }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_fdot expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    val leftIsFloat = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val rightIsFloat = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    var dot = 0.0
    var i = 0
    while (i < n) {
      val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val la = elemAccessor(left)
    val ra = elemAccessor(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_acc += ((double) $a.$la($i)) * ((double) $b.$ra($i));
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash over an array<string> of tokens, emitted as 16 lowercase
  * hex chars. Exact same construction as the portable HOF/oracle version:
  * md5 hex per token (multiplicity counts), hex digit p carries bits
  * 4p..4p+3, bit = (±1 vote sum >= 0). md5 dominates the cost either
  * way, but codegen as a static call into [[Simhash64.sketch]] keeps the
  * enclosing WholeStageCodegen stage row-free (a CodegenFallback would
  * force an InternalRow materialization per document to re-enter the
  * interpreted tree). */
case class Simhash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    Simhash64.sketch(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Simhash64.sketch($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Simhash64 {
  private val HexChars: Array[Byte] = "0123456789abcdef".getBytes
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Static kernel, called from both interpreted eval and generated code. */
  def sketch(tokens: ArrayData): UTF8String = {
    val md = digest.get()
    val counts = new Array[Int](64)
    var t = 0
    val n = tokens.numElements()
    while (t < n) {
      val tok = tokens.getUTF8String(t)
      md.reset()
      val h = md.digest(tok.getBytes)
      // the portable construction uses md5 hex positions 1..16, i.e. the
      // first 8 digest bytes; byte j holds hex digits 2j (high nibble)
      // and 2j+1 (low nibble)
      var j = 0
      while (j < 8) {
        val hi = (h(j) >> 4) & 0xF
        val lo = h(j) & 0xF
        var b = 0
        while (b < 4) {
          counts(2 * j * 4 + b) += (if (((hi >> b) & 1) == 1) 1 else -1)
          counts((2 * j + 1) * 4 + b) += (if (((lo >> b) & 1) == 1) 1 else -1)
          b += 1
        }
        j += 1
      }
      t += 1
    }
    val out = new Array[Byte](16)
    var p = 0
    while (p < 16) {
      var d = 0
      var b = 0
      while (b < 4) {
        if (counts(p * 4 + b) >= 0) d |= (1 << b)
        b += 1
      }
      out(p) = HexChars(d)
      p += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** Count of positions where two array<bigint> values are equal — the
  * MinHash signature-agreement kernel (est_jaccard = eqcount / 64).
  * Bit-identical to `size(filter(zip_with(a, b, (x,y) -> x = y), v -> v))`
  * (integer equality — nothing to diverge), but a codegen'd int loop
  * instead of three interpreted lambdas over boxed values: on the
  * clean-corpus 8× probe the estimate runs once per ~10.8M capped
  * candidates, making this the q29-family hot path. */
case class LongVecEqCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_eqcount"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_eqcount expects array<bigint>, got ${left.dataType} / ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int ${ev.value}_c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) ${ev.value}_c++;
         |}
         |${ev.value} = ${ev.value}_c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Bit-Hamming distance between two 16-hex-digit SimHash strings — the
  * q31 verification kernel. Bit-identical to the HOF formulation
  * `aggregate(sequence(1,16), 0, (acc,p) -> acc + bit_count(nibble(h1,p)
  * ^ nibble(h2,p)))` (integer math), but a codegen'd byte loop. Non-hex
  * bytes contribute 0 bits, matching instr() - 1 = -1 semantics only for
  * well-formed inputs — both producers are [[Simhash64]] outputs. */
case class HexHamming64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hexhamming"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_hexhamming expects string, got ${left.dataType} / ${right.dataType}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HexHamming64.hamming(a.asInstanceOf[UTF8String].getBytes, b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HexHamming64.hamming($a.getBytes(), $b.getBytes());")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HexHamming64 {
  private def nibble(c: Byte): Int = c match {
    case b if b >= '0' && b <= '9' => b - '0'
    case b if b >= 'a' && b <= 'f' => b - 'a' + 10
    case _ => 0
  }
  def hamming(x: Array[Byte], y: Array[Byte]): Int = {
    val n = math.min(x.length, y.length)
    var c = 0
    var i = 0
    while (i < n) {
      c += java.lang.Integer.bitCount(nibble(x(i)) ^ nibble(y(i)))
      i += 1
    }
    c
  }
}

// Round-1 note: a MinHashSig expression (tight-loop min(a_i*x+b_i) over a
// collect_set'd hash array) lived here until round 2 replaced it with 64
// declarative min() aggregates in Dedup.signaturesFromHash — algebraic
// min() gets map-side partial aggregation, which the collect_set
// formulation structurally could not, and the declarative form codegens.
