package graft.functions

import java.math.{BigDecimal => JBigDecimal, MathContext}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (UDAF) surface — the fully general custom-aggregate
  * form (SURVEY.md §2.2 "UDF/UDAF/UDTF"): element-wise vector sum with
  * EXACT decimal accumulation.
  *
  * Why decimal strings in the buffer: a double-summing buffer is
  * partition-order-dependent (breaks the cross-engine determinism rule in
  * [[Det]]); each component routes through DECIMAL(18,12)-equivalent
  * BigDecimal arithmetic (scale-12 rounding per input, exact addition),
  * so merge order cannot change the result and the output matches the
  * posexplode+decimal-sum formulation bit-for-bit.
  *
  * Scale shape vs the posexplode formulation (q32): one input row per
  * vector instead of 64, partial aggregation map-side, the shuffle
  * carries one 64-component buffer per (label × partition). The same
  * trade as the MinHash min()-aggregate rework.
  */
object VectorAggregates {

  private val Scale = 12

  /** Buffer: per-dimension exact decimal sums (as unscaled strings for a
    * stable Spark encoder) + row count. */
  case class CentroidBuf(sums: Array[String], n: Long)

  /** mean per dimension = round(exact decimal sum, 12) / n, as double —
    * identical arithmetic to q32's round(sum(decimal), 12) / count. */
  class CentroidAgg(dim: Int) extends Aggregator[Array[Float], CentroidBuf, Array[Double]] {
    private def dec(s: String): JBigDecimal = new JBigDecimal(s)

    override def zero: CentroidBuf =
      CentroidBuf(Array.fill(dim)("0"), 0L)

    override def reduce(b: CentroidBuf, v: Array[Float]): CentroidBuf = {
      val out = new Array[String](dim)
      var i = 0
      while (i < dim) {
        val x = new JBigDecimal(v(i).toDouble, MathContext.UNLIMITED)
          .setScale(Scale, java.math.RoundingMode.HALF_UP)
        out(i) = dec(b.sums(i)).add(x).toPlainString
        i += 1
      }
      CentroidBuf(out, b.n + 1)
    }

    override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf = {
      val out = new Array[String](dim)
      var i = 0
      while (i < dim) {
        out(i) = dec(a.sums(i)).add(dec(b.sums(i))).toPlainString
        i += 1
      }
      CentroidBuf(out, a.n + b.n)
    }

    override def finish(r: CentroidBuf): Array[Double] = {
      val out = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        out(i) = dec(r.sums(i)).setScale(Scale, java.math.RoundingMode.HALF_UP)
          .doubleValue() / r.n
        i += 1
      }
      out
    }

    override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }
}
