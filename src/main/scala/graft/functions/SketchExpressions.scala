package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain(probe)` against a FROZEN Bloom filter, as a native
  * codegen'd expression.
  *
  * The filter is built once over the dedup index's key column (see
  * [[graft.operators.Dedup.corpusBloomBytes]]) and baked into the plan as
  * serialized bytes; each executor deserializes it once (a codegen
  * mutable-state init, not per row) and then every probe is a few XXH64
  * mixes over the key bytes inside whole-stage codegen — the same
  * runtime-filter shape Spark's own `InjectRuntimeFilter` uses for join
  * pruning, here surfaced as a first-class operator building block.
  *
  * Semantics: NO false negatives (a `false` result is definitive — the
  * key is not in the indexed set), tunable false-positive rate. Probing
  * uses the UTF-8 bytes of the string key, the identical byte stream
  * `BloomFilter.putString` hashed at build time, so build and probe agree
  * byte-for-byte.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain expects a string key, got $t")
  }

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override protected def nullSafeEval(v: Any): Any =
    filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the BYTES to the generated class and parse them once per
    // executor in the init path: the parsed BloomFilter object itself
    // never rides the serialized plan
    val bytesRef = ctx.addReferenceObj("bloomBytes", filterBytes, "byte[]")
    val filterCls = classOf[BloomFilter].getName
    val f = ctx.addMutableState(filterCls, "bloomFilter",
      v => s"""try {
              |  $v = $filterCls.readFrom(new java.io.ByteArrayInputStream($bytesRef));
              |} catch (java.io.IOException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $f.mightContainBinary($v.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
