package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook exposing the native expressions to SQL:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   spark.sql("SELECT graft_fdot(a.embedding, b.embedding) ...")
  * }}}
  *
  * (Scala callers can bypass registration via ColumnBridge.) */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_fdot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "graft_fdot"),
      (children: Seq[Expression]) => FloatVecDot(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[Simhash64].getName, "graft_simhash64"),
      (children: Seq[Expression]) => Simhash64(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_zorder2"),
      new ExpressionInfo(classOf[ZOrder2].getName, "graft_zorder2"),
      (children: Seq[Expression]) => ZOrder2(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_longest_run"),
      new ExpressionInfo(classOf[LongestRun].getName, "graft_longest_run"),
      (children: Seq[Expression]) => LongestRun(children.head)))
  }
}
