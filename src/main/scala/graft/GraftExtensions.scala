package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{DotProduct, Float32LEBytes, L2NormSq, NormalizeL2}

/** SparkSessionExtensions hook: makes the engine's codegen'd vector
  * expressions available to ANY session (including plain `spark.sql`)
  * via
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  * — the idiomatic way to ship custom Catalyst expressions with a
  * library (no session-local registration call needed). The same names
  * are also registrable per-session with
  * [[graft.functions.registerAll]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("normalize_l2"),
      new ExpressionInfo(classOf[NormalizeL2].getName, "normalize_l2"),
      (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        NormalizeL2(es.head)))
    ext.injectFunction((
      FunctionIdentifier("float32_le_bytes"),
      new ExpressionInfo(classOf[Float32LEBytes].getName, "float32_le_bytes"),
      (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Float32LEBytes(es.head)))
    ext.injectFunction((
      FunctionIdentifier("l2_norm_sq"),
      new ExpressionInfo(classOf[L2NormSq].getName, "l2_norm_sq"),
      (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        L2NormSq(es.head)))
  }
}
