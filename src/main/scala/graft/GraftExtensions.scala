package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{DotProduct, Float32LEBytes, L2NormSq, NormalizeL2, SimHash64}

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

  import org.apache.spark.sql.catalyst.expressions.Expression

  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      if (es.length != n)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name,
            "expectedNum" -> n.toString,
            "actualNum" -> es.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      build(es)
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      arity("dot_product", 2)(es => DotProduct(es(0), es(1)))))
    ext.injectFunction((
      FunctionIdentifier("normalize_l2"),
      new ExpressionInfo(classOf[NormalizeL2].getName, "normalize_l2"),
      arity("normalize_l2", 1)(es => NormalizeL2(es.head))))
    ext.injectFunction((
      FunctionIdentifier("float32_le_bytes"),
      new ExpressionInfo(classOf[Float32LEBytes].getName, "float32_le_bytes"),
      arity("float32_le_bytes", 1)(es => Float32LEBytes(es.head))))
    ext.injectFunction((
      FunctionIdentifier("l2_norm_sq"),
      new ExpressionInfo(classOf[L2NormSq].getName, "l2_norm_sq"),
      arity("l2_norm_sq", 1)(es => L2NormSq(es.head))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      arity("simhash64", 1)(es => SimHash64(es.head))))
  }
}
