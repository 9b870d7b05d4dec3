package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{DotProduct, Float32LEBytes, L2NormSq, MinKIds, NormalizeL2,
  RepetitionStats, SimHash64, TopKByScore, VectorAvg, WinnowFps, WordNgramsDistinct}

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
    ext.injectFunction((
      FunctionIdentifier("word_ngrams_distinct"),
      new ExpressionInfo(classOf[WordNgramsDistinct].getName, "word_ngrams_distinct"),
      arity("word_ngrams_distinct", 2)(es =>
        WordNgramsDistinct(es(0), GraftExtensions.intArg("word_ngrams_distinct", es(1))))))
    ext.injectFunction((
      FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps"),
      arity("winnow_fps", 3)(es => WinnowFps(es(0),
        GraftExtensions.intArg("winnow_fps", es(1)),
        GraftExtensions.intArg("winnow_fps", es(2))))))
    ext.injectFunction((
      FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStats].getName, "repetition_stats"),
      arity("repetition_stats", 2)(es =>
        RepetitionStats(es(0), GraftExtensions.intArg("repetition_stats", es(1))))))
    ext.injectFunction((
      FunctionIdentifier("top_k_hits"),
      new ExpressionInfo(classOf[TopKByScore].getName, "top_k_hits"),
      arity("top_k_hits", 3)(es =>
        TopKByScore(es(0), es(1), GraftExtensions.intArg("top_k_hits", es(2))))))
    ext.injectFunction((
      FunctionIdentifier("min_k_ids"),
      new ExpressionInfo(classOf[MinKIds].getName, "min_k_ids"),
      arity("min_k_ids", 2)(es =>
        MinKIds(es(0), GraftExtensions.intArg("min_k_ids", es(1))))))
    ext.injectFunction((
      FunctionIdentifier("vector_avg"),
      new ExpressionInfo(classOf[VectorAvg].getName, "vector_avg"),
      arity("vector_avg", 1)(es => VectorAvg(es.head))))
  }
}

object GraftExtensions {
  /** Extract a literal int parameter (shingle size, k, window) from a
    * SQL call site; non-foldable arguments are a user error.
    */
  private[graft] def intArg(fn: String,
      e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
    if (e.foldable && e.eval() != null)
      e.eval().asInstanceOf[Number].intValue()
    else throw new org.apache.spark.sql.AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map(
        "functionName" -> fn,
        "expectedNum" -> "a literal integer parameter",
        "actualNum" -> e.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))
}
