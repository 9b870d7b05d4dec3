package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash signature of a token array, as a '0'/'1' string (msb
  * first): bit j of a token's hash = bit (3 - j%4) of hex digit j/4 of
  * md5(token-utf8-bytes); signature bit = sign of the +/-1 vote sum over
  * all tokens (ties -> 0).
  *
  * Bit-identical to the SQL formulation the DuckDB oracle runs
  * (md5 per token, nibble-indexed bit extraction, vote fold) — but as a
  * single codegen'd pass: the interpreted higher-order-function fold
  * (zip_with over a 64-element sequence per token) cost ~2.9 s at sf0.1
  * where this costs one MD5 per token plus a 64-int vote loop.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(s"simhash64 expects array<string>, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    SimHash64.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.SimHash64.compute($a);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHash64 {
  /** Shared by eval and codegen. Null tokens are skipped (a whitespace
    * split never produces them).
    */
  def compute(tokens: ArrayData): UTF8String = {
    val votes = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        md.reset()
        val digest = md.digest(tokens.getUTF8String(i).getBytes)
        // hex digit j/4 of the md5 hex string = byte j/8 of the digest,
        // high nibble for even digit index; bit (3 - j%4) is msb-first
        // within the nibble — exactly the oracle's instr/shiftright walk.
        var j = 0
        while (j < 64) {
          val nib =
            if (((j >> 2) & 1) == 0) (digest(j >> 3) >> 4) & 0xF
            else digest(j >> 3) & 0xF
          votes(j) += 2 * ((nib >> (3 - (j & 3))) & 1) - 1
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](64)
    var j = 0
    while (j < 64) { out(j) = if (votes(j) > 0) '1' else '0'; j += 1 }
    UTF8String.fromBytes(out)
  }
}
