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

/** Distinct word n-gram shingles of a token array, first-occurrence
  * order (`array_distinct(transform(sequence(...), i -> concat_ws(' ',
  * tokens[i..i+n-1])))` as one codegen pass — higher-order-function
  * lambdas evaluate interpreted, and the shingle build is the dominant
  * cost of the shared dedup cache at scale). Tokens shorter than n
  * yield an empty array (callers filter, matching the oracle's range()
  * semantics).
  */
case class WordNgramsDistinct(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"shingle size must be positive, got $n")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams_distinct"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(s"word_ngrams_distinct expects array<string>, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    WordNgramsDistinct.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.WordNgramsDistinct.compute($a, $n);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object WordNgramsDistinct {
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val nTok = tokens.numElements()
    val nGrams = nTok - (n - 1)
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = 0
      var first = true
      while (j < n) {
        // concat_ws semantics: null components are skipped WITHOUT a separator
        if (!tokens.isNullAt(i + j)) {
          if (!first) sb.append(' ')
          sb.append(tokens.getUTF8String(i + j).toString)
          first = false
        }
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val arr = new Array[AnyRef](seen.size())
    val it = seen.iterator()
    var x = 0
    while (it.hasNext) {
      arr(x) = UTF8String.fromString(it.next())
      x += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }
}

/** Winnowing fingerprint set (the MOSS scheme) of a token array: hash
  * every `n`-token shingle IN ORDER (md5 hex), slide a window of
  * `windowSize` consecutive hashes keeping each window's minimum, and
  * return the distinct selected hashes sorted ascending — any
  * sufficiently long shared substring between two documents shares a
  * fingerprint. Bit-identical to the interpreted
  * transform/slice/array_min SQL the DuckDB oracle runs (hex strings
  * compare byte-wise, so lexicographic min matches), as one codegen'd
  * pass per document.
  */
case class WinnowFps(child: Expression, shingleN: Int, windowSize: Int)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(s"winnow_fps expects array<string>, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    WinnowFps.compute(v.asInstanceOf[ArrayData], shingleN, windowSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.WinnowFps.compute($a, $shingleN, $windowSize);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object WinnowFps {
  def compute(tokens: ArrayData, n: Int, window: Int): ArrayData = {
    val nTok = tokens.numElements()
    val nGrams = nTok - (n - 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = "0123456789abcdef".toCharArray
    // ordered md5 hex digests of the n-token shingles
    val hashes = new Array[String](math.max(0, nGrams))
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = 0
      var first = true
      while (j < n) {
        // concat_ws semantics: null components are skipped WITHOUT a separator
        if (!tokens.isNullAt(i + j)) {
          if (!first) sb.append(' ')
          sb.append(tokens.getUTF8String(i + j).toString)
          first = false
        }
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val out = new Array[Char](32)
      var b = 0
      while (b < 16) {
        out(2 * b) = hex((d(b) >> 4) & 0xF)
        out(2 * b + 1) = hex(d(b) & 0xF)
        b += 1
      }
      hashes(i) = new String(out)
      i += 1
    }
    // sliding-window minima, distinct, sorted ascending
    val nWin = nGrams - (window - 1)
    val selected = new java.util.TreeSet[String]()
    var w = 0
    while (w < nWin) {
      var min = hashes(w)
      var k = 1
      while (k < window) {
        val h = hashes(w + k)
        if (h.compareTo(min) < 0) min = h
        k += 1
      }
      selected.add(min)
      w += 1
    }
    val arr = new Array[AnyRef](selected.size())
    val it = selected.iterator()
    var x = 0
    while (it.hasNext) {
      arr(x) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      x += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }
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

/** Per-document n-gram repetition profile in one codegen pass:
  * `struct(n_grams, top_frac, dup_frac)` over the NON-distinct ordered
  * n-grams of a token array — `top_frac` = occurrences of the most
  * frequent gram / total grams, `dup_frac` = occurrences belonging to
  * any gram seen more than once / total grams (the Gopher-style
  * duplicate-n-gram fraction; repetitive low-quality documents score
  * high on both). Zero-shuffle alternative to the classic
  * explode + double-groupBy plan: the corpus-scale input never expands
  * to one row per gram, each document folds to three numbers in its
  * scan partition. Fractions are exact small-integer ratios, so they
  * bit-match the oracle's DuckDB divisions before the shared 6-dp
  * rounding. Documents with fewer than n tokens yield (0, 0.0, 0.0).
  */
case class RepetitionStats(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"gram size must be positive, got $n")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("top_frac", DoubleType, nullable = false),
    StructField("dup_frac", DoubleType, nullable = false)))
  override def prettyName: String = "repetition_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(s"repetition_stats expects array<string>, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    RepetitionStats.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.RepetitionStats.compute($a, $n);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object RepetitionStats {
  def compute(tokens: ArrayData, n: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val nTok = tokens.numElements()
    val nGrams = math.max(0, nTok - (n - 1))
    val counts = new java.util.HashMap[String, Int]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = 0
      var first = true
      while (j < n) {
        // concat_ws semantics: null components are skipped WITHOUT a separator
        if (!tokens.isNullAt(i + j)) {
          if (!first) sb.append(' ')
          sb.append(tokens.getUTF8String(i + j).toString)
          first = false
        }
        j += 1
      }
      counts.merge(sb.toString, 1, Integer.sum _)
      i += 1
    }
    var top = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toLong
      if (c > top) top = c
      if (c > 1) dup += c
    }
    val topFrac = if (nGrams == 0) 0.0 else top.toDouble / nGrams
    val dupFrac = if (nGrams == 0) 0.0 else dup.toDouble / nGrams
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nGrams.toLong, topFrac, dupFrac))
  }
}
