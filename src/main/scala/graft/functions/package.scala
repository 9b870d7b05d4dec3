package graft

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Column-level API over the custom Catalyst expressions, plus derived
  * vector helpers. Everything here stays inside whole-stage codegen.
  */
package object functions {

  private def expr(c: Column) = GraftSqlBridge.expression(c)
  private def col(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftSqlBridge.column(e)

  /** Inner product accumulated in double. Both sides array<float> or both
    * array<double>.
    */
  def dot_product(a: Column, b: Column): Column = col(DotProduct(expr(a), expr(b)))

  /** L2-normalize an array<float>; zero vector -> e0 (reference semantics). */
  def normalize_l2(v: Column): Column = col(NormalizeL2(expr(v)))

  /** Little-endian float32 packing (numpy tobytes layout). */
  def float32_le_bytes(v: Column): Column = col(Float32LEBytes(expr(v)))

  /** Squared L2 norm, in double. */
  def l2_norm_sq(v: Column): Column = col(L2NormSq(expr(v)))

  /** Index of the max-inner-product centroid for each row vector;
    * `centroids` is a (small) fixed matrix captured at plan time.
    */
  def nearest_centroid(v: Column, centroids: Array[Array[Double]]): Column = {
    val dim = if (centroids.isEmpty) 0 else centroids(0).length
    val flat = new Array[Double](centroids.length * dim)
    var i = 0
    while (i < centroids.length) {
      System.arraycopy(centroids(i), 0, flat, i * dim, dim)
      i += 1
    }
    col(NearestCentroid(expr(v), flat, dim))
  }

  /** Hierarchical (two-level) coarse assignment: exact argmax over the
    * members of the `probeGroups` best centroid groups — the
    * deliberately-approximate √N-scale path [[graft.operators.IvfIndex.assign]]
    * selects above [[NearestCentroid.TwoLevelThreshold]] lists. See
    * [[NearestCentroidHier]] for the trade and determinism contract.
    */
  def nearest_centroid_hier(v: Column, centroids: Array[Array[Double]],
                            probeGroups: Int): Column = {
    val dim = if (centroids.isEmpty) 0 else centroids(0).length
    val flat = new Array[Double](centroids.length * dim)
    var i = 0
    while (i < centroids.length) {
      System.arraycopy(centroids(i), 0, flat, i * dim, dim)
      i += 1
    }
    col(NearestCentroidHier(expr(v), flat, dim, probeGroups,
      NearestCentroid.planFor(flat, dim)))
  }

  /** Top-`n` max-inner-product centroid ids per row (score desc, id asc
    * on ties; element 0 == `nearest_centroid`) — IVF multi-assign for
    * boundary probing.
    */
  def nearest_centroids(v: Column, centroids: Array[Array[Double]], n: Int): Column = {
    require(n >= 1, s"nearest_centroids needs n >= 1, got $n") // n=0 would
    // silently drop every row from downstream banding; n<0 would crash tasks
    val dim = if (centroids.isEmpty) 0 else centroids(0).length
    val flat = new Array[Double](centroids.length * dim)
    var i = 0
    while (i < centroids.length) {
      System.arraycopy(centroids(i), 0, flat, i * dim, dim)
      i += 1
    }
    col(NearestCentroids(expr(v), flat, dim, n))
  }

  /** Reference content-hash id: md5 hex of the normalized vector's
    * little-endian float32 bytes (pico_vdb.py:54-55, 424-427).
    */
  def content_id(v: Column): Column = F.md5(float32_le_bytes(normalize_l2(v)))

  /** 64-bit SimHash signature ('0'/'1' string, msb first) of a token
    * array, from md5-derived token hashes.
    */
  def simhash64(tokens: Column): Column = col(SimHash64(expr(tokens)))

  /** Sorted distinct winnowing fingerprints (md5 hex of n-token
    * shingles, sliding-window minima) of a token array.
    */
  def winnow_fps(tokens: Column, shingleN: Int, windowSize: Int): Column =
    col(WinnowFps(expr(tokens), shingleN, windowSize))

  /** Distinct word n-gram shingles of a token array (first-occurrence
    * order).
    */
  def word_ngrams_distinct(tokens: Column, n: Int): Column =
    col(WordNgramsDistinct(expr(tokens), n))

  /** Per-document n-gram repetition profile:
    * `struct(n_grams, top_frac, dup_frac)` in one codegen pass.
    */
  def repetition_stats(tokens: Column, n: Int): Column =
    col(RepetitionStats(expr(tokens), n))

  /** Bounded-heap top-k aggregate: per group, the k best (id, score)
    * pairs ranked score desc / id asc — only k rows per group cross the
    * shuffle (a row_number Window shuffles every scored row).
    */
  def top_k_hits(score: Column, id: Column, k: Int): Column =
    col(TopKByScore(expr(score), expr(id), k).toAggregateExpression())

  /** Bounded-heap "first k ids" aggregate: per group, the k smallest
    * ids ascending — truncated posting lists without the per-group
    * `row_number` Window funnel (only k ids per group cross the
    * shuffle, map-side partial).
    */
  def min_k_ids(id: Column, k: Int): Column =
    col(MinKIds(expr(id), k).toAggregateExpression())

  /** Element-wise mean of array<float|double> vectors (double
    * accumulation) — chunk→document embedding pooling.
    */
  def vector_avg(v: Column): Column =
    col(VectorAvg(expr(v)).toAggregateExpression())

  /** Cosine similarity of two raw (not necessarily normalized) vectors,
    * computed fully in double: dot / (|a| * |b|). Zero-norm guarded to 0.
    */
  def cosine_sim(a: Column, b: Column): Column = {
    val d  = dot_product(a, b)
    val na = F.sqrt(l2_norm_sq(a))
    val nb = F.sqrt(l2_norm_sq(b))
    F.when(na === 0.0 || nb === 0.0, F.lit(0.0)).otherwise(d / (na * nb))
  }

  /** Register SQL names for the custom expressions on a session. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("normalize_l2", es => NormalizeL2(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("float32_le_bytes", es => Float32LEBytes(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("l2_norm_sq", es => L2NormSq(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64", es => SimHash64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("word_ngrams_distinct",
      es => WordNgramsDistinct(es(0), graft.GraftExtensions.intArg("word_ngrams_distinct", es(1))), "scala_udf")
    reg.createOrReplaceTempFunction("winnow_fps",
      es => WinnowFps(es(0), graft.GraftExtensions.intArg("winnow_fps", es(1)),
        graft.GraftExtensions.intArg("winnow_fps", es(2))), "scala_udf")
    reg.createOrReplaceTempFunction("repetition_stats",
      es => RepetitionStats(es(0), graft.GraftExtensions.intArg("repetition_stats", es(1))), "scala_udf")
    reg.createOrReplaceTempFunction("top_k_hits",
      es => TopKByScore(es(0), es(1), graft.GraftExtensions.intArg("top_k_hits", es(2))), "scala_udf")
    reg.createOrReplaceTempFunction("min_k_ids",
      es => MinKIds(es(0), graft.GraftExtensions.intArg("min_k_ids", es(1))), "scala_udf")
    reg.createOrReplaceTempFunction("vector_avg", es => VectorAvg(es.head), "scala_udf")
  }
}
