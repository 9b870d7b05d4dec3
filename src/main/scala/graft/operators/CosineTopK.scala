package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{cosine_sim, dot_product}

/** Batch top-k cosine similarity — the reference's only "join"
  * (pico_vdb.py:686-714): score Q query vectors against N stored vectors,
  * keep the best k per query.
  *
  * Two physical paths, chosen like the reference chooses
  * argsort/argpartition (pico_vdb.py:698-713), but for distributed shape:
  *
  *  - `declarative`: broadcast the (small) query side, cross-join, score
  *    with a codegen'd dot product, rank with a window. Catalyst plans the
  *    filter pushdown; right for small Q where the cross product stays
  *    modest. At 1000-executor scale the window shuffles Q*N rows — fine
  *    for Q*N up to ~1e8, wrong beyond.
  *
  *  - `gemm`: broadcast the full query matrix to every partition, stream
  *    the store once, maintain a bounded min-heap per query per partition
  *    (the distributed analog of argpartition), emit only
  *    partitions*Q*k candidate rows, then a tiny final rank. One pass,
  *    no large shuffle — this is the 100 TB path: shuffle volume is
  *    O(partitions * Q * k), independent of N.
  *
  * Output columns: qid, id, score (double), rank.
  */
object CosineTopK {

  /** Tie-break: score desc, then id asc — makes result order fully
    * deterministic (NumPy argsort stability analog, SURVEY §7.4).
    */
  def declarative(
      store: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      qidCol: String,
      qvecCol: String,
      k: Int,
      betterThan: Option[Double] = None,
      normalized: Boolean = false): DataFrame = {
    val q = queries.select(col(qidCol).as("qid"), col(qvecCol).as("_qvec_"))
    val scoreCol =
      if (normalized) dot_product(col("_qvec_"), col(vecCol))
      else cosine_sim(col("_qvec_"), col(vecCol))
    val scored = store
      .crossJoin(broadcast(q))
      .select(col("qid"), col(idCol).as("id"), scoreCol.as("score"))
    val thresholded = betterThan.map(t => scored.filter(col("score") >= t)).getOrElse(scored)
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id").asc)
    thresholded
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** One-pass scoring with per-partition bounded heaps.
    * Queries are collected to the driver (they are the small side by
    * construction) and broadcast; the store is streamed exactly once.
    */
  def gemm(
      store: DataFrame,
      idCol: String,
      vecCol: String,
      queries: Array[(Long, Array[Float])],
      k: Int,
      betterThan: Option[Double] = None,
      normalized: Boolean = false): DataFrame = {
    val spark = store.sparkSession
    import spark.implicits._

    // Pre-normalize query side once on the driver (double math, then cast
    // to float32 — mirrors the reference's float32 query matrix,
    // pico_vdb.py:26, 583-591).
    val qids = queries.map(_._1)
    val qvecs: Array[Array[Float]] = queries.map { case (_, v) =>
      if (normalized) v
      else {
        val d = v.map(_.toDouble)
        val n = math.sqrt(d.map(x => x * x).sum)
        if (n == 0.0) { val e = new Array[Float](v.length); if (e.length > 0) e(0) = 1f; e }
        else d.map(x => (x / n).toFloat)
      }
    }
    val bcQ = spark.sparkContext.broadcast((qids, qvecs))
    val threshold = betterThan.getOrElse(Double.NegativeInfinity)

    // Tile the store rows so the (potentially multi-MB) query matrix is
    // streamed once per TILE, not once per row; inside a tile, queries go
    // 4-at-a-time through the SIMD dot4 kernel so each ~0.5 MB tile row
    // is loaded once per 4 queries (bandwidth, not FLOPs, is the binding
    // constraint once the FMA chain is vectorized).
    val tileSize = 128
    val candidates = store
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val (ids, qs) = bcQ.value
        val nq = qs.length
        val heaps = Array.fill(nq)(new BoundedTopK(k))
        val tileIds = new Array[Long](tileSize)
        val tileVecs = new Array[Array[Float]](tileSize)
        val tileNorms = new Array[Double](tileSize)
        val out = new Array[Float](4)

        def finish(qi: Int, raw: Double, r: Int): Unit = {
          var s = raw
          if (!normalized) {
            val nm = tileNorms(r)
            s = if (nm == 0.0) qs(qi)(0).toDouble else s / nm
          }
          if (s >= threshold) heaps(qi).offer(s, tileIds(r))
        }

        def flushTile(rows: Int): Unit = {
          var qi = 0
          val nq4 = nq - 3
          while (qi < nq4) {
            val q0 = qs(qi); val q1 = qs(qi + 1); val q2 = qs(qi + 2); val q3 = qs(qi + 3)
            var r = 0
            while (r < rows) {
              Kernels.dot4F(q0, q1, q2, q3, tileVecs(r), out)
              finish(qi, out(0).toDouble, r)
              finish(qi + 1, out(1).toDouble, r)
              finish(qi + 2, out(2).toDouble, r)
              finish(qi + 3, out(3).toDouble, r)
              r += 1
            }
            qi += 4
          }
          while (qi < nq) {
            val q = qs(qi)
            var r = 0
            while (r < rows) {
              finish(qi, Kernels.dotF(q, tileVecs(r)).toDouble, r)
              r += 1
            }
            qi += 1
          }
        }

        var fill = 0
        it.foreach { case (rid, vecF) =>
          tileIds(fill) = rid
          tileVecs(fill) = vecF
          if (!normalized) {
            tileNorms(fill) = math.sqrt(Kernels.normSqF(vecF).toDouble)
          }
          fill += 1
          if (fill == tileSize) { flushTile(fill); fill = 0 }
        }
        if (fill > 0) flushTile(fill)

        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.drain().map { case (s, rid) => (ids(qi), rid, s) }
        }
      }
      .toDF("qid", "id", "score")

    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id").asc)
    candidates.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}

/** Fixed-capacity top-k accumulator: min-heap on (score, id) with the
  * deterministic tie-break score desc / id asc. offer() is O(log k) only
  * when the candidate beats the current floor.
  */
final class BoundedTopK(k: Int) {
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var size = 0

  // ordering: a "worse" element is smaller score, or equal score with larger id
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  def offer(s: Double, id: Long): Unit = {
    if (size < k) {
      scores(size) = s; ids(size) = id; size += 1
      siftUp(size - 1)
    } else if (k > 0 && worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      siftDown(0)
    }
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worse(scores(i), ids(i), scores(p), ids(p))) {
        swap(i, p); i = p
      } else return
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    var continue = true
    while (continue) {
      val l = 2 * i + 1; val r = l + 1
      var m = i
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m != i) { swap(i, m); i = m } else continue = false
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val ts = scores(i); scores(i) = scores(j); scores(j) = ts
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
  }

  def drain(): Iterator[(Double, Long)] =
    (0 until size).iterator.map(i => (scores(i), ids(i)))
}
