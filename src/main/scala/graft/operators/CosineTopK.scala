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

    // Pre-normalize query side once on the driver (double math).
    val qids = queries.map(_._1)
    val qvecs: Array[Array[Double]] = queries.map { case (_, v) =>
      val d = v.map(_.toDouble)
      if (normalized) d
      else {
        val n = math.sqrt(d.map(x => x * x).sum)
        if (n == 0.0) { val e = new Array[Double](d.length); if (e.length > 0) e(0) = 1.0; e }
        else d.map(_ / n)
      }
    }
    val bcQ = spark.sparkContext.broadcast((qids, qvecs))
    val threshold = betterThan.getOrElse(Double.NegativeInfinity)

    // Tile the store rows so the (potentially multi-MB) query matrix is
    // streamed once per TILE, not once per row: loop order is
    // query-outer / tile-row-inner, keeping one query row (~8 KB at
    // dim 1024) hot while it sweeps a ~0.5 MB tile resident in L2.
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

        def flushTile(rows: Int): Unit = {
          var qi = 0
          while (qi < nq) {
            val q = qs(qi)
            val heap = heaps(qi)
            var r = 0
            while (r < rows) {
              val v = tileVecs(r)
              val n = v.length
              var s = 0.0
              var i = 0
              while (i < n) { s += q(i) * v(i); i += 1 }
              if (!normalized) {
                val nm = tileNorms(r)
                s = if (nm == 0.0) q(0) else s / nm
              }
              if (s >= threshold) heap.offer(s, tileIds(r))
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
            var s = 0.0; var i = 0
            while (i < vecF.length) { val x = vecF(i).toDouble; s += x * x; i += 1 }
            tileNorms(fill) = math.sqrt(s)
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
