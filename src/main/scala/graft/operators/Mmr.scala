package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance: diversified top-k re-ranking of a
  * candidate set — the retrieval post-processing step that trades raw
  * relevance against redundancy (`mmr(c) = λ·rel(c) −
  * (1−λ)·max_{s∈S} sim(c, s)`, greedily selecting k of fetchK
  * candidates). Production vector stores ship this next to ANN; the
  * embedding-only reference has no re-ranking surface at all.
  *
  * Spark-first shape: candidate GENERATION is the existing distributed
  * top-k machinery (fetchK per query); the greedy selection itself is
  * O(k·fetchK) cosines over one query's candidates — genuinely
  * per-group sequential work (each pick depends on the previous), so
  * it runs as `flatMapGroups` keyed by query: every query's selection
  * is independent and the cluster processes queries in parallel, with
  * fetchK rows per group. No driver loop, no cross-query barrier.
  *
  * Determinism: candidates are processed in (rel desc, id asc) order
  * and ties in the mmr score break by id asc; pairwise sims use the
  * same sequential-double cosine as the exact scoring path
  * (dot / (|a|·|b|), zero-norm → 0), so the selection is exactly
  * reproducible — q66 holds it to a DuckDB oracle with the greedy
  * steps unrolled in SQL.
  *
  * Scale (100 TB): the expensive part is candidate generation, which
  * inherits the store scan's scaling; the re-rank adds
  * O(Q·k·fetchK·dim) — independent of store size.
  */
object Mmr {

  /** Greedy MMR selection over per-query candidates. Input rows:
    * (qidCol, idCol, relCol double, vecCol array<float>); output:
    * (qid, rank 1-based, id, mmr double, un-rounded). Groups with
    * fewer than k candidates emit what they have. The first pick's
    * score is λ·rel (max-sim over an empty selected set is 0).
    */
  def diversify(cands: DataFrame, qidCol: String, idCol: String,
                relCol: String, vecCol: String, k: Int,
                lambda: Double): Dataset[(Long, Long, Long, Double)] = {
    require(k > 0, s"need k > 0, got $k")
    require(lambda >= 0 && lambda <= 1, s"need lambda in [0,1], got $lambda")
    val spark = cands.sparkSession
    import spark.implicits._
    val lam = lambda
    cands.select(col(qidCol).cast("long"), col(idCol).cast("long"),
        col(relCol).cast("double"), col(vecCol))
      .as[(Long, Long, Double, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (qid: Long, it: Iterator[(Long, Long, Double, Array[Float])]) =>
        // NaN rel can never win `s > bestScore` — drop such candidates
        // up front rather than dereference best = -1 later
        val cs = it.filterNot(c => java.lang.Double.isNaN(c._3))
          .toArray.sortBy(c => (-c._3, c._2))
        val n = cs.length
        val picked = new Array[Boolean](n)
        val maxSim = new Array[Double](n) // max sim to the selected set
        val out = Seq.newBuilder[(Long, Long, Long, Double)]
        var r = 1
        while (r <= math.min(k, n)) {
          var best = -1
          var bestScore = Double.NegativeInfinity
          var i = 0
          while (i < n) {
            if (!picked(i)) {
              val s = lam * cs(i)._3 - (1.0 - lam) * maxSim(i)
              // strict > keeps the earliest (rel desc, id asc) candidate
              // on ties = the smallest id among equal-rel ties
              if (s > bestScore ||
                  (s == bestScore && best >= 0 && cs(i)._2 < cs(best)._2)) {
                best = i; bestScore = s
              }
            }
            i += 1
          }
          out += ((qid, r.toLong, cs(best)._2, bestScore))
          picked(best) = true
          val bv = cs(best)._4
          i = 0
          while (i < n) {
            if (!picked(i)) {
              val s = cosD(cs(i)._4, bv)
              if (s > maxSim(i)) maxSim(i) = s
            }
            i += 1
          }
          r += 1
        }
        out.result().iterator
      }
  }

  /** Sequential-double cosine, bit-matching the exact scoring path
    * (`cosine_sim`: dot / (|a|·|b|), zero-norm guarded to 0).
    */
  private[graft] def cosD(a: Array[Float], b: Array[Float]): Double = {
    val n = a.length
    var d = 0.0; var sa = 0.0; var sb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      d += x * y; sa += x * x; sb += y * y
      i += 1
    }
    val na = math.sqrt(sa); val nb = math.sqrt(sb)
    if (na == 0.0 || nb == 0.0) 0.0 else d / (na * nb)
  }
}
