package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Dedup operator behaviors not covered by the driver oracle: LSH
  * bucket capping and the IVF-blocked full-corpus embedding near-dup.
  */
class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("minhashLSH maxBucket drops oversized buckets, uncapped finds the pairs") {
    // 6 identical docs share every band bucket -> bucket size 6
    val docs = ((0 until 6).map(i => (i.toLong, "alpha beta gamma delta epsilon zeta")) :+
      (99L, "totally different words entirely here now")).toDF("doc_id", "text")
    val open = Dedup.minhashLSH(docs, "doc_id", "text").collect()
    assert(open.length == 15) // C(6,2) identical pairs
    val capped = Dedup.minhashLSH(docs, "doc_id", "text", maxBucket = Some(3)).collect()
    assert(capped.isEmpty) // hot bucket dropped before the self-join
  }

  test("IVF-blocked embedding near-dup finds the same pairs as brute force on clustered data") {
    val rng = new scala.util.Random(5)
    // 3 tight clusters of 20 vectors in 8-dim
    val data = for {
      c <- 0 until 3
      i <- 0 until 20
    } yield {
      val v = new Array[Float](8)
      v(2 * c) = 1f
      (0 until 8).foreach(j => v(j) = v(j) + (rng.nextFloat() - 0.5f) * 0.05f)
      ((c * 20 + i).toLong, v)
    }
    val df = data.toDF("vec_id", "vec")
    val blocked = Dedup.embNearDupBlocked(df, "vec_id", "vec",
        threshold = 0.99, nList = 3)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def cos(x: Array[Float], y: Array[Float]): Double = {
      val d = x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      val nx = math.sqrt(x.map(p => p.toDouble * p).sum)
      val ny = math.sqrt(y.map(p => p.toDouble * p).sum)
      d / (nx * ny)
    }
    val brute = (for {
      (ia, va) <- data
      (ib, vb) <- data
      if ia < ib && cos(va, vb) >= 0.99
    } yield (ia, ib)).toSet
    assert(brute.nonEmpty)
    assert(blocked == brute) // tight clusters: no boundary loss
  }
}
