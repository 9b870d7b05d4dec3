package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Mmr

/** Hand cases for MMR diversified re-ranking (q66 machinery). */
class MmrSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // q = (1, 0); a is the query direction, b nearly duplicates a,
  // c is genuinely diverse (45 degrees)
  private def cands = {
    import spark.implicits._
    val q = Array(1f, 0f)
    Seq(
      (10L, 1L, Array(1f, 0f)),
      (10L, 2L, Array(1f, 0.001f)),
      (10L, 3L, Array(0.7071f, 0.7071f)))
      .map { case (qid, id, v) => (qid, id, Mmr.cosD(q, v), v) }
      .toDF("qid", "id", "rel", "vec")
  }

  test("high lambda ranks by relevance, low lambda promotes diversity") {
    val rel = Mmr.diversify(cands, "qid", "id", "rel", "vec", k = 3, lambda = 0.7)
      .collect().sortBy(_._2).map(_._3).toSeq
    assert(rel == Seq(1L, 2L, 3L)) // near-dup b stays ahead of diverse c
    val div = Mmr.diversify(cands, "qid", "id", "rel", "vec", k = 3, lambda = 0.3)
      .collect().sortBy(_._2).map(_._3).toSeq
    assert(div == Seq(1L, 3L, 2L)) // diversity pulls c above the near-dup
  }

  test("first pick scores lambda*rel; k beyond group size emits the group") {
    val rows = Mmr.diversify(cands, "qid", "id", "rel", "vec", k = 9, lambda = 0.5)
      .collect().sortBy(_._2)
    assert(rows.length == 3)
    assert(math.abs(rows.head._4 - 0.5 * 1.0) < 1e-12) // rel(a) = 1
    assert(rows.map(_._1).toSet == Set(10L))
  }

  test("equal-score ties break by smaller id (duplicate candidates)") {
    import spark.implicits._
    val q = Array(1f, 0f)
    val dup = Seq((10L, 7L, Array(1f, 0f)), (10L, 5L, Array(1f, 0f)))
      .map { case (qid, id, v) => (qid, id, Mmr.cosD(q, v), v) }
      .toDF("qid", "id", "rel", "vec")
    val out = Mmr.diversify(dup, "qid", "id", "rel", "vec", k = 2, lambda = 0.75)
      .collect().sortBy(_._2).map(_._3).toSeq
    assert(out == Seq(5L, 7L))
  }
}
