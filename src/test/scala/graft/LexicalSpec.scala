package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Lexical

/** Hand-computed BM25 and RRF cases (q63/q64 machinery). */
class LexicalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bm25 matches the hand-computed Okapi/Lucene formula") {
    import spark.implicits._
    // N=3, avgdl=3; terms a, c both have df=2 -> idf = ln(1.6)
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "c c c c"))
      .toDF("doc_id", "text")
    val got = Lexical.bm25(docs, "doc_id", "text", Seq("a", "c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val idf = math.log(1.6)
    val expect = Map(
      1L -> idf * 2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * 3.0 / 3)),
      2L -> idf * 2 * (2.2 / (1 + 1.2 * (0.25 + 0.75 * 2.0 / 3))),
      3L -> idf * 4 * 2.2 / (4 + 1.2 * (0.25 + 0.75 * 4.0 / 3)))
    assert(got.keySet == expect.keySet)
    expect.foreach { case (id, v) =>
      assert(math.abs(got(id) - v) < 1e-9, s"doc $id: ${got(id)} vs $v") }
  }

  test("bm25 ignores docs with no query term") {
    import spark.implicits._
    val docs = Seq((1L, "x y"), (2L, "a x")).toDF("doc_id", "text")
    val got = Lexical.bm25(docs, "doc_id", "text", Seq("a"))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(2L))
  }

  test("rrfFuse sums 1/(k+rank) across lists and counts memberships") {
    import spark.implicits._
    val l1 = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val l2 = Seq((2L, 1), (3L, 2)).toDF("id", "rank")
    val got = Lexical.rrfFuse(Seq(l1, l2), "id", "rank")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(math.abs(got(1L)._1 - 1.0 / 61) < 1e-12 && got(1L)._2 == 1L)
    assert(math.abs(got(2L)._1 - (1.0 / 62 + 1.0 / 61)) < 1e-12 && got(2L)._2 == 2L)
    assert(math.abs(got(3L)._1 - 1.0 / 62) < 1e-12 && got(3L)._2 == 1L)
  }
}
