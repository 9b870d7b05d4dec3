package graft

import org.apache.spark.sql.functions.{col, lit}
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

  test("bm25 duplicate query terms score once; empty corpus yields empty result") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val once = Lexical.bm25(docs, "doc_id", "text", Seq("a"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dup = Lexical.bm25(docs, "doc_id", "text", Seq("a", "a"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(once == dup)
    val empty = docs.filter(col("doc_id") < 0L)
    assert(Lexical.bm25(empty, "doc_id", "text", Seq("a")).count() == 0L)
  }

  test("pmiBigrams on an empty input yields an empty table on both paths (ADVICE r12)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Lexical.pmiBigrams(empty, "text", persistGrams = true).count() == 0L)
    assert(Lexical.pmiBigrams(empty, "text", persistGrams = false).count() == 0L)
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

  test("pmiBigrams matches the hand-computed count ratio") {
    import spark.implicits._
    // corpus: "a b a b" + "a b c" -> bigrams: (a,b)x3, (b,a)x1, (b,c)x1
    // NB=5; unigrams: a=3, b=3, c=1; NU=7
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = Lexical.pmiBigrams(docs, "text", minCount = 3L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set(("a", "b")))
    val (c, pmi) = got(("a", "b"))
    assert(c == 3L)
    val want = math.log((3.0 / 5.0) / ((3.0 / 7.0) * (3.0 / 7.0)))
    assert(math.abs(pmi - BigDecimal(want).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("pmiBigrams drops single-token docs and counts totals pre-filter") {
    import spark.implicits._
    // "z" contributes no bigram but its unigram inflates NU;
    // minCount filters output only, not the normalizers
    val docs = Seq((1L, "a a"), (2L, "z")).toDF("doc_id", "text")
    val got = Lexical.pmiBigrams(docs, "text", minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    // NB=1, NU=3, c(a)=2: pmi = ln((1/1)/((2/3)^2))
    val want = math.log(1.0 / ((2.0 / 3.0) * (2.0 / 3.0)))
    assert(got.keySet == Set(("a", "a")))
    assert(math.abs(got(("a", "a")) - BigDecimal(want).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("pmiBigrams lazy and persisted paths agree row-for-row") {
    import spark.implicits._
    val docs = Seq((1L, "p q p q r"), (2L, "q r q p"), (3L, "p p q"))
      .toDF("doc_id", "text")
    def rows(p: Boolean) =
      Lexical.pmiBigrams(docs, "text", minCount = 1L, persistGrams = p)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
    assert(rows(true) == rows(false))
  }

  test("invertedIndex caps postings, ranks by doc id, and applies minDf") {
    import spark.implicits._
    val docs = Seq((5L, "x y"), (3L, "x y x"), (9L, "x z"), (1L, "x"))
      .toDF("doc_id", "text")
    val rows = Lexical.invertedIndex(docs, "doc_id", "text",
        maxPostings = 3, minDf = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // term x: df=4 but only first 3 postings (1,3,5); term y: df=2; z dropped
    val x = rows.filter(_._1 == "x").sortBy(_._4)
    assert(x.map(t => (t._3, t._4)).toSeq == Seq((1L, 1L), (3L, 2L), (5L, 3L)))
    assert(x.forall(_._2 == 4L))
    val y = rows.filter(_._1 == "y").sortBy(_._4)
    assert(y.map(t => (t._3, t._4)).toSeq == Seq((3L, 1L), (5L, 2L)))
    assert(rows.forall(_._1 != "z"))
  }

  test("invertedIndex: null doc ids count toward neither df nor postings (ADVICE r14)") {
    import spark.implicits._
    val docs = Seq((java.lang.Long.valueOf(5L), "a b"),
        (java.lang.Long.valueOf(3L), "a"),
        (null.asInstanceOf[java.lang.Long], "a b"))
      .toDF("doc_id", "text")
    val rows = Lexical.invertedIndex(docs, "doc_id", "text",
        maxPostings = 4, minDf = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // df and the posting list must AGREE: term a has 2 non-null docs
    // (the null row neither inflates df to 3 nor adds a posting), and
    // term b's only non-null doc leaves it under minDf — dropped, not
    // emitted as df=2 with a one-entry list
    val a = rows.filter(_._1 == "a")
    assert(a.map(_._2).distinct.toSeq == Seq(2L))
    assert(a.map(_._3).sorted.toSeq == Seq(3L, 5L))
    assert(rows.forall(_._1 != "b"))
  }

  test("min_k_ids keeps the k smallest ids ascending (string + long)") {
    import spark.implicits._
    // enough rows to exercise partial-heap merges across partitions
    val longs = spark.range(0, 1000).select((lit(999) - col("id")).as("v"))
      .repartition(8)
      .agg(graft.functions.min_k_ids(col("v"), 5))
      .first().getSeq[Long](0)
    assert(longs == Seq(0L, 1L, 2L, 3L, 4L))
    val strs = Seq("d", "b", "e", "a", "c", "a").toDF("s")
      .repartition(3)
      .agg(graft.functions.min_k_ids(col("s"), 3))
      .first().getSeq[String](0)
    // duplicates are kept (upstream distinct() is the caller's job)
    assert(strs == Seq("a", "a", "b"))
    // SQL registration
    val viaSql = {
      graft.functions.registerAll(spark)
      Seq((1L, 9L), (1L, 3L), (1L, 7L), (2L, 5L)).toDF("g", "v")
        .createOrReplaceTempView("_mk_")
      spark.sql("SELECT g, min_k_ids(v, 2) AS ks FROM _mk_ GROUP BY g ORDER BY g")
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    }
    assert(viaSql == Seq((1L, Seq(3L, 7L)), (2L, Seq(5L))))
  }
}
