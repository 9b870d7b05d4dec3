package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AsOfJoin, RangeJoin}

/** Hand-computed cases for the two join operators Spark lacks natively:
  * backward as-of join (q60) and the bucketed epsilon range join (q61).
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("asof backward picks latest right row at-or-before, ties by tieBreak") {
    import spark.implicits._
    val left = Seq(
      (10L, 1L, 100L), // key 1 @100: rights at 50, 100 -> inclusive pick @100
      (11L, 1L, 60L),  // key 1 @60: right @50
      (12L, 1L, 40L),  // key 1 @40: no right at/before -> null
      (13L, 2L, 500L), // key 2 @500: two rights tied @500 -> max tieBreak 901
      (14L, 3L, 10L))  // key 3: no rights at all -> null
      .toDF("event_id", "user_id", "us")
    val right = Seq(
      (800L, 1L, 50L), (801L, 1L, 100L), (802L, 1L, 101L), // 802 is future
      (900L, 2L, 500L), (901L, 2L, 500L))
      .toDF("click_id", "user_id", "click_us")
    val out = AsOfJoin.backward(left, right,
        leftKey = "user_id", rightKey = "user_id",
        leftTime = "us", rightTime = "click_us",
        leftCols = Seq("event_id", "user_id", "us"),
        rightPayload = Seq("click_id", "click_us"), tieBreak = "click_id")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out == Map(10L -> 801L, 11L -> 800L, 12L -> -1L,
      13L -> 901L, 14L -> -1L))
  }

  test("asof forward picks earliest right at-or-after, ties by MIN tieBreak") {
    import spark.implicits._
    val left = Seq(
      (10L, 1L, 100L), // rights at 100 (inclusive), 150 -> pick @100
      (11L, 1L, 101L), // right @150
      (12L, 1L, 200L), // nothing at/after -> null
      (13L, 2L, 500L)) // two rights tied @500 -> MIN tieBreak 900
      .toDF("event_id", "user_id", "us")
    val right = Seq(
      (800L, 1L, 100L), (801L, 1L, 150L), (802L, 1L, 50L), // 802 is past
      (900L, 2L, 500L), (901L, 2L, 500L))
      .toDF("click_id", "user_id", "click_us")
    val out = AsOfJoin.forward(left, right, "user_id", "user_id",
        "us", "click_us", Seq("event_id"), Seq("click_id"), "click_id")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out == Map(10L -> 800L, 11L -> 801L, 12L -> -1L, 13L -> 900L))
  }

  test("asof tolerance nulls out matches beyond the max gap") {
    import spark.implicits._
    val left = Seq((1L, 1L, 100L), (2L, 1L, 300L)).toDF("id", "k", "t")
    val right = Seq((7L, 1L, 90L)).toDF("rid", "k", "rt")
    def run(tol: Option[Long]) =
      AsOfJoin.backward(left, right, "k", "k", "t", "rt",
          Seq("id"), Seq("rid"), "rid", tolerance = tol)
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
    // no tolerance: both lefts match the @90 right (gaps 10 and 210)
    assert(run(None) == Map(1L -> 7L, 2L -> 7L))
    // tolerance 50: only the gap-10 match survives
    assert(run(Some(50L)) == Map(1L -> 7L, 2L -> -1L))
  }

  test("asof backward equals per-row brute force on random data with heavy ties") {
    import spark.implicits._
    val rng = new scala.util.Random(4242)
    // 200 lefts + 300 rights over 6 keys and a tiny time domain (0..29)
    // so equal-time ties and multi-candidate matches are common
    val left = (0 until 200).map(i => (i.toLong, rng.nextInt(6).toLong, rng.nextInt(30).toLong))
    val right = (0 until 300).map(i => (1000L + i, rng.nextInt(6).toLong, rng.nextInt(30).toLong))
    val got = AsOfJoin.backward(
        left.toDF("event_id", "user_id", "us"),
        right.toDF("click_id", "user_id", "click_us"),
        "user_id", "user_id", "us", "click_us",
        Seq("event_id"), Seq("click_id"), "click_id")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    val want = left.map { case (id, k, t) =>
      val c = right.filter(r => r._2 == k && r._3 <= t)
      id -> (if (c.isEmpty) -1L else c.maxBy(r => (r._3, r._1))._1)
    }.toMap
    assert(got == want)
  }

  test("range selfWithin equals brute force on random data") {
    import spark.implicits._
    val rng = new scala.util.Random(77)
    val rows = (0 until 250).map(i =>
      (rng.nextInt(5).toLong, i.toLong, rng.nextInt(100).toLong))
    val got = RangeJoin.selfWithin(rows.toDF("k", "id", "t"), "k", "id", "t",
        delta = 7L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      a <- rows; b <- rows
      if a._1 == b._1 && a._2 < b._2 && math.abs(a._3 - b._3) <= 7
    } yield (a._2, b._2)).toSet
    assert(got == want)
  }

  test("asof backward rejects scratch-name collisions") {
    import spark.implicits._
    val df = Seq((1L, 2L, 3L)).toDF("_k_", "user_id", "us")
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(df, df, "user_id", "user_id", "us", "us",
        Seq("_k_", "us"), Seq("us"), tieBreak = "us")
    }
  }

  test("range selfWithin finds each pair exactly once, incl. cross-bucket") {
    import spark.implicits._
    // delta = 10; buckets are [0,10), [10,20), ...
    val rows = Seq(
      (1L, 100L, 3L),   // pairs with 101 (gap 8, cross-bucket), 102 (gap 9)
      (1L, 101L, 11L),
      (1L, 102L, 12L),  // pairs with 101 (gap 1)
      (1L, 103L, 25L),  // pairs with nothing (gap 13 to 102)
      (2L, 200L, 3L),   // other key: no cross-key pairs
      (1L, 104L, 3L))   // same ts as 100: gap 0 pair, plus 101/102
      .toDF("user_id", "event_id", "us")
    val got = RangeJoin.selfWithin(rows, "user_id", "event_id", "us", delta = 10L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      (100L, 101L, 8L), (100L, 102L, 9L), (100L, 104L, 0L),
      (101L, 102L, 1L), (101L, 104L, 8L), (102L, 104L, 9L)))
  }

  test("range selfWithin buckets exactly at epoch-nanos magnitudes (> 2^53)") {
    import spark.implicits._
    // 1.7e18 exceeds double's exact-integer range: a floor(t/delta)
    // computed in double arithmetic mis-buckets here; the long
    // floor-division must keep pairs and gaps exact
    val t0 = 1699999999999999999L
    val d = 10000000000L // 10 s in nanos
    val rows = Seq((1L, 1L, t0), (1L, 2L, t0 + d - 1), (1L, 3L, t0 + d + 2))
      .toDF("k", "id", "t")
    val got = RangeJoin.selfWithin(rows, "k", "id", "t", delta = d)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((1L, 2L, d - 1), (2L, 3L, 3L)))
  }

  test("range selfWithin emits no duplicates when both rows share a bucket") {
    import spark.implicits._
    val rows = Seq((1L, 1L, 5L), (1L, 2L, 6L)).toDF("k", "id", "t")
    val got = RangeJoin.selfWithin(rows, "k", "id", "t", delta = 100L).collect()
    assert(got.length == 1 && got.head.getLong(3) == 1L)
  }
}
