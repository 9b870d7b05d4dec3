package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Sessionize, TextChunk}

/** Hand-computed cases for the two bookkeeping pipeline operators:
  * gap-based sessionization (q53) and training-sequence packing (q54).
  */
class SessionizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val M = 60L * 1000 * 1000 * 1000 // one minute in nanos

  test("sessionize cuts on gap > threshold, per key, tie-broken by id") {
    import spark.implicits._
    val events = Seq(
      // user 1: 0min, 10min, 50min (gap 40 > 30 -> new session), 60min
      (1L, 0L * M, 100L, 1.0),
      (1L, 10L * M, 101L, 2.0),
      (1L, 50L * M, 102L, 4.0),
      (1L, 60L * M, 103L, 8.0),
      // user 2: single event
      (2L, 5L * M, 200L, 16.0),
      // user 3: same-ts pair (tie on ts -> ordered by event_id, gap 0)
      (3L, 7L * M, 301L, 32.0),
      (3L, 7L * M, 300L, 64.0))
      .toDF("user_id", "ts", "event_id", "value")
    val labeled = Sessionize.sessionize(events, "user_id", "ts", "event_id",
        gap = 30L * M)
      .select(col("user_id"), col("event_id"), col("session_seq")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(labeled == Map(
      (1L, 100L) -> 1L, (1L, 101L) -> 1L, (1L, 102L) -> 2L, (1L, 103L) -> 2L,
      (2L, 200L) -> 1L, (3L, 301L) -> 1L, (3L, 300L) -> 1L))

    val stats = Sessionize.sessionStats(events, "user_id", "ts", "event_id",
        "value", gap = 30L * M)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(stats((1L, 1L)) == ((2L, 0L, 10L * M, 3.0)))
    assert(stats((1L, 2L)) == ((2L, 50L * M, 60L * M, 12.0)))
    assert(stats((2L, 1L)) == ((1L, 5L * M, 5L * M, 16.0)))
    assert(stats((3L, 1L)) == ((2L, 7L * M, 7L * M, 96.0)))
  }

  test("sessionize: exactly-at-gap events stay in the same session") {
    import spark.implicits._
    val events = Seq((1L, 0L, 1L, 1.0), (1L, 30L * M, 2L, 1.0))
      .toDF("user_id", "ts", "event_id", "value")
    val seqs = Sessionize.sessionize(events, "user_id", "ts", "event_id",
        gap = 30L * M)
      .select(col("session_seq")).collect().map(_.getLong(0)).toSet
    assert(seqs == Set(1L)) // gap == threshold is NOT > threshold
  }

  test("packSequences: start-bin attribution over a per-shard token cumsum") {
    import spark.implicits._
    // one shard (nShards=1), seqLen 10; token counts 4, 8, 3, 12, 5
    // offsets: 0, 4, 12, 15, 27 -> bins 0, 0, 1, 1, 2
    val docs = Seq(
      (0L, "a b c d"),
      (1L, "a b c d e f g h"),
      (2L, "x y z"),
      (3L, (1 to 12).map(_ => "t").mkString(" ")),
      (4L, "p q r s t"))
      .toDF("doc_id", "text")
    val got = TextChunk.packSequences(docs, "doc_id", "text",
        seqLen = 10, nShards = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      (0L, 0L) -> ((2L, 12L)),  // docs 0,1 start in bin 0 (12 tokens)
      (0L, 1L) -> ((2L, 15L)),  // docs 2,3 start in bin 1
      (0L, 2L) -> ((1L, 5L))))  // doc 4 starts in bin 2
  }

  test("packSequences derives its shard default from input parallelism") {
    import spark.implicits._
    // shard count IS the stage's parallelism (VERDICT r10 #7): the
    // derived default must track the input's partition count, floored
    // at the old fixed default of 8; an explicit value always wins
    val docs = (0L until 64L).map(i => (i, "a b c")).toDF("doc_id", "text")
    def shards(df: org.apache.spark.sql.DataFrame, n: Int): Long =
      TextChunk.packSequences(df.repartition(n), "doc_id", "text", 16)
        .select("shard").distinct().count()
    assert(shards(docs, 16) == 16)  // derived: 16 partitions -> 16 shards
    assert(shards(docs, 2) == 8)    // floor: never below the old default
    val explicit = TextChunk.packSequences(docs.repartition(16), "doc_id",
        "text", 16, nShards = 4)
      .select("shard").distinct().count()
    assert(explicit == 4)           // explicit parameter wins
  }

  test("packSequences shards independently and deterministically") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, ("w " * (1 + (i % 5).toInt)).trim))
      .toDF("doc_id", "text")
    val a = TextChunk.packSequences(docs, "doc_id", "text", 16, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val b = TextChunk.packSequences(docs.repartition(7), "doc_id", "text", 16, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(a == b)
    assert(a.map(_._1) == Set(0L, 1L, 2L, 3L)) // every shard populated
    // token mass conserved: sum over bins == sum of per-doc counts
    assert(a.toSeq.map(_._4).sum == (0L until 40L).map(i => 1 + (i % 5)).sum)
  }
}
