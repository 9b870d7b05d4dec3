package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextChunk

/** Chunk-boundary arithmetic and the chunk->embed->upsert ingest flow
  * (the driver oracle covers the boundary math at corpus scale; this
  * spec pins the edge cases and the store round-trip).
  */
class TextChunkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def doc(n: Int): (Long, String) =
    (n.toLong, (1 to n).map(i => s"t$i").mkString(" "))

  test("chunk counts and boundaries: coverage, overlap, no contained chunks") {
    // chunkSize=8, overlap=3, stride=5
    val df = Seq(doc(2), doc(3), doc(8), doc(9), doc(23)).toDF("doc_id", "text")
    val out = TextChunk.chunk(df, "doc_id", "text", chunkSize = 8, overlap = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(t => (t._1, t._2))
    val byDoc = out.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // n <= overlap -> 1 chunk; n == chunkSize -> 1; n == chunkSize+1 -> 2
    assert(byDoc(2L).length == 1 && byDoc(3L).length == 1)
    assert(byDoc(8L).length == 1)
    assert(byDoc(9L).length == 2)
    // n=23: 1 + floor((23-3-1)/5) = 4 chunks at starts 0,5,10,15
    assert(byDoc(23L).length == 4)
    // full coverage: last chunk reaches the last token
    val last = byDoc(23L).last
    assert(last._4.split(" ").last == "t23")
    // consecutive chunks share exactly `overlap` tokens when full
    val c0 = byDoc(23L)(0)._4.split(" ")
    val c1 = byDoc(23L)(1)._4.split(" ")
    assert(c0.takeRight(3).sameElements(c1.take(3)))
    // n_tokens clips at the document end: chunk 3 covers 16..23 = 8 full
    assert(byDoc(23L).map(_._3) sameElements Array(8L, 8L, 8L, 8L))
    assert(byDoc(9L).map(_._3) sameElements Array(8L, 4L))
  }

  test("leading/trailing/odd whitespace mints no phantom tokens (str.split parity)") {
    val df = Seq(
      (1L, "  hello world\n"),     // edge whitespace incl. newline
      (2L, "a\tb\nc"),             // tab/newline separators
      (3L, "   \n  ")              // whitespace-only -> zero tokens, no chunks
    ).toDF("doc_id", "text")
    val out = TextChunk.chunk(df, "doc_id", "text", chunkSize = 8, overlap = 3)
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getString(4)))
    assert(out.toSeq == Seq((1L, 2L, "hello world"), (2L, 3L, "a b c")))
  }

  test("chunk ids are deterministic and unique") {
    val df = Seq(doc(23), doc(9)).toDF("doc_id", "text")
    val ids = TextChunk.chunk(df, "doc_id", "text", 8, 3)
      .select("chunk_id").as[String].collect()
    assert(ids.distinct.length == ids.length)
    assert(ids.contains("23#0") && ids.contains("23#3") && ids.contains("9#1"))
  }

  test("chunkEmbedUpsert ingests every chunk; re-ingest is all updates") {
    val df = Seq(doc(23), doc(9), doc(2)).toDF("doc_id", "text")
    val store = graft.core.VdbStore.empty(spark, 3)
    // deterministic fake embedding: 3-dim from length + token count
    val embed: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => array(length(c).cast("float"),
        size(split(c, " ")).cast("float"), lit(1f))
    val (u1, i1) = TextChunk.chunkEmbedUpsert(store, df, "doc_id", "text",
      embed, chunkSize = 8, overlap = 3)
    assert(u1 == 0 && i1 == 7) // 4 + 2 + 1 chunks
    assert(store.count() == 7)
    val (u2, i2) = TextChunk.chunkEmbedUpsert(store, df, "doc_id", "text",
      embed, chunkSize = 8, overlap = 3)
    assert(u2 == 7 && i2 == 0) // same chunk ids -> pure update
    assert(store.count() == 7)
    // chunk metadata round-trips through the store meta column
    val hit = store.get(Seq("23#1")).head
    assert(hit.metaJson.exists(_.contains("\"chunk_idx\":1")))
  }

  test("chunkChars mirrors the reference's len//N+1 arithmetic incl. the empty-tail quirk") {
    val df = Seq(
      (1L, "abcdefgh"),  // 8 chars, size 4 -> 3 chunks: abcd, efgh, ""
      (2L, "abcdefghi"), // 9 chars -> 3 chunks: abcd, efgh, i
      (3L, "ab"),        // 1 chunk
      (4L, "")           // empty doc -> 1 empty chunk (reference embeds it)
    ).toDF("doc_id", "text")
    val out = TextChunk.chunkChars(df, "doc_id", "text", chunkSize = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq(
      (1L, 0L, 4L, "abcd"), (1L, 1L, 4L, "efgh"), (1L, 2L, 0L, ""),
      (2L, 0L, 4L, "abcd"), (2L, 1L, 4L, "efgh"), (2L, 2L, 1L, "i"),
      (3L, 0L, 2L, "ab"),
      (4L, 0L, 0L, "")))
  }

  test("re-ingesting a shrunken document prunes its stale higher-index chunks") {
    val store = graft.core.VdbStore.empty(spark, 3)
    val embed: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => array(length(c).cast("float"), lit(1f), lit(0f))
    val long = Seq((7L, (1 to 23).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    TextChunk.chunkEmbedUpsert(store, long, "doc_id", "text", embed, 8, 3)
    assert(store.count() == 4) // 7#0..7#3
    // edited shorter: 9 tokens -> 2 chunks; 7#2, 7#3 must not survive
    val short = Seq((7L, (1 to 9).map(i => s"s$i").mkString(" "))).toDF("doc_id", "text")
    val (u, i) = TextChunk.chunkEmbedUpsert(store, short, "doc_id", "text", embed, 8, 3)
    assert(u == 2 && i == 0)
    assert(store.count() == 2)
    assert(store.get(Seq("7#2", "7#3")).isEmpty)
    assert(store.get(Seq("7#0", "7#1")).size == 2)
    // a foreign row whose USER meta reuses the doc_id/chunk_idx keys but
    // whose id is not this pipeline's "<doc>#<idx>" shape must survive
    store.upsert(Seq(graft.core.VdbRecord("xyz", Array(1f, 0f, 0f),
      """{"doc_id": "7", "chunk_idx": 10}""")))
    // shrink to ZERO: an emptied document still supersedes (deletes) all
    // its chunks even though it yields no chunk rows
    val emptied = Seq((7L, "   ")).toDF("doc_id", "text")
    val (u0, i0) = TextChunk.chunkEmbedUpsert(store, emptied, "doc_id", "text", embed, 8, 3)
    assert(u0 == 0 && i0 == 0)
    assert(store.get(Seq("7#0", "7#1")).isEmpty)
    assert(store.get(Seq("xyz")).size == 1) // foreign row untouched
    assert(store.count() == 1)
    // pruneStale=false keeps the orphans (the documented opt-out)
    val store2 = graft.core.VdbStore.empty(spark, 3)
    TextChunk.chunkEmbedUpsert(store2, long, "doc_id", "text", embed, 8, 3)
    TextChunk.chunkEmbedUpsert(store2, short, "doc_id", "text", embed, 8, 3,
      pruneStale = false)
    assert(store2.count() == 4)
  }
}
