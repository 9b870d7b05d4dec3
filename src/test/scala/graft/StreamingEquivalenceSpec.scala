package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{VdbRecord, VdbStore}
import graft.streaming.StreamingOps

/** Batch≡stream equivalence harness (VERDICT r12 next-round #5): each
  * streaming sink replays the REAL sf0.001 fixture corpus through
  * micro-batches and must frame-equal the batch operator it twins.
  *
  * The replay discipline per sink encodes its documented contract:
  * order-free sinks (components, distinct-id upsert) get arbitrary
  * shuffled batches; first-seen/first-fit sinks get deliveries whose
  * arrival order realizes the batch operator's canonical order (id
  * order — the equivalence THEOREM those sinks state: stream(arrival =
  * canonical order) == batch). componentsSink already carries this
  * guarantee in StreamingSpec ("labels match a batch recompute"); the
  * five specs here extend it to the remaining sinks.
  */
class StreamingEquivalenceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs: DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Replay `batches` one REAL micro-batch at a time: each step adds
    * one batch and runs the query AvailableNow against the SAME
    * checkpoint, so the next run resumes from committed offsets with
    * carried state — one addData != one micro-batch under a single
    * AvailableNow run (it would fold every pending block into one
    * batch, collapsing the arrival order the equivalence depends on).
    */
  private def replay[A](mem: MemoryStream[A], batches: Seq[Seq[A]])(
      out: org.apache.spark.sql.Dataset[_]): Seq[Row] = {
    val ck = java.nio.file.Files.createTempDirectory("ckeq").toString
    val got = new scala.collection.mutable.ArrayBuffer[Row]
    batches.foreach { b =>
      mem.addData(b)
      val q = out.toDF().writeStream
        .outputMode("append")
        .option("checkpointLocation", ck)
        .foreachBatch { (df: DataFrame, _: Long) =>
          got ++= df.collect(); ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "micro-batch timed out")
    }
    got.toSeq
  }

  test("upsertSink replay equals one batch upsertDF (distinct ids, shuffled batches)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // distinct ids -> merge order across batches cannot matter
    val rows = docs.select(col("doc_id").cast("string").as("_id_"),
        array(length(col("text")).cast("float"),
          size(split(trim(col("text")), "\\s+")).cast("float"),
          (col("doc_id") % 7).cast("float")).as("vector"),
        concat(lit("""{"s":"""), col("doc_id") % 3, lit("}")).as("meta"))
      .collect()
    val shuffled = new scala.util.Random(42).shuffle(rows.toSeq)
    val mem = MemoryStream[(String, Array[Float], String)]
    val streamed = VdbStore.empty(spark, 3)
    val ck = java.nio.file.Files.createTempDirectory("ckeq").toString
    shuffled.grouped(97).foreach { chunk =>
      mem.addData(chunk.map(r =>
        (r.getString(0), r.getSeq[Float](1).toArray, r.getString(2))))
      val q = StreamingOps.upsertSink(mem.toDF().toDF("_id_", "vector", "meta"),
          streamed)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "micro-batch timed out")
    }

    val batchStore = VdbStore.empty(spark, 3)
    batchStore.upsert(rows.map(r => VdbRecord(r.getString(0),
      r.getSeq[Float](1).toArray, r.getString(2))))
    def snap(s: VdbStore) = s.getAll(includeVector = true)
      .map(h => (h.id, h.metaJson, h.vector.map(_.toVector).getOrElse(Vector.empty))).toSet
    assert(streamed.count() == batchStore.count())
    assert(snap(streamed) == snap(batchStore))
  }

  test("chunkIngestSink replay equals one batch chunkEmbedUpsert (chunk ids are order-free)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // chunk ids are deterministic "<doc>#<idx>" and docs are distinct,
    // so any arrival split merges to the batch result
    val corpus = docs.select(col("doc_id"), col("text")).collect()
    val embed: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => array(length(c).cast("float"), size(split(c, " ")).cast("float"), lit(1f))
    val streamed = VdbStore.empty(spark, 3)
    val mem = MemoryStream[(Long, String)]
    val ck = java.nio.file.Files.createTempDirectory("ckeq").toString
    new scala.util.Random(7).shuffle(corpus.toSeq).grouped(120).foreach { chunk =>
      mem.addData(chunk.map(r => (r.getLong(0), r.getString(1))))
      val q = StreamingOps.chunkIngestSink(
          mem.toDF().toDF("doc_id", "text"), streamed, "doc_id", "text",
          embed, chunkSize = 16, overlap = 4)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "micro-batch timed out")
    }
    val batchStore = VdbStore.empty(spark, 3)
    graft.operators.TextChunk.chunkEmbedUpsert(batchStore, docs,
      "doc_id", "text", embed, chunkSize = 16, overlap = 4)
    def snap(s: VdbStore) = s.getAll(includeVector = true)
      .map(h => (h.id, h.metaJson, h.vector.map(_.toVector).getOrElse(Vector.empty)))
      .toSet
    assert(streamed.count() == batchStore.count())
    assert(snap(streamed) == snap(batchStore))
    assert(streamed.count() > docs.count()) // multi-chunk docs exist
  }

  test("dedupStream with id-ordered arrival equals batch exact dedup keep-one") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // the sf0.001 documents are all-distinct — inject duplicates of a
    // third of the corpus at shifted ids so keep-one has real work
    val withDups = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 1000L).as("doc_id"), col("text")))
    // stripe occurrence rank r of each content to micro-batch r: the
    // min-id occurrence of every content arrives in an earlier batch
    // than any other occurrence, and no content repeats within a batch
    // — arrival order realizes the batch min(id) canonical rule
    val ranked = withDups.select(col("doc_id"), col("text"))
      .withColumn("_r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(md5(col("text").cast("binary")))
          .orderBy(col("doc_id"))))
      .collect()
    val mem = MemoryStream[(String, String)]
    val batches = ranked.groupBy(_.getInt(2)).toSeq.sortBy(_._1).map {
      case (_, rs) => rs.toSeq.map(r => (r.getLong(0).toString, r.getString(1)))
    }
    val got = replay(mem, batches)(
        StreamingOps.dedupStream(mem.toDF().toDF("doc_id", "text")))
      .map(r => r.getString(0).toLong).toSet
    val want = graft.operators.Dedup.exact(withDups, "doc_id", "text")
      .collect().map(_.getAs[Long]("keep_id")).toSet
    assert(got == want)
    assert(got.nonEmpty && got.size < withDups.count()) // injected dups collapse
  }

  test("hygieneStream with rank-striped arrival equals batch hygienePipeline") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // q39's exact split and parameters
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val evalSet = docs.filter(col("doc_id") % 10 === 0)
    val rates = Queries.sampleRates
    val want = graft.operators.CorpusClean.hygienePipeline(
        corpus, evalSet, "doc_id", "text", "source", rates,
        broadcastEval = false)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // the stream takes the eval GRAMS (contamN-token shingles of the
    // eval split) — derived with the same expression the batch
    // contamination check uses
    val evalGrams = evalSet.select(explode(graft.functions.word_ngrams_distinct(
        split(trim(col("text")), "\\s+"), 13)).as("g"))
      .distinct().collect().map(_.getString(0)).toSeq
    // rank-striped delivery, same argument as the dedup spec: the
    // dedup stage inside the pipeline sees each content's min id first
    val ranked = corpus.select(col("doc_id"), col("text"), col("source"))
      .withColumn("_r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(md5(col("text").cast("binary")))
          .orderBy(col("doc_id"))))
      .collect()
    val mem = MemoryStream[(String, String, String)]
    val batches = ranked.groupBy(_.getInt(3)).toSeq.sortBy(_._1).map {
      case (_, rs) => rs.toSeq.map(r =>
        (r.getLong(0).toString, r.getString(1), r.getString(2)))
    }
    val got = replay(mem, batches)(StreamingOps.hygieneStream(
        mem.toDF().toDF("doc_id", "text", "source"), evalGrams, rates))
      .map(r => (r.getString(0).toLong, r.getString(2))).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("budgetGateStream with id-ordered arrival equals the batch first-fit fold") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val scored = docs.select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .collect().sortBy(_.getLong(0))
    val budget = 600L // below each source's total -> skipping happens mid-stream
    // batch reference: per-group first-fit in doc_id order — the
    // gate's documented admission rule (skip-and-continue, NOT the
    // q69 prefix rule: q69 ranks globally by quality, which a stream
    // cannot do; see budgetGateStream's scaladoc)
    val want = scored.groupBy(_.getString(1)).toSeq.flatMap { case (_, rs) =>
      var used = 0L
      rs.sortBy(_.getLong(0)).toSeq.flatMap { r =>
        val tok = r.getLong(2)
        if (used + tok <= budget) { used += tok; Some((r.getLong(0), used)) }
        else None
      }
    }.toSet
    // contiguous id-range micro-batches: arrival order = id order
    val mem = MemoryStream[(Long, String, Long)]
    val batches = scored.grouped(83).map(_.toSeq.map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2)))).toSeq
    val got = replay(mem, batches)(StreamingOps.budgetGateStream(
        mem.toDF().toDF("doc_id", "source", "n_tokens"), budget))
      .map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(got == want)
    // the fixture must actually exercise skip-and-continue (a doc
    // skipped, a later smaller one admitted) or the test is vacuous
    val admitted = got.map(_._1)
    val skippedBeforeLastAdmit = scored.groupBy(_.getString(1)).exists {
      case (_, rs) =>
        val ids = rs.map(_.getLong(0)).sorted
        val lastIn = ids.filter(admitted).lastOption
        lastIn.exists(l => ids.exists(i => i < l && !admitted(i)))
    }
    assert(skippedBeforeLastAdmit, "budget too large to exercise skipping")
  }

  test("asofEnrichStream with time-ordered arrival equals batch backward as-of (q60 fixture)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val e = ev.withColumn("us", Queries.tsMicros(ev, "ts"))
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("us"),
        col("event_type").as("kind"))
    val want = Queries.asofAttrib(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // micro-batches grouped on us boundaries: an equal-us (ref, probe)
    // pair never straddles a batch, so the stream's within-batch
    // (us, ref-first, id) order realizes the batch join's inclusive
    // `<=` and max-(us, id) tie rule across the whole replay
    val rows = e.collect().sortBy(r => (r.getLong(2), r.getLong(0)))
    val cuts = rows.map(_.getLong(2)).distinct.sorted
    val groups = rows.groupBy(_.getLong(2))
    val mem = MemoryStream[(Long, Long, Long, String)]
    val batches = cuts.grouped(40).map(_.flatMap(groups(_)).map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq).toSeq
    val got = replay(mem, batches)(StreamingOps.asofEnrichStream(
        mem.toDF().toDF("event_id", "user_id", "us", "kind"), "click"))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == want)
    assert(want.exists(_._3 >= 0L) && want.exists(_._3 == -1L))
  }

  test("hnswSegmentSink replay equals a batch-built store in exact mode; compaction fires") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // append-only ids from the real embeddings fixture, shuffled
    // batches: exact-mode results are segment-layout-free, so the
    // streamed index must frame-equal one batch build over the corpus
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").cast("string"), col("embedding"))
      .as[(String, Array[Float])].collect()
    val shuffled = new scala.util.Random(19).shuffle(emb.toSeq)
    val index = new graft.streaming.HnswSegmentIndex(
      spark, normalize = true, compactAtShards = 3)
    val mem = MemoryStream[(String, Array[Float])]
    val ck = java.nio.file.Files.createTempDirectory("ckeq").toString
    shuffled.grouped(60).foreach { chunk =>
      mem.addData(chunk)
      val q = StreamingOps.hnswSegmentSink(
          mem.toDF().toDF("id", "vec"), index, "id", "vec")
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "micro-batch timed out")
    }
    assert(index.compactions >= 1,
      s"fixture must exercise compaction (shards=${index.shardCount})")
    // growth-based trigger: 9 batches must NOT fold on every batch
    // once the folded count sits at/above the threshold (the
    // review-r13 recompaction loop — a loop here would show ~6+)
    assert(index.compactions <= 3,
      s"per-batch recompaction loop: ${index.compactions} folds")
    assert(index.shardCount <= 4)

    val queries = emb.take(12).zipWithIndex
      .map { case ((_, v), i) => (i.toLong, v) }
    val batchStore = graft.operators.HnswStore.fromDataset[String](
      emb.toSeq.toDS().map(r => (r._1, r._2)), normalize = true, numShards = 2)
    def snap(st: graft.operators.HnswStore[String]) =
      st.searchMerged(queries, k = 10, exact = true)
        .select("qid", "rank", "id", "score").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
        .toSeq.sortBy(t => (t._1, t._2))
    assert(snap(index.store.get) == snap(batchStore))
    // graph mode sanity on the streamed index: full result set
    assert(index.store.get.searchMerged(queries, 10, ef = 96).count() == 120)
    batchStore.unpersist(); index.close()
  }

  test("hnswSegmentSink restart: persisted segments resume with pre-kill rows, zero rebuilds") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").cast("string"), col("embedding"))
      .as[(String, Array[Float])].collect()
    val shuffled = new scala.util.Random(29).shuffle(emb.toSeq)
    val persist = java.nio.file.Files.createTempDirectory("hnswseg").toString
    val ck = java.nio.file.Files.createTempDirectory("ckseg").toString
    val mem = MemoryStream[(String, Array[Float])]
    def run(index: graft.streaming.HnswSegmentIndex,
            chunk: Seq[(String, Array[Float])]): Unit = {
      mem.addData(chunk)
      val q = StreamingOps.hnswSegmentSink(
          mem.toDF().toDF("id", "vec"), index, "id", "vec")
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "micro-batch timed out")
    }
    def snap(st: graft.operators.HnswStore[String]) =
      st.searchMerged(emb.take(10).zipWithIndex.map { case ((_, v), i) => (i.toLong, v) },
          k = 8, exact = true)
        .select("qid", "rank", "id", "score").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
        .toSeq.sortBy(t => (t._1, t._2))

    val chunks = shuffled.grouped(60).toSeq
    val index1 = new graft.streaming.HnswSegmentIndex(
      spark, normalize = true, compactAtShards = 3, persistDir = Some(persist))
    assert(!index1.resumed)
    val (head, tail) = chunks.splitAt(5)
    head.foreach(run(index1, _))
    val rowsPreKill = index1.rowCount
    val wantPreKill = snap(index1.store.get)
    index1.close() // the "kill": memory released, files + checkpoint survive

    val before = graft.core.Hnsw.buildsInJvm
    val index2 = new graft.streaming.HnswSegmentIndex(
      spark, normalize = true, compactAtShards = 3, persistDir = Some(persist))
    assert(index2.resumed, "a manifest under persistDir must resume")
    assert(index2.rowCount == rowsPreKill,
      s"resumed with ${index2.rowCount} rows, pre-kill had $rowsPreKill")
    assert(graft.core.Hnsw.buildsInJvm == before,
      "resume must load graphs, never rebuild them")
    assert(snap(index2.store.get) == wantPreKill,
      "resumed index must serve identically to the pre-kill one")

    // the SAME checkpoint continues: remaining batches land post-resume
    tail.foreach(run(index2, _))
    assert(index2.rowCount == emb.length.toLong)
    val batchStore = graft.operators.HnswStore.fromDataset[String](
      emb.toSeq.toDS(), normalize = true, numShards = 2)
    assert(snap(index2.store.get) == snap(batchStore),
      "streamed-across-a-restart must frame-equal one batch build")

    // restored lastBatchId keeps replay dedup across the restart: a
    // stream against a FRESH checkpoint reuses already-committed batch
    // ids, so its delivery is skipped (the documented append-only rule)
    val mem2 = MemoryStream[(String, Array[Float])]
    mem2.addData(Seq(("dup-x", emb.head._2)))
    val ck2 = java.nio.file.Files.createTempDirectory("ckseg2").toString
    val q2 = StreamingOps.hnswSegmentSink(
        mem2.toDF().toDF("id", "vec"), index2, "id", "vec")
      .option("checkpointLocation", ck2)
      .trigger(Trigger.AvailableNow()).start()
    assert(q2.awaitTermination(120000))
    assert(index2.rowCount == emb.length.toLong,
      "a batch id at/below the restored lastBatchId must be skipped")
    batchStore.unpersist(); index2.close()

    // param mismatch refuses to resume (mixing graphs built under
    // different knobs would silently change recall)
    intercept[IllegalArgumentException] {
      new graft.streaming.HnswSegmentIndex(
        spark, normalize = true, m = 8, compactAtShards = 3,
        persistDir = Some(persist))
    }
  }

  test("hnswSegmentSink resume fails loudly on a corrupt persisted segment") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val persist = java.nio.file.Files.createTempDirectory("hnswsegbad").toString
    val ck = java.nio.file.Files.createTempDirectory("cksegbad").toString
    val index = new graft.streaming.HnswSegmentIndex(
      spark, normalize = true, persistDir = Some(persist))
    val mem = MemoryStream[(String, Array[Float])]
    mem.addData((0 until 40).map(i => (s"r$i", Array.fill(8)(i * 0.1f + 1f))))
    val q = StreamingOps.hnswSegmentSink(
        mem.toDF().toDF("id", "vec"), index, "id", "vec")
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    index.close()
    // corrupt one shard file under the segment dir
    val shardFile = java.nio.file.Files.walk(java.nio.file.Paths.get(persist))
      .filter(_.toString.endsWith(".hnsw")).findFirst().get()
    java.nio.file.Files.write(shardFile, Array[Byte](7, 7, 7))
    // the source batches are gone — a quiet rebuild would drop rows, so
    // the resume must surface the corruption instead
    intercept[Exception] {
      new graft.streaming.HnswSegmentIndex(
        spark, normalize = true, persistDir = Some(persist))
    }
  }
}
