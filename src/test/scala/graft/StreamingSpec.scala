package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{VdbRecord, VdbStore}
import graft.streaming.StreamingOps

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streaming upsert sink merges micro-batches into the store") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Array[Float], String)]
    val stream = mem.toDF().toDF("_id_", "vector", "meta")
    val store = VdbStore.empty(spark, 3)
    store.upsert(Seq(VdbRecord("seed", Array(0f, 0f, 1f), null)))

    mem.addData(("a", Array(1f, 0f, 0f), """{"s": 1}"""),
      ("b", Array(0f, 1f, 0f), null))
    val q = StreamingOps.upsertSink(stream, store)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    assert(store.count() == 3)
    assert(store.queryOne(Array(1f, 0f, 0f), topK = 1).head.id == "a")
  }

  test("streaming chunk-ingest sink: chunks land per micro-batch; redelivery is idempotent") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val store = VdbStore.empty(spark, 3)
    val embed: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => array(length(c).cast("float"), size(split(c, " ")).cast("float"), lit(1f))
    def run(): Unit = {
      val q = StreamingOps.chunkIngestSink(stream, store, "doc_id", "text",
          embed, chunkSize = 8, overlap = 3)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      ()
    }
    val doc23 = (1 to 23).map(i => s"t$i").mkString(" ")
    mem.addData((7L, doc23)) // 4 chunks at size 8 / stride 5
    run()
    assert(store.count() == 4)
    assert(store.get(Seq("7#0", "7#3")).size == 2)
    mem.addData((7L, doc23)) // redelivered: same chunk ids -> pure update
    run()
    assert(store.count() == 4)
  }

  test("stateful streaming dedup emits only first-seen content across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val dedup = graft.streaming.StreamingOps.dedupStream(stream)

    mem.addData(("d1", "alpha beta"), ("d2", "gamma"), ("d3", "alpha beta"))
    val q = dedup.toDF("doc_id", "text").writeStream.outputMode("append")
      .format("memory").queryName("dedup1")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val batch1 = spark.table("dedup1").as[(String, String)].collect().toSet
    assert(batch1 == Set(("d1", "alpha beta"), ("d2", "gamma"))) // d3 is a dup

    // later micro-batch: duplicate of earlier content is suppressed by state
    mem.addData(("d4", "gamma"), ("d5", "delta"))
    val q2 = dedup.toDF("doc_id", "text").writeStream.outputMode("append")
      .format("memory").queryName("dedup2")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination(60000)
    val all = spark.table("dedup2").as[(String, String)].collect().toSet
    // fresh checkpoint replays everything: d1/d2 first-seen, then d5; d3/d4 dups
    assert(all == Set(("d1", "alpha beta"), ("d2", "gamma"), ("d5", "delta")))
  }

  test("budget gate admits per-group tokens first-fit across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val stream = mem.toDF().toDF("doc_id", "source", "n_tokens")
    val gate = graft.streaming.StreamingOps.budgetGateStream(stream, budgetPerGroup = 10L)

    // batch 1: A uses 4+5=9 (doc 3's 6 skipped, doc 4's 1 still fits);
    // B fits both
    mem.addData((1L, "A", 4L), (2L, "A", 5L), (3L, "A", 6L), (4L, "A", 1L),
      (10L, "B", 7L), (11L, "B", 3L))
    val q = gate.toDF("doc_id", "source", "n_tokens", "cum")
      .writeStream.outputMode("append").format("memory").queryName("gate1")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val b1 = spark.table("gate1").as[(Long, String, Long, Long)].collect().toSet
    assert(b1 == Set((1L, "A", 4L, 4L), (2L, "A", 5L, 9L), (4L, "A", 1L, 10L),
      (10L, "B", 7L, 7L), (11L, "B", 3L, 10L)))

    // batch 2 (fresh checkpoint replays all): A is at 10 after batch 1,
    // so every further A doc is rejected; group C starts fresh
    mem.addData((5L, "A", 1L), (20L, "C", 9L))
    val q2 = gate.toDF("doc_id", "source", "n_tokens", "cum")
      .writeStream.outputMode("append").format("memory").queryName("gate2")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination(60000)
    val all = spark.table("gate2").as[(Long, String, Long, Long)].collect().toSet
    assert(all == b1 + ((20L, "C", 9L, 9L))) // doc 5 rejected: A exhausted
  }

  test("streaming as-of enrichment: event-time within a batch, latest-known across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String)]
    val stream = mem.toDF().toDF("event_id", "user_id", "us", "kind")
    val enriched = graft.streaming.StreamingOps.asofEnrichStream(stream)

    // one long-lived query; state carries across its micro-batches
    val q = enriched.toDF("event_id", "user_id", "us", "ref_id", "gap_us")
      .writeStream.outputMode("append").format("memory").queryName("asofq")
      .start()
    try {
      // batch 1, all user 1: purchase@40 (id 10: before any click -> -1),
      // click@50 (800), purchase@60 (11) and click@60 (801): at the tied
      // time the reference sorts first, so 11 sees 801 with gap 0
      mem.addData((800L, 1L, 50L, "click"), (10L, 1L, 40L, "purchase"),
        (11L, 1L, 60L, "purchase"), (801L, 1L, 60L, "click"))
      q.processAllAvailable()
      val b1 = spark.table("asofq").as[(Long, Long, Long, Long, Long)]
        .collect().map(r => r._1 -> ((r._4, r._5))).toMap
      assert(b1 == Map(10L -> ((-1L, -1L)), 11L -> ((801L, 0L))))

      // batch 2: state carries click 801@60 across batches; a LATE probe
      // with older event time (us=55) still gets the newer reference and
      // a negative gap flags it — the documented processing-order rule
      mem.addData((12L, 1L, 100L, "purchase"), (13L, 1L, 55L, "purchase"),
        (20L, 2L, 10L, "purchase"))
      q.processAllAvailable()
      val b2 = spark.table("asofq").as[(Long, Long, Long, Long, Long)]
        .collect().map(r => r._1 -> ((r._4, r._5))).toMap
      assert(b2 == Map(10L -> ((-1L, -1L)), 11L -> ((801L, 0L)),
        12L -> ((801L, 40L)), 13L -> ((801L, -5L)),
        20L -> ((-1L, -1L)))) // user 2 has no reference state
    } finally q.stop()
  }

  test("stream-stream range join pairs same-key events within delta") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val base = 1700000000000L // ms
    def ts(sec: Long) = new java.sql.Timestamp(base + sec * 1000)
    val stream = mem.toDF().toDF("user_id", "event_id", "ts")
    val joined = graft.streaming.StreamingOps.rangeJoinStream(
      stream, delta = "10 seconds", watermark = "1 minute")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("rangepairs").start()
    try {
      mem.addData((1L, 1L, ts(0)), (1L, 2L, ts(5)), (1L, 3L, ts(30)),
        (2L, 4L, ts(6)), (1L, 5L, ts(33)))
      q.processAllAvailable()
      val got = spark.table("rangepairs")
        .select("event_id_a", "event_id_b", "gap_us")
        .as[(Long, Long, Long)].collect().toSet
      // (1,2) gap 5s; (3,5) gap 3s; nothing crosses users or the 10s delta
      assert(got == Set((1L, 2L, 5000000L), (3L, 5L, 3000000L)))
    } finally q.stop()
  }

  test("componentsSink maintains cluster ids incrementally across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val stream = mem.toDF().toDF("a", "b")
    val updates = scala.collection.mutable.Buffer[Map[String, String]]()
    val sink = StreamingOps.componentsSink(stream,
      onUpdate = df => {
        updates += df.collect().map(r => (r.getString(0), r.getString(1))).toMap
        ()
      })
    def run(): Unit = {
      val q = sink.writer
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      ()
    }
    mem.addData(("d2", "d1"), ("d8", "d9"))
    run()
    assert(sink.current().collect().map(r => (r.getString(0), r.getString(1))).toMap ==
      Map("d1" -> "d1", "d2" -> "d1", "d8" -> "d8", "d9" -> "d8"))
    // next batch bridges the two clusters and adds a fresh pair — only
    // THIS batch's quotient runs through the fixpoint, yet labels match
    // a batch recompute over all edges seen so far
    mem.addData(("d9", "d2"), ("z1", "z2"))
    run()
    val after = sink.current().collect().map(r => (r.getString(0), r.getString(1))).toMap
    val full = graft.operators.Dedup.connectedComponents(
        Seq(("d2", "d1"), ("d8", "d9"), ("d9", "d2"), ("z1", "z2")).toDF("a", "b"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(after == full)
    assert(after("d8") == "d1" && after("z2") == "z1")
    assert(updates.size == 2 && updates.last == after) // every merge handed to onUpdate
  }

  test("componentsSink restart recovery: re-seed from the last onUpdate sink (VERDICT r7 #3)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // --- first life: two micro-batches, every merge handed to onUpdate
    val mem1 = MemoryStream[(String, String)]
    @volatile var lastSunk: org.apache.spark.sql.DataFrame = null
    val sink1 = StreamingOps.componentsSink(mem1.toDF().toDF("a", "b"),
      onUpdate = df => { lastSunk = df })
    def run(s: StreamingOps.ComponentsSink): Unit = {
      val q = s.writer
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      q.stop()
    }
    mem1.addData(("d2", "d1"), ("d8", "d9"))
    run(sink1)
    mem1.addData(("d9", "d2"), ("x1", "x2"))
    run(sink1) // "crash" here: sink1 is abandoned after this batch
    assert(lastSunk != null)
    // the sunk table is what a real pipeline persisted externally — the
    // documented recovery contract says a NEW sink seeds from it
    val recoveredSeed = lastSunk

    // --- second life: fresh stream + sink seeded from the sunk table
    val mem2 = MemoryStream[(String, String)]
    val sink2 = StreamingOps.componentsSink(mem2.toDF().toDF("a", "b"),
      seed = Some(recoveredSeed))
    mem2.addData(("x2", "d1"), ("y1", "y2")) // bridges old clusters + fresh pair
    run(sink2)
    val got = sink2.current().collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    // oracle: batch recompute over ALL edges from both lives
    val full = graft.operators.Dedup.connectedComponents(
        Seq(("d2", "d1"), ("d8", "d9"), ("d9", "d2"), ("x1", "x2"),
          ("x2", "d1"), ("y1", "y2")).toDF("a", "b"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got == full)
    assert(got("x1") == "d1" && got("d8") == "d1" && got("y2") == "y1")
  }

  test("componentsSink bounds checkpoints at two generations with a reader grace window") {
    // each micro-batch materializes a new accumulator snapshot; stale
    // snapshots must be dropped or a long-lived sink leaks one rdd-N
    // dir per batch (tools/StreamSoak caught this in round 8). ONE
    // superseded generation is retained as a reader grace window
    // (ADVICE r8: a frame handed out for batch k got its files deleted
    // the moment batch k+1 completed, so a consumer retaining it
    // briefly hit FileNotFound): batch k's frame stays readable through
    // batch k+1, is dropped at batch k+2, and disk holds at <= 2
    // snapshot dirs.
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val sc = spark.sparkContext
    val ckptRoot = java.nio.file.Files.createTempDirectory("graft-sink-ckpt").toFile
    sc.setCheckpointDir(ckptRoot.getAbsolutePath)
    try {
      val mem = MemoryStream[(Long, Long)]
      val sink = StreamingOps.componentsSink(mem.toDF().toDF("a", "b"))
      def run(): Unit = {
        val q = sink.writer
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination(60000); q.stop()
      }
      def batch(b: Long): Unit = {
        mem.addData((b * 10L, b * 10L + 1), (b * 10L + 1, b * 10L + 2))
        run()
      }
      def rddDirs(f: java.io.File): Int =
        if (!f.isDirectory) 0
        else if (f.getName.startsWith("rdd-")) 1
        else f.listFiles().map(rddDirs).sum
      batch(1); batch(2)
      val atBatch2 = sink.current()
      batch(3)
      // grace window: batch 2's retained frame survives batch 3 ...
      assert(atBatch2.count() == 6,
        "a current() frame must stay readable through the NEXT micro-batch")
      assert(rddDirs(ckptRoot) == 2,
        s"current + one grace snapshot must be the only checkpoints, have ${rddDirs(ckptRoot)}")
      // ... and is dropped (fails loudly, not silently recomputed) once
      // batch 4 supersedes it twice
      batch(4)
      assert(rddDirs(ckptRoot) == 2,
        s"superseded sink snapshots must drop their checkpoints, have ${rddDirs(ckptRoot)}")
      intercept[Exception] { atBatch2.count() }
      // the live table is still readable+right
      val got = sink.current().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
        20L -> 20L, 21L -> 20L, 22L -> 20L, 30L -> 30L, 31L -> 30L, 32L -> 30L,
        40L -> 40L, 41L -> 40L, 42L -> 40L))
    } finally {
      sc.setCheckpointDir(null)
      def del(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(del)
        f.delete(); ()
      }
      del(ckptRoot)
    }
  }

  test("componentsSink validates pair columns and types eagerly with a clear message") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val wrongNames = intercept[IllegalArgumentException] {
      StreamingOps.componentsSink(mem.toDF().toDF("left", "right"))
    }
    assert(wrongNames.getMessage.contains("aCol/bCol"))
    // custom names work end-to-end
    val sink = StreamingOps.componentsSink(mem.toDF().toDF("left", "right"),
      aCol = "left", bCol = "right")
    mem.addData(("p2", "p1"))
    val q = sink.writer
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000); q.stop()
    assert(sink.current().collect()
      .map(r => (r.getString(0), r.getString(1))).toMap ==
      Map("p1" -> "p1", "p2" -> "p1"))
    // mismatched endpoint types rejected upfront
    val memT = MemoryStream[(Long, String)]
    val wrongTypes = intercept[IllegalArgumentException] {
      StreamingOps.componentsSink(memT.toDF().toDF("a", "b"))
    }
    assert(wrongTypes.getMessage.contains("share one id type"))
    // validation follows the session's resolver (ADVICE r8): analysis is
    // case-insensitive by default, so 'A'/'B' columns must pass the
    // eager check exactly as col("a")/col("b") resolve in the merge
    val memU = MemoryStream[(Long, Long)]
    val upper = StreamingOps.componentsSink(memU.toDF().toDF("A", "B"))
    memU.addData((2L, 1L))
    val qu = upper.writer
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    qu.awaitTermination(60000); qu.stop()
    assert(upper.current().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap == Map(1L -> 1L, 2L -> 1L))
  }

  test("watermarked windowed aggregation over an event stream") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val stream = mem.toDF().toDF("ts", "event_type", "value")
    val agg = StreamingOps.windowedEventAgg(stream, "1 hour", "2 hours")
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:15:00")
    val t1 = java.sql.Timestamp.valueOf("2026-01-01 10:45:00")
    val t2 = java.sql.Timestamp.valueOf("2026-01-01 11:05:00")
    mem.addData((t0, "click", 1.0), (t1, "click", 2.0), (t2, "view", 5.0))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("winagg")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val rows = spark.table("winagg")
      .select(col("event_type"), col("n"), col("sum_value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows == Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
  }

  test("watermarked session-window aggregation matches the batch gap rule") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val stream = mem.toDF().toDF("user_id", "ts", "value")
    val agg = StreamingOps.sessionEventAgg(stream, "30 minutes", "2 hours")
    // user 1: 10:00, 10:10 (same session), 11:00 (gap 50min -> new);
    // user 2: one event
    val t = (s: String) => java.sql.Timestamp.valueOf(s"2026-01-01 $s:00")
    mem.addData((1L, t("10:00"), 1.0), (1L, t("10:10"), 2.0),
      (1L, t("11:00"), 4.0), (2L, t("10:05"), 8.0))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("sessagg")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val rows = spark.table("sessagg")
      .select(col("user_id"), col("n_events"), col("sum_value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows == Set((1L, 2L, 3.0), (1L, 1L, 4.0), (2L, 1L, 8.0)))
  }

  test("streaming hygiene: gate, decontaminate, dedup, and sample across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, String, String)]
    val stream = mem.toDF().toDF("doc_id", "text", "source")
    // eval grams = the distinct 3-grams of the "benchmark" doc
    val evalGrams = Seq("one two three", "two three four")
    val out = graft.streaming.StreamingOps.hygieneStream(stream, evalGrams,
      rates = Map("keep" -> 1.0, "drop" -> 0.0),
      maxDupFrac = 0.5, contamN = 3, repN = 2)

    mem.addData(
      ("g1", "clean fresh words entirely here", "keep"),   // survives
      ("g2", "spam spam spam spam spam spam", "keep"),     // repetition-gated
      ("g3", "zz one two three four yy", "keep"),          // contaminated
      ("g4", "clean fresh words entirely here", "keep"),   // dup of g1
      ("g5", "unique but zero rate stratum", "drop"),      // sampled out
      ("g6", "unique but unknown stratum", "other"))       // stratum not in rates
    // SAME checkpoint across both runs (foreachBatch sink — the memory
    // sink cannot recover from a checkpoint): the second query resumes
    // from committed offsets, so batch 2 processes only the new rows
    // with CARRIED state — g7 (re-delivered g1 content) must be
    // suppressed by state.exists, not by within-batch tie-breaking
    val ck = java.nio.file.Files.createTempDirectory("ck").toString
    // micro-batches commit sequentially on the driver, so a plain
    // buffer is safe here
    val got = new scala.collection.mutable.ArrayBuffer[String]
    def run(): Set[String] = {
      got.clear()
      val q = out.toDF("doc_id", "text", "source").writeStream
        .outputMode("append")
        .option("checkpointLocation", ck)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got ++= b.select("doc_id").as[String](org.apache.spark.sql.Encoders.STRING)
            .collect(); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      got.toSet
    }
    assert(run() == Set("g1"))
    mem.addData(("g7", "clean fresh words entirely here", "keep"),
      ("g8", "brand new survivor content", "keep"))
    assert(run() == Set("g8"))
  }
}
