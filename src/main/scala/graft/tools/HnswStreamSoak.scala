package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** hnswSegmentSink soak: N micro-batches (default 40) of `rows` 256-d
  * vectors each through the REAL sink — the long-lived continuous-index
  * deployment shape. Prints per-batch append wall, live segment/shard
  * counts, compaction count, and persistent-RDD count every batch; the
  * RDD count and shard count must stay BOUNDED (the compaction
  * discipline) while append wall must track the BATCH size, not the
  * accumulated index (segment builds never touch existing shards).
  * Ends with an exact-vs-graph search sanity over the full index.
  */
object HnswStreamSoak {
  def main(args: Array[String]): Unit = {
    val nBatches = sys.env.get("SPARK_GRAFT_SOAK_BATCHES").map(_.toInt).getOrElse(40)
    val rows = sys.env.get("SPARK_GRAFT_SOAK_ROWS").map(_.toInt).getOrElse(2500)
    val dim = 256
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    val sc = spark.sparkContext
    sc.setLogLevel("WARN")
    import spark.implicits._
    implicit val sq = spark.sqlContext

    def unit(seed: Long): Array[Float] = {
      val rng = new java.util.Random(seed * 0x9E3779B97F4A7C15L + 11)
      val v = Array.fill(dim)(rng.nextFloat() - 0.5f)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      v.map(x => (x / n).toFloat)
    }

    // kill-and-restart is part of the default soak (VERDICT r13 item 4):
    // segments persist to disk, the index is closed mid-run, and a new
    // instance must RESUME — pre-kill row count, zero graph rebuilds,
    // exact-mode-identical results — before the stream continues
    // against the same checkpoint.
    val persistDir =
      java.nio.file.Files.createTempDirectory("graft-hnsw-soak-seg").toString
    val killAt =
      sys.env.get("SPARK_GRAFT_SOAK_KILL_AT").map(_.toInt).getOrElse(nBatches / 2)
    var index = new graft.streaming.HnswSegmentIndex(
      spark, normalize = false, compactAtShards = 16,
      persistDir = Some(persistDir))
    val mem = MemoryStream[(String, Array[Float])]
    val ck = java.nio.file.Files.createTempDirectory("graft-hnsw-soak").toString
    val probeQ = (0 until 20).map(i =>
      (i.toLong, unit((1L << 32) | (i * 37).toLong))).toArray
    def exactSnap(): Seq[(Long, Int, String)] =
      index.store.get.searchMerged(probeQ, 5, exact = true)
        .select("qid", "rank", "id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        .toSeq.sortBy(t => (t._1, t._2))
    var total = 0L
    (1 to nBatches).foreach { b =>
      val batch = (0 until rows).map { i =>
        val id = (b.toLong << 32) | i.toLong
        (id.toString, unit(id))
      }
      mem.addData(batch)
      val t0 = System.nanoTime()
      val q = graft.streaming.StreamingOps.hnswSegmentSink(
          mem.toDF().toDF("id", "vec"), index, "id", "vec")
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(180000), s"batch $b timed out")
      total += rows
      if (b == killAt && killAt > 0) {
        val preRows = index.rowCount
        val preSnap = exactSnap()
        index.close()
        val builds = graft.core.Hnsw.buildsInJvm
        val t1 = System.nanoTime()
        index = new graft.streaming.HnswSegmentIndex(
          spark, normalize = false, compactAtShards = 16,
          persistDir = Some(persistDir))
        val resumeWall = (System.nanoTime() - t1) / 1e9
        assert(index.resumed, "kill-and-restart: manifest must resume")
        assert(index.rowCount == preRows,
          s"resumed ${index.rowCount} rows, pre-kill had $preRows")
        assert(graft.core.Hnsw.buildsInJvm == builds,
          "resume must not rebuild any graph")
        assert(exactSnap() == preSnap,
          "resumed index must answer exactly like the pre-kill one")
        println(f"HNSWSOAK restart at batch=$b rows=$preRows " +
          f"resumeWall=$resumeWall%6.2f s (zero rebuilds)")
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val persisted = sc.getPersistentRDDs.size
      println(f"HNSWSOAK batch=$b%3d rows=$total%8d wall=$wall%6.2f s " +
        f"shards=${index.shardCount}%3d compactions=${index.compactions}%2d " +
        f"persistedRdds=$persisted%3d")
      // one persisted RDD per live segment is the design: they
      // accumulate to the compaction trigger then fold — a LEAK is
      // persisted counts growing PAST what the trigger + the
      // one-generation retire window allow. Bounds derive from the
      // CONFIG (env knobs can scale the run): the folded base is
      // slab-bounded at MaxBlockFloats/dim rows per shard, the growth
      // trigger allows ~2x the post-fold count live, and the retire
      // window holds one extra generation.
      val slabRows = graft.core.BlockStore.MaxBlockFloats / dim
      val baseShards = (total / slabRows + 1).toInt
      val shardCap = 3 * (16 + baseShards)
      assert(persisted <= 2 * shardCap + 8,
        s"persistent-RDD leak: $persisted live after batch $b (cap ${2 * shardCap + 8})")
      assert(index.shardCount <= shardCap,
        s"compaction failed to bound shards: ${index.shardCount} (cap $shardCap)")
    }
    // exact-vs-graph sanity over the accumulated index
    val store = index.store.get
    val queries = (0 until 50).map(i =>
      (i.toLong, unit((1L << 32) | (i * 37).toLong))).toArray
    def top(exact: Boolean, ef: Int): Map[Long, Set[String]] =
      store.searchMerged(queries, 10, ef = ef, exact = exact)
        .select("qid", "id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    val ex = top(exact = true, ef = 0)
    val ap = top(exact = false, ef = 96)
    val recall = queries.map { case (qid, _) =>
      ap.getOrElse(qid, Set.empty[String]).count(ex(qid)).toDouble / ex(qid).size
    }.sum / queries.length
    println(f"HNSWSOAK final rows=$total recall@10(ef=96)=$recall%.3f " +
      f"shards=${index.shardCount} compactions=${index.compactions}")
    // asserted, not just printed (the q76 floor discipline): uniform
    // 256-d random vectors measured 0.91 at this ef on the default
    // run — 0.6 only trips on a real graph/segment regression
    assert(recall >= 0.6, f"streamed-index recall collapsed: $recall%.3f")
    index.close()
    spark.stop()
  }
}
