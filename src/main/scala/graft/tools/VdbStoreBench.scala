package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.VdbStore

/** End-to-end picovdb-mirror workload through the PUBLIC VdbStore API
  * (upsertDF -> query), at the reference's published scale (dim=1024,
  * N=100k, 1000-query batch, top_k=10, better_than=0.1) — evidence that
  * a user of the reference switching to this library gets headline-class
  * throughput from the real API, not just from the internal BlockStore
  * path. Run by hand; prints one line per phase.
  */
object VdbStoreBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.min(cpus.toInt, 24).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dim = 1024
    val n = 100000
    val parts = math.min(cpus.toInt, 24)

    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val out = f
      println(f"VDBBENCH $name%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($out)")
    }

    // pre-generated batch, pinned (reference pre-builds its numpy array)
    val batch = spark.sparkContext.range(0, n, 1, parts).map { i =>
      val rng = new java.util.Random(i * 2654435761L)
      (f"id$i%06d", Array.fill(dim)(rng.nextFloat()), null: String)
    }.toDF("_id_", "vector", "meta").persist()
    batch.count()

    val qrng = new java.util.Random(42)
    val queries = Array.fill(1000)(Array.fill(dim)(qrng.nextFloat()).toIndexedSeq.toArray)

    val store = VdbStore.empty(spark, dim)
    timed("upsertDF 100k x 1024") {
      // ids are unique by construction: skip the dedup aggregate, the
      // documented fast path for generators/ETL with guaranteed ids
      store.upsertDF(batch, dedupIds = false)
    }
    timed("count")(store.count())
    batch.unpersist() // ingest done; the serving phases want the heap
    timed("batch 1000q cold") {
      store.query(queries.toIndexedSeq, topK = 10, betterThan = Some(0.1)).size
    }
    timed("batch 1000q warm") {
      store.query(queries.toIndexedSeq, topK = 10, betterThan = Some(0.1)).size
    }
    println("timings: " + store.lastTimings.map { case (k, v) => f"$k=$v%.2fs" }.mkString(" "))

    // ---- point-query serving (SCALING.md "point-query serving"):
    // per-query latency of the distributed queryOne (scheduler-bound)
    // vs the in-process LocalReplica, exact and IVF-pruned
    def perQuery(name: String, reps: Int)(f: Array[Float] => Any): Unit = {
      // warm once, then time `reps` sequential single queries
      f(queries(0))
      val t0 = System.nanoTime()
      var i = 0
      while (i < reps) { f(queries(i % queries.length)); i += 1 }
      val ms = (System.nanoTime() - t0) / 1e6 / reps
      println(f"VDBSERVE $name%-34s $ms%9.3f ms/query  (x$reps)")
    }
    perQuery("queryOne distributed warm", 20)(q =>
      store.queryOne(q, topK = 10))
    var rep: graft.core.LocalReplica = null
    timed("localReplica build (no ANN)") { rep = store.localReplica(); rep.size }
    perQuery("localReplica exact", 200)(q => rep.queryOne(q, topK = 10))
    // filtered serving (round 16): whereFn pushed into the slab scan —
    // ~50% selectivity on the trailing id digit; the cost should be
    // exact-scan plus one membership test per row
    val servFn = (id: String, _: String) => id.charAt(id.length - 1) <= '4'
    perQuery("localReplica filtered 50%", 200)(q =>
      rep.queryOne(q, topK = 10, whereFn = Some(servFn)))
    perQuery("localReplica get(id)", 10000)(_ => rep.get("id000042"))
    rep = null // ~430 MB of slabs; the later tier phases need the heap
    store.enableAnn()
    var repA: graft.core.LocalReplica = null
    timed("localReplica build (ANN)") { repA = store.localReplica(); repA.size }
    println(s"VDBSERVE replica nList=${repA.nList}")
    Seq(4, 8, 32).foreach { np =>
      perQuery(s"localReplica ivf np=$np", 500)(q =>
        repA.queryOne(q, topK = 10, nProbe = np))
    }
    // HNSW graph on the same replica: build wall (the reference pays
    // 50-110 s through FAISS for this store), per-query latency at the
    // reference's efSearch=32 plus ef=64/128, and measured recall@10
    // vs the exact scan on 200 queries (structure-free vectors — the
    // adversarial case)
    val hnswM = sys.env.get("SPARK_GRAFT_HNSW_M").map(_.toInt).getOrElse(16)
    val hnswEfc = sys.env.get("SPARK_GRAFT_HNSW_EFC").map(_.toInt).getOrElse(100)
    val hnswCache = java.nio.file.Files.createTempDirectory("vdbserve-hnsw")
      .toString + "/replica-hnsw.bin"
    timed(s"hnsw build (M=$hnswM efC=$hnswEfc)") {
      repA.buildHnsw(hnswM, hnswEfc, cachePath = Some(hnswCache)); 0L
    }
    // quick-load cold start (round 15, pico_vdb.py:230-237 analog): a
    // SECOND session's replica hydrates the graph from the cache file
    // in O(n*dim) — the row SCALING.md cites for "seconds, not the
    // 50-200 s build"
    var repQ: graft.core.LocalReplica = null
    timed("localReplica build (fresh)") { repQ = store.localReplica(); repQ.size }
    timed("hnsw quick-load from cache") {
      repQ.buildHnsw(hnswM, hnswEfc, cachePath = Some(hnswCache))
      repQ.hnswSource // expect "loaded"
    }
    Seq(32, 64, 128).foreach { ef =>
      perQuery(s"localReplica hnsw ef=$ef", 1000)(q =>
        repA.queryOneHnsw(q, topK = 10, ef = ef))
    }
    val recallQs = queries.take(200)
    Seq(32, 64, 128).foreach { ef =>
      val per = recallQs.map { q =>
        val want = repA.queryOne(q, topK = 10).map(_.id).toSet
        repA.queryOneHnsw(q, topK = 10, ef = ef).map(_.id).count(want) / 10.0
      }
      println(f"VDBSERVE hnsw recall@10 ef=$ef%-3d ${per.sum / per.length}%.3f")
    }

    // ---- compression-tier serving cold starts (round 16): the q8
    // tier quantizes at assembly speed (no cache exists by design);
    // the pq tier's trained book rides from the store (zero k-means)
    // and its CODES quick-load from the same cache contract as the
    // graph — measure encode vs quick-load, and pin trains flat.
    timed("replica q8 quantize") { repA.buildQ8(); 0L }
    perQuery("localReplica q8 of4", 500)(q => repA.queryOneQ8(q, topK = 10))
    repA = null // free the slabs+graph before the pq replicas cut
    repQ = null
    // train the store's flat-pq book (the _pq_codebook state): the
    // flat strategy must serve, so park ANN while it trains
    store.disableAnn()
    store.enablePq()
    timed("store pq train+encode (flat)") {
      store.query(Seq(queries(0)).toIndexedSeq, topK = 10).size
    }
    store.enableAnn()
    val pqCache = java.nio.file.Files.createTempDirectory("vdbserve-pq")
      .toString + "/replica-pq.bin"
    var repP: graft.core.LocalReplica = null
    timed("localReplica build (pq book)") { repP = store.localReplica(); repP.size }
    val trains0 = graft.core.PqStore.trainsInJvm.get()
    timed("replica pq encode (carried book)") {
      repP.buildPq(cachePath = Some(pqCache)); repP.pqSource
    }
    println(s"VDBSERVE pq trains during encode: " +
      (graft.core.PqStore.trainsInJvm.get() - trains0) + " (want 0)")
    perQuery("localReplica pq of8", 500)(q => repP.queryOnePq(q, topK = 10))
    repP = null // one replica at a time: the cut's collect is the spike
    var repP2: graft.core.LocalReplica = null
    timed("localReplica build (fresh 2)") { repP2 = store.localReplica(); repP2.size }
    timed("replica pq quick-load") {
      repP2.buildPq(cachePath = Some(pqCache)); repP2.pqSource
    }
    println(s"VDBSERVE pq trains during quick-load: " +
      (graft.core.PqStore.trainsInJvm.get() - trains0) + " (want 0)")
    spark.stop()
  }
}
