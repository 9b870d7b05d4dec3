package graft.tools

import org.apache.spark.sql.SparkSession

/** Sharded-HNSW probe on CLUSTERED 100k x 1024 — the realistic
  * embedding shape, the distributed twin of [[HnswProbe]] (which
  * measures the driver-local serving graph on the same data). Reports
  * build wall (parallel per-slab graphs vs HnswProbe's one serial
  * graph), batch query time, and recall vs the exact sharded scan at
  * several ef, for 1-shard vs N-shard layouts.
  */
object HnswShardProbe {
  def main(args: Array[String]): Unit = {
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext

    val n = sys.env.get("SPARK_GRAFT_HNSW_N").map(_.toInt).getOrElse(100000)
    val dim = 1024
    val nClusters = 1000
    val shards = sys.env.get("SPARK_GRAFT_HNSW_SHARDS").map(_.toInt)
      .getOrElse(math.min(cpus, 24))

    def normalize(v: Array[Float]): Array[Float] = {
      val s = math.sqrt(v.map(x => x.toDouble * x).sum)
      v.map(x => (x / s).toFloat)
    }
    // same generator family as HnswProbe: cluster centers + jitter
    val crng = new java.util.Random(7)
    val centers = Array.fill(nClusters)(
      normalize(Array.fill(dim)(crng.nextFloat() - 0.5f)))
    val bcCenters = sc.broadcast(centers)
    val raw = sc.range(0, n, 1, shards).map { i =>
      val rng = new java.util.Random(i * 2654435761L + 17)
      val c = bcCenters.value((i % nClusters).toInt)
      (i, normalize(Array.tabulate(dim)(j =>
        c(j) + (rng.nextFloat() - 0.5f) * 0.08f)))
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    raw.count()
    println(s"SHARDPROBE data ready n=$n dim=$dim clusters=$nClusters shards=$shards")

    val qrng = new java.util.Random(42)
    val queries = Array.tabulate(200) { qi =>
      val c = centers(qrng.nextInt(nClusters))
      (qi.toLong,
        normalize(Array.tabulate(dim)(j => c(j) + (qrng.nextFloat() - 0.5f) * 0.08f)))
    }

    def probe(numShards: Int): Unit = {
      var t0 = System.nanoTime()
      val store = graft.operators.HnswStore.fromRDD(
        spark, raw, normalize = false, assumeNormalized = true,
        numShards = numShards).persist()
      val (rows, nsh) = store.materialize()
      println(f"SHARDPROBE build shards=$nsh rows=$rows: " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      import spark.implicits._
      val truth = store.searchMerged(queries, 10, exact = true)
        .select("qid", "id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      Seq(16, 32, 64, 128).foreach { ef =>
        t0 = System.nanoTime()
        val got = store.searchMerged(queries, 10, ef = ef)
          .select("qid", "id").collect()
        val dt = (System.nanoTime() - t0) / 1e9
        val byQ = got.groupBy(_.getLong(0)).view
          .mapValues(_.map(_.getLong(1)).toSet).toMap
        val recall = queries.map { case (qid, _) =>
          byQ.getOrElse(qid, Set.empty[Long]).count(truth(qid)).toDouble /
            truth(qid).size
        }.sum / queries.length
        println(f"SHARDPROBE shards=$nsh ef=$ef: recall@10=$recall%.3f " +
          f"batch=${dt}%.2f s (${dt * 1000 / queries.length}%.2f ms/q)")
      }
      store.unpersist()
    }

    probe(shards)
    // the near-serial comparison (numShards=1 still slab-bounds into a
    // few graphs built in ONE task) only makes sense at the 100k
    // headline; at 1M it is tens of minutes of single-task build
    if (n <= 200000) probe(1)
    spark.stop()
  }
}
