package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Round-13 diagnostic for the np158 regression (VERDICT r12 weak #1):
  * rebuilds the bench's exact ANN fixture (100k x 1024 uniform, same
  * seeds), prints the bucket-size distribution the round-12
  * content-hash fit produces, the per-PARTITION probed work at each
  * nProbe (the treeAggregate's real parallel grain), and wall times
  * for searchMerged at np in {8, 32, 158} vs the exact packed scan.
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // disable the probe-fraction crossover: this tool exists to
      // measure the GENUINELY PROBED path at every np (including
      // nList/2, which the 0.5 default would snap to the exact scan)
      .config("graft.ann.exactscan.fraction", "1.0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sc = spark.sparkContext

    val dim = 1024
    val n = 100000
    val nQueries = 1000
    val topK = 10
    val parts = math.min(cpus.toInt, 24)

    val raw = sc.range(0, n, 1, parts)
      .map { i =>
        val rng = new java.util.Random(i * 2654435761L)
        (i, Array.fill(dim)(rng.nextFloat()))
      }
      .persist(StorageLevel.MEMORY_ONLY)
    raw.count()
    val qrng = new java.util.Random(42)
    val queries = Array.tabulate(nQueries) { i =>
      (i.toLong, Array.fill(dim)(qrng.nextFloat()))
    }

    val annDf = raw.toDF("vec_id", "vec")
    val nList = graft.operators.IvfIndex.defaultNList(n)
    println(s"nList=$nList")
    var t0 = System.nanoTime()
    val cents = graft.operators.IvfIndex.fitCentroids(annDf, "vec",
      nList = nList, normalized = false)
    println(f"fit: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    val idx = graft.operators.IvfIndex.assign(annDf, cents, "vec_id", "vec")
    idx.assigned.count()
    println(f"assign: ${(System.nanoTime() - t0) / 1e9}%.2f s")

    // bucket-size distribution
    val sizes = idx.assigned.groupBy("centroid_id").count()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val ss = sizes.map(_._2).sorted
    println(s"buckets=${ss.length} min=${ss.head} p50=${ss(ss.length / 2)} " +
      s"p90=${ss((ss.length * 9) / 10)} p99=${ss((ss.length * 99) / 100)} max=${ss.last}")
    println("top10 buckets: " + sizes.sortBy(-_._2).take(10).mkString(", "))

    // per-partition probed work at each np: work(partition) =
    // sum over its buckets of bucket_rows * probing_queries
    val sizeByCid = sizes.toMap
    val nPartsPack = math.max(parts, sc.defaultParallelism)
    Seq(8, 32, nList / 2).foreach { np =>
      val probesPerQ = queries.map { case (_, v) =>
        graft.operators.IvfIndex.probeIds(cents, v, np)
      }
      val probersPerCid = new Array[Long](nList)
      probesPerQ.foreach(_.foreach(c => probersPerCid(c) += 1))
      val workPerPartition = new Array[Long](nPartsPack)
      var c = 0
      while (c < nList) {
        val p = ((c.hashCode % nPartsPack) + nPartsPack) % nPartsPack
        workPerPartition(p) += probersPerCid(c) * sizeByCid.getOrElse(c, 0L)
        c += 1
      }
      val w = workPerPartition.sorted
      val tot = w.sum.toDouble
      println(f"np=$np%3d totalPairs=${tot / 1e6}%.1fM " +
        f"maxPartShare=${w.last / tot}%.3f " +
        f"max=${w.last / 1e6}%.1fM p50=${w(w.length / 2) / 1e6}%.1fM " +
        f"(ideal share=${1.0 / nPartsPack}%.3f)")
    }

    // timed searches (2 samples each)
    def timeIt(label: String)(f: => Unit): Unit = {
      (1 to 2).foreach { _ =>
        val t = System.nanoTime()
        f
        println(f"$label: ${(System.nanoTime() - t) / 1e9}%.2f s")
      }
    }
    // prime pack
    idx.searchPacked[Long](spark.createDataset(Seq((0L, queries(0)._2))),
      k = 1, nProbe = 1, normalized = false).count()
    Seq(8, 32, nList / 2).foreach { np =>
      timeIt(s"searchMerged np=$np") {
        idx.searchMerged[Long](queries, k = topK, nProbe = np,
          normalized = false).count()
        ()
      }
    }
    val store = graft.core.BlockStore.fromRDD(raw, normalize = true).persist()
    store.materialize()
    timeIt("exact gemmBlocks") {
      graft.operators.CosineTopK.gemmBlocks(store, queries, topK).count()
      ()
    }
    spark.stop()
  }
}
