package graft.tools

import org.apache.spark.sql.SparkSession

/** PQ store probe at the 100k×1024 headline shape: times
  * train/encode, the ADC 1000q scan, and the rescored batch, then
  * measures recall on CLUSTERED data (the workload PQ is for — the
  * bench's uniform-random rows are the distance-concentration
  * worst case for ANY coarse quantizer, same caveat as the HNSW
  * rows; planted clusters are where recall is meaningful).
  *
  * Usage: runMain graft.tools.PqProbe [uniform|clustered|both]
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("both")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dim = 1024
    val n = 100000
    val parts = 32
    val k = 10

    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val out = f
      println(f"PQPROBE $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s ($out)")
    }

    def run(label: String, clustered: Boolean): Unit = {
      val nCenters = 256
      val rows = spark.sparkContext.range(0, n, 1, parts).map { i =>
        val rng = new java.util.Random(i * 2654435761L)
        if (!clustered) (i, Array.fill(dim)(rng.nextFloat()))
        else {
          // planted cluster: unit center + small noise (the
          // HnswProbe/RetrievalGroundTruth geometry)
          val crng = new java.util.Random(1234L + (i % nCenters))
          val c = Array.fill(dim)(crng.nextFloat() * 2f - 1f)
          (i, c.zip(Array.fill(dim)(rng.nextFloat() * 2f - 1f))
            .map { case (x, e) => x + 0.15f * e })
        }
      }
      val qrng = new java.util.Random(42)
      val queries = Array.tabulate(1000) { i =>
        if (!clustered) (i.toLong, Array.fill(dim)(qrng.nextFloat()))
        else {
          val crng = new java.util.Random(1234L + (i % nCenters))
          val c = Array.fill(dim)(crng.nextFloat() * 2f - 1f)
          (i.toLong, c.zip(Array.fill(dim)(qrng.nextFloat() * 2f - 1f))
            .map { case (x, e) => x + 0.15f * e })
        }
      }

      val bs = graft.core.BlockStore.fromRDD[Long](rows, normalize = false)
      bs.persist(); bs.materialize()
      var pq: graft.core.PqStore[Long] = null
      timed(s"$label train+encode m=64") {
        pq = graft.core.PqStore.fromBlockStore(bs, m = 64, sampleCap = 10000)
          .persist()
        pq.materialize()
      }
      (1 to 3).foreach { i =>
        timed(s"$label adc_scan_1000q #$i")(pq.topKMerged(queries, k).length)
      }
      import spark.implicits._
      (1 to 3).foreach { i =>
        timed(s"$label rescored_1000q of32 #$i")(
          pq.rescoredTopK(queries, k, 32).count())
      }
      // recall vs the exact engine
      val exact = graft.operators.CosineTopK.gemmBlocks(bs, queries, k)
        .select("qid", "id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      def recallOf(m: Map[Long, Set[Long]]): Double = {
        val perQ = queries.map { case (qid, _) =>
          val ex = exact.getOrElse(qid, Set.empty[Long])
          if (ex.isEmpty) 1.0
          else m.getOrElse(qid, Set.empty[Long]).count(ex).toDouble / ex.size
        }
        perQ.sum / math.max(1, perQ.length)
      }
      val scanTop = queries.map(_._1).zip(pq.topKMerged(queries, k))
        .map { case (qid, hits) => qid -> hits.map(_._1).toSet }.toMap
      println(f"PQPROBE $label recall@10 adc_scan      ${recallOf(scanTop)}%.4f")
      Seq(8, 32).foreach { of =>
        val res = pq.rescoredTopK(queries, k, of)
          .select("qid", "id").collect()
          .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
        println(f"PQPROBE $label recall@10 rescored of$of%-3d ${recallOf(res)}%.4f")
      }
      pq.unpersist(cascadeSource = true)
    }

    if (mode == "uniform" || mode == "both") run("uniform", clustered = false)
    if (mode == "clustered" || mode == "both") run("clustered", clustered = true)
    spark.stop()
  }
}
