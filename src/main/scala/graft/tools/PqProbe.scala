package graft.tools

import org.apache.spark.sql.SparkSession

/** PQ store probe at the 100k×1024 headline shape: times
  * train/encode, the ADC 1000q scan, and the rescored batch, then
  * measures recall on CLUSTERED data (the workload PQ is for — the
  * bench's uniform-random rows are the distance-concentration
  * worst case for ANY coarse quantizer, same caveat as the HNSW
  * rows; planted clusters are where recall is meaningful).
  *
  * Usage: runMain graft.tools.PqProbe
  *   [uniform|clustered|both]                       — flat PqStore
  *   ivfpq                                          — IVF-PQ, uniform+clustered, m=args(1)
  *   ivfpq-clustered [m] [nCenters] [of,of] [noise] — IVF-PQ parameter sweeps
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

    /** IVF-PQ composition at the bench headline shape: recall of
      * searchMergedPq (both byResidual modes) against BOTH the full
      * exact top-k and the np32 probe ceiling (exact scan of the same
      * 32 buckets — the best any code can do at this probe count).
      * Measured r15 verdicts this probe exists to record: residual ==
      * raw at every 1024-d/m=64 geometry tried (uniform 0.03 both of
      * a 0.35 ceiling; clustered z0.15 0.754 both — candidate-budget
      * bound; clustered z0.45 0.085 both at of8), because 16-d
      * subspaces at 8 bits are concentration-limited regardless of
      * what they encode.
      */
    def runIvf(label: String, clustered: Boolean, pqM: Int,
               nCenters: Int = 256, overfetches: Seq[Int] = Seq(0, 32),
               noise: Float = 0.15f): Unit = {
      import spark.implicits._
      val rows = spark.sparkContext.range(0, n, 1, parts).map { i =>
        val rng = new java.util.Random(i * 2654435761L)
        if (!clustered) (i, Array.fill(dim)(rng.nextFloat()))
        else {
          val crng = new java.util.Random(1234L + (i % nCenters))
          val c = Array.fill(dim)(crng.nextFloat() * 2f - 1f)
          (i, c.zip(Array.fill(dim)(rng.nextFloat() * 2f - 1f))
            .map { case (x, e) => x + noise * e })
        }
      }
      val qrng = new java.util.Random(42)
      val queries = Array.tabulate(1000) { i =>
        if (!clustered) (i.toLong, Array.fill(dim)(qrng.nextFloat()))
        else {
          val crng = new java.util.Random(1234L + (i % nCenters))
          val c = Array.fill(dim)(crng.nextFloat() * 2f - 1f)
          (i.toLong, c.zip(Array.fill(dim)(qrng.nextFloat() * 2f - 1f))
            .map { case (x, e) => x + noise * e })
        }
      }
      var idx: graft.operators.IvfIndex = null
      timed(s"$label ivf build") {
        idx = graft.operators.IvfIndex.build(
          rows.toDF("vec_id", "vec"), "vec_id", "vec",
          nList = graft.operators.IvfIndex.defaultNList(n), normalized = false)
      }
      def topIds(res: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
        res.select("qid", "id").collect()
          .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val exactFull = topIds(idx.searchMerged[Long](queries, k = k,
        nProbe = Int.MaxValue, normalized = false, exact = true))
      val ceiling = topIds(idx.searchMerged[Long](queries, k = k,
        nProbe = 32, normalized = false, exact = true))
      timed(s"$label pq encode m=$pqM") {
        idx.searchMergedPq[Long](queries.take(1), k = 1, nProbe = 1,
          normalized = false, m = pqM).count()
      }
      def recallVs(truth: Map[Long, Set[Long]], got: Map[Long, Set[Long]]): Double = {
        val perQ = queries.map { case (qid, _) =>
          val ex = truth.getOrElse(qid, Set.empty[Long])
          if (ex.isEmpty) 1.0
          else got.getOrElse(qid, Set.empty[Long]).count(ex).toDouble / ex.size
        }
        perQ.sum / math.max(1, perQ.length)
      }
      println(f"PQPROBE $label np32 ceiling recall@10 vs exact " +
        f"${recallVs(exactFull, ceiling)}%.4f")
      Seq(true, false).foreach { byRes =>
        val tag = if (byRes) "residual" else "raw"
        overfetches.foreach { of =>
          var got: Map[Long, Set[Long]] = null
          (1 to 2).foreach { i =>
            timed(s"$label ivfpq-$tag np32 of$of #$i") {
              got = topIds(idx.searchMergedPq[Long](queries, k = k, nProbe = 32,
                normalized = false, overfetch = of, m = pqM, byResidual = byRes))
            }
          }
          println(f"PQPROBE $label ivfpq-$tag np32 of$of%-3d recall@10 vs exact " +
            f"${recallVs(exactFull, got)}%.4f  vs np32 ceiling ${recallVs(ceiling, got)}%.4f")
        }
      }
      idx.unpersistAssigned()
    }

    if (mode == "uniform" || mode == "both") run("uniform", clustered = false)
    if (mode == "clustered" || mode == "both") run("clustered", clustered = true)
    if (mode == "ivfpq") {
      val pqM = args.drop(1).headOption.map(_.toInt).getOrElse(64)
      runIvf(s"ivfpq-uniform-m$pqM", clustered = false, pqM)
      runIvf(s"ivfpq-clustered-m$pqM", clustered = true, pqM)
    }
    if (mode == "ivfpq-clustered") {
      val pqM = args.drop(1).headOption.map(_.toInt).getOrElse(64)
      val nc = args.drop(2).headOption.map(_.toInt).getOrElse(256)
      val ofs = args.drop(3).headOption
        .map(_.split(",").toSeq.map(_.toInt)).getOrElse(Seq(0, 32))
      val nz = args.drop(4).headOption.map(_.toFloat).getOrElse(0.15f)
      runIvf(s"ivfpq-clustered-m$pqM-c$nc-z$nz", clustered = true, pqM, nc,
        ofs, nz)
    }
    spark.stop()
  }
}
