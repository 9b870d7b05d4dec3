package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel
import graft.core.{BlockStore, SetMember}
import graft.operators.CosineTopK

/** Round-16 evidence pass for the filtered-ANN scale claim
  * (SCALING.md "Filtered ANN"): the exact filtered path re-packs every
  * matching row PER QUERY CALL, the filtered-ANN path reuses the
  * cached bucket pack and broadcasts a membership set — at bench scale
  * (100k rows) the pack is cheap and the two look close, so this smoke
  * measures both at N x 256-d where the repack term is visible.
  * Default 1M; SPARK_GRAFT_SMOKE_N=10000000 runs the 10M evidence
  * pass (~10 GB packed + ~5 GB per filtered repack). Phases:
  *
  *  - exact filtered 1000q: filter -> pack -> gemm scan, timed PER
  *    CALL like `VdbStore.query`'s exact-filtered strategy (two calls
  *    timed separately — the second pays the repack AGAIN, which IS
  *    the point);
  *  - filtered-ANN 1000q at np32 and covering nProbe over the cached
  *    bucket pack (build cost its own phase, paid once);
  *  - the int8 composition (searchMergedQ8Allowed) at np32 with
  *    rescore overfetch 4.
  *
  * Run by hand; prints one line per phase.
  */
object FilteredAnnSmoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sc = spark.sparkContext

    val dim = 256
    val n = sys.env.get("SPARK_GRAFT_SMOKE_N").map(_.toInt).getOrElse(1000000)
    val nQueries = 1000
    val topK = 10
    val parts = 24 * math.max(1, n / 1000000)

    val raw = sc.range(0, n, 1, parts).map { i =>
      val rng = new java.util.Random(i * 7919L)
      (i, Array.fill(dim)(rng.nextFloat()))
    }.persist(StorageLevel.MEMORY_ONLY)
    raw.count()
    val qrng = new java.util.Random(17)
    val queries = Array.tabulate(nQueries) { i =>
      (i.toLong, Array.fill(dim)(qrng.nextFloat()))
    }

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val out = f
      println(f"FILTSMOKE $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($out)")
    }

    // 50%-selectivity filter: even ids. The exact path's honest cost
    // is filter + pack + scan per call (pico_vdb slices its matrix per
    // query the same way; VdbStore.packCandidates is per-call too).
    def exactFilteredCall(): Long = {
      val sub = BlockStore.fromRDD(raw.filter(_._1 % 2 == 0), normalize = true)
      CosineTopK.gemmBlocks(sub, queries, topK).count()
    }
    timed(s"exact filtered 1000q (call 1)")(exactFilteredCall())
    timed(s"exact filtered 1000q (call 2)")(exactFilteredCall())

    // IVF build over the full store (paid once, amortized over calls)
    val annDf = raw.toDF("vec_id", "vec")
    val nList = graft.operators.IvfIndex.defaultNList(n)
    var idx: graft.operators.IvfIndex = null
    timed(s"ivf build (nList=$nList)") {
      val cents = graft.operators.IvfIndex.fitCentroids(annDf, "vec",
        nList = nList, normalized = false)
      idx = graft.operators.IvfIndex.assign(annDf, cents, "vec_id", "vec")
      idx.assigned.count()
    }
    timed("bucket pack (cached after)") {
      idx.searchMerged[Long](queries.take(1), k = 1, nProbe = 1,
        normalized = false).count()
    }

    val member = SetMember(Array.tabulate(n / 2)(i => 2L * i))
    def filteredAnn(np: Int): Long =
      idx.searchMergedAllowed[Long](queries, k = topK, member, deny = false,
        nProbe = np, normalized = false).count()
    timed("filtered-ANN 1000q np32")(filteredAnn(32))
    timed("filtered-ANN 1000q np32 (again)")(filteredAnn(32))
    timed(s"filtered-ANN 1000q covering")(filteredAnn(nList))

    timed("q8 pack (cached after)") {
      idx.searchMergedQ8[Long](queries.take(1), k = 1, nProbe = 1,
        normalized = false).count()
    }
    def filteredAnnQ8(np: Int): Long =
      idx.searchMergedQ8Allowed[Long](queries, k = topK, member, deny = false,
        nProbe = np, normalized = false, overfetch = 4).count()
    timed("filtered-ANN+q8 1000q np32 of4")(filteredAnnQ8(32))
    timed("filtered-ANN+q8 1000q np32 (again)")(filteredAnnQ8(32))

    spark.stop()
  }
}
