package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel
import graft.core.BlockStore
import graft.operators.CosineTopK

/** Scale smoke: N x 256-d vectors through ingest + batch query,
  * exercising multi-block partitions and the treeAggregate merge at a
  * size the unit suite can't afford. Default 1M (~1 GB packed);
  * SPARK_GRAFT_SMOKE_N=10000000 runs the 100x-sf0.1 evidence pass
  * (~10 GB packed — converts SCALING.md's shuffle-volume claims into a
  * measured number; VERDICT r2 next-round #9). Run by hand; prints one
  * line per phase.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    // heap comes from the forked JVM (SPARK_DRIVER_MEM, build.sbt);
    // the 10M pass needs ~25 GB live (raw + packed both pinned).
    val spark = SparkSession.builder().master("local[24]")
      .config("spark.sql.shuffle.partitions", "24")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext

    val dim = 256
    val n = sys.env.get("SPARK_GRAFT_SMOKE_N").map(_.toInt).getOrElse(1000000)
    val parts = 24 * math.max(1, n / 1000000) // ~42k rows x 1 KB / partition
    val raw = sc.range(0, n, 1, parts).map { i =>
      val rng = new java.util.Random(i * 7919L)
      (i, Array.fill(dim)(rng.nextFloat()))
    }.persist(StorageLevel.MEMORY_ONLY)
    raw.count()

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val out = f
      println(f"SMOKE $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($out)")
    }

    var store: BlockStore[Long] = null
    timed("ingest 1M x 256") {
      store = BlockStore.fromRDD(raw, normalize = true).persist()
      store.materialize()
    }
    timed("blocks") { store.blocks.count() }
    val qrng = new java.util.Random(1)
    val queries = Array.tabulate(1000)((i: Int) => (i.toLong, Array.fill(dim)(qrng.nextFloat())))
    timed("batch 1000q top10") {
      CosineTopK.gemmBlocks(store, queries, 10, betterThan = Some(0.1)).count()
    }
    timed("batch again") {
      CosineTopK.gemmBlocks(store, queries, 10, betterThan = Some(0.1)).count()
    }
    // Distributed query side at a batch size no driver array should
    // hold: fresh random query vectors (own seed, unrelated to the
    // stored rows) as a Dataset, never collected. The default scales
    // inversely with the store size so the 10M evidence pass doesn't
    // silently append hours (work is nDistQ/1000 x the 1000-query
    // batch); the phase converts gemmQueries' P_q x P_s heap-shuffle
    // claim into a measured number.
    import spark.implicits._
    // clamp in Long BEFORE the Int cast: a tiny n makes the quotient
    // exceed Int.MaxValue (wrap -> 1.4B-query hang / silent 1000)
    val nDistQ = sys.env.get("SPARK_GRAFT_SMOKE_DISTQ").map(_.toInt)
      .getOrElse(math.max(1000L,
        math.min(100000L, 100000L * 1000000L / math.max(1, n))).toInt)
    val qDs = spark.createDataset(
      sc.range(0, nDistQ, 1, 24).map { i =>
        val rng = new java.util.Random(i * 104729L)
        (i, Array.fill(dim)(rng.nextFloat()))
      })
    timed(s"distq ${nDistQ}q top10") {
      CosineTopK.gemmQueries(store, qDs, 10, betterThan = Some(0.1)).count()
    }
    spark.stop()
  }
}
