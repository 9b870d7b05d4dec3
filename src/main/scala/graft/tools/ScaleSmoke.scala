package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel
import graft.core.BlockStore
import graft.operators.CosineTopK

/** 10x-bench scale smoke: 1M x 256-d vectors (~1 GB packed) through
  * ingest + batch query, exercising multi-block partitions and the
  * treeAggregate merge at a size the unit suite can't afford. Run by
  * hand; prints one line per phase.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[24]")
      .config("spark.sql.shuffle.partitions", "24")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext

    val dim = 256
    val n = 1000000
    val raw = sc.range(0, n, 1, 24).map { i =>
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
    spark.stop()
  }
}
