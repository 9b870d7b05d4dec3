package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Focused measurement of the IVF bucket-pack phase — the one bench row
  * that stays suspect-flagged across otherwise-clean round-12 runs
  * (`picovdb_ann_build_pack` med 4-6.5 s vs min 1.5-2.9 s, bimodal).
  * Runs the EXACT bench shape (100k × 1024, √N lists, fresh build per
  * sample) six times back-to-back and splits the pack into its two
  * costs — the centroid-keyed shuffle+slab-pack job itself vs the
  * MEMORY_AND_DISK persist's first write — by timing a second
  * (cache-hit) probe after each first probe. Run by hand, solo.
  */
object PackBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[24]")
      .config("spark.sql.shuffle.partitions", "24")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sc = spark.sparkContext
    val dim = 1024
    val n = 100000
    val raw = sc.range(0, n, 1, 24).map { i =>
      val rng = new java.util.Random(i * 2654435761L)
      (i, Array.fill(dim)(rng.nextFloat()))
    }.persist(StorageLevel.MEMORY_ONLY)
    raw.count()
    val annDf = raw.toDF("vec_id", "vec")
    val q = Array.fill(dim)(0.5f)
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val nList = graft.operators.IvfIndex.defaultNList(n)
    val cents = graft.operators.IvfIndex.fitCentroids(annDf, "vec",
      nList = nList, normalized = false)
    (1 to 6).foreach { i =>
      val idx = graft.operators.IvfIndex.assign(annDf, cents, "vec_id", "vec")
      idx.assigned.count()
      val tFirst = timed {
        idx.searchPacked[Long](spark.createDataset(Seq((0L, q))),
          k = 1, nProbe = 1, normalized = false).count()
        ()
      }
      val tWarm = timed {
        idx.searchPacked[Long](spark.createDataset(Seq((0L, q))),
          k = 1, nProbe = 1, normalized = false).count()
        ()
      }
      println(f"PACKBENCH sample $i  first=$tFirst%6.2f s  warm=$tWarm%6.2f s")
      idx.unpersistAssigned()
    }
    spark.stop()
  }
}
