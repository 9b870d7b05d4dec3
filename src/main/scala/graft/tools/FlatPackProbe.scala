package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolates VERDICT r14 wrong #3: the full-scan (np=nList) route's
  * residual gap over the plain exact batch. Builds the SAME 100k×1024
  * store both ways — the BlockStore packed from source partitions
  * (even slabs) and the IvfIndex flat pack derived from the bucket
  * pack (slab sizes follow the cid hash) — prints per-slab row-count
  * distributions and times topKMerged 1000q on each, plus the full
  * searchMerged np=nList route for the end-to-end number. If the
  * distributions match but walls differ, the gap is route overhead;
  * if the flat pack straggles (max slab ≫ mean), it is geometry.
  */
object FlatPackProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dim = 1024
    val n = 100000
    val parts = 32
    val rows = spark.sparkContext.range(0, n, 1, parts).map { i =>
      val rng = new java.util.Random(i * 2654435761L)
      (i, Array.fill(dim)(rng.nextFloat()))
    }
    val qrng = new java.util.Random(42)
    val queries = Array.tabulate(1000)(i =>
      (i.toLong, Array.fill(dim)(qrng.nextFloat())))

    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val out = f
      println(f"FLATPROBE $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s ($out)")
    }
    def dist(sizes: Seq[Int]): String = {
      val s = sizes.sorted
      f"slabs=${s.length} min=${s.head} p50=${s(s.length / 2)} max=${s.last} " +
        f"skew=${s.last.toDouble / (sizes.sum.toDouble / s.length)}%.2f"
    }

    val bs = graft.core.BlockStore.fromRDD[Long](rows, normalize = false)
    bs.persist(); bs.materialize()
    println("FLATPROBE source-pack " + dist(bs.blocks.map(_.rows).collect().toSeq))
    (1 to 3).foreach { i =>
      timed(s"blockStore.topKMerged #$i")(
        bs.topK(queries, 10, normalizeQueries = false).count())
    }
    (1 to 3).foreach { i =>
      timed(s"blockStore merged #$i")(
        bs.topKMerged(queries, 10, normalizeQueries = false).length)
    }

    val idx = graft.operators.IvfIndex.build(
      rows.toDF("vec_id", "vec"), "vec_id", "vec", nList = 316)
    timed("searchMerged np=316 warmup")(
      idx.searchMerged[Long](queries, k = 10, nProbe = 316,
        normalized = false).count())
    (1 to 3).foreach { i =>
      timed(s"searchMerged np=316 #$i")(
        idx.searchMerged[Long](queries, k = 10, nProbe = 316,
          normalized = false).count())
    }
    println("FLATPROBE flat-pack   " + dist(
      idx.flatPackSizes(normalized = false)))
    idx.unpersistAssigned(); bs.unpersist()
    spark.stop()
  }
}
