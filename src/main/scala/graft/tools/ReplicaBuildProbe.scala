package graft.tools

import org.apache.spark.sql.SparkSession

/** Serving-replica HNSW build wall at the reference's 100k × 1024
  * scale (VERDICT r19 next-round #7): `LocalReplica.buildHnsw` goes
  * through `Hnsw.build` with auto parallelism, which resolves to the
  * common pool on the driver — so the replica build must inherit the
  * round-19 parallel commit (target ≤ 25 s, vs the 93.7 s serial
  * figure round 18 complained about). Run by hand; prints one line
  * per phase. Results recorded in SCALING.md.
  */
object ReplicaBuildProbe {
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
    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val out = f
      println(f"REPLICABUILD $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($out)")
    }
    val batch = spark.sparkContext.range(0, n, 1, 24).map { i =>
      val rng = new java.util.Random(i * 2654435761L)
      (f"id$i%06d", Array.fill(dim)(rng.nextFloat()), null: String)
    }.toDF("_id_", "vector", "meta").persist()
    batch.count()
    val store = graft.core.VdbStore.empty(spark, dim)
    timed("upsertDF 100k x 1024")(store.upsertDF(batch))
    var rep: graft.core.LocalReplica = null
    timed("localReplica cut") { rep = store.localReplica(); rep.size }
    timed("replica buildHnsw (auto par)") { rep.buildHnsw(); rep.hnswSource }
    // serving sanity at the reference's efSearch
    val q = {
      val rng = new java.util.Random(7)
      Array.fill(dim)(rng.nextFloat())
    }
    timed("queryOneHnsw ef=32 x100") {
      var i = 0
      while (i < 100) { rep.queryOneHnsw(q, topK = 10, ef = 32); i += 1 }
      "ok"
    }
    spark.stop()
  }
}
