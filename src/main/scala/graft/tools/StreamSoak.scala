package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** componentsSink soak: N micro-batches (default 20) of 200 pairs each
  * through the REAL streaming sink with a reliable checkpoint dir
  * configured — the long-lived streaming-dedup deployment shape.
  * Prints persistent-RDD count, live checkpoint rdd-dirs, and fold time
  * every batch; all three must stay BOUNDED. Round 8: this soak caught
  * the superseded-snapshot checkpoint leak (one rdd-N dir per
  * micro-batch) that per-call cleanup could not see; componentsSink now
  * drops stale snapshot files with a one-generation reader grace window
  * (ADVICE r9), so ckptDirs must hold at <= 2. Labels are cross-checked
  * against a from-scratch connectedComponents at the end.
  */
object StreamSoak {
  def main(args: Array[String]): Unit = {
    val nBatches = sys.env.get("SPARK_GRAFT_SOAK_BATCHES").map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    val sc = spark.sparkContext
    sc.setLogLevel("WARN")
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ckptRoot = java.nio.file.Files.createTempDirectory("graft-soak").toFile
    sc.setCheckpointDir(ckptRoot.getAbsolutePath)
    def rddDirs(f: java.io.File): Int =
      if (!f.isDirectory) 0
      else if (f.getName.startsWith("rdd-")) 1
      else f.listFiles().map(rddDirs).sum

    val mem = MemoryStream[(Long, Long)]
    val sink = graft.streaming.StreamingOps.componentsSink(
      mem.toDF().toDF("a", "b"))
    val allPairs = scala.collection.mutable.Buffer[(Long, Long)]()
    (1 to nBatches).foreach { b =>
      // 100 fresh chains + 100 bridges into earlier batches; batch 1
      // has no earlier batch, so its "bridges" attach 100 fresh spur
      // nodes (1, 3, ..., 199) to its chains — real edges, not the
      // self-loops the b-1 formula degenerated to (ADVICE r8; the
      // exact graph doesn't matter to the soak, the end cross-check
      // recomputes expected components from allPairs either way)
      val bridgeBase = if (b == 1) 1L else (b - 1) * 10000L
      val pairs = (0 until 100).map { i =>
        (b * 10000L + i * 2, b * 10000L + i * 2 + 1)
      } ++ (0 until 100).map { i =>
        (bridgeBase + i * 2, b * 10000L + i * 2)
      }
      allPairs ++= pairs
      mem.addData(pairs)
      val t0 = System.nanoTime()
      val q = sink.writer
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      q.stop()
      val n = sink.current().count()
      println(f"SOAK batch $b%2d  ${(System.nanoTime() - t0) / 1e9}%5.2f s  " +
        f"rows=$n%6d  persistentRDDs=${sc.getPersistentRDDs.size}%3d  " +
        f"ckptDirs=${rddDirs(ckptRoot)}%3d")
    }
    val want = graft.operators.Dedup.connectedComponents(allPairs.toSeq.toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = sink.current().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    println(s"SOAK labels match full recompute: ${got == want} (${got.size} nodes)")
    spark.stop()
  }
}
