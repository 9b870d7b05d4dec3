package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Bench, SparkEntry}

/** One-off timing harness for a single catalog query under the exact
  * bench session settings (used to validate the q34 convergence-witness
  * change without a full bench sweep). Run by hand:
  * `sbt "runMain graft.tools.TimeQ34 q34_dedup_clusters"`.
  */
object TimeQ34 {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q34_dedup_clusters"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "24")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup at sf0.001, like the bench
    Bench.forceSink(SparkEntry.queries(name)(spark, "/root/testdata/sf0.001"))
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      Bench.forceSink(SparkEntry.queries(name)(spark, sfDir))
      println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
