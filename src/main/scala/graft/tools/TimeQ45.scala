package graft.tools
import org.apache.spark.sql.SparkSession

/** q45 (mergeClusters) standalone triage: 4 back-to-back samples under
  * the bench's session config — separates the entry's steady state from
  * interleaved-catalog sequence effects (first sample carries codegen
  * warmup). Used in round 8 to A/B the connectedComponents edge
  * repartitioning (no catalog-scale regression; −27% at the 3M smoke).
  */
object TimeQ45 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[24]")
      .config("spark.sql.shuffle.partitions", "24")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      graft.Bench.forceSink(graft.Queries.mergeClusters(spark, dir))
      println(f"TIMEQ45 sample $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
