package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for selected catalog queries so the
  * partition/pushdown/broadcast story can be audited by eye.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val which = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN",
      "q06_point_lookup,q07_count_by_label,q17_agg_pricing,q18_top_customers,q22_minhash_lsh")
      .split(",").toSet
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => which(n) }
      .foreach { case (name, fn) =>
        println(s"\n===== $name =====")
        fn(spark, dir).explain("formatted")
      }
    spark.stop()
  }
}
