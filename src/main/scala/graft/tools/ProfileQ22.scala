package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for expensive catalog queries (not part of the
  * driver contract; run by hand while optimizing).
  */
object ProfileQ22 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    timed("docs.count")(docs.count())
    timed("docs stats") {
      docs.select(avg(size(split(trim(col("text")), "\\s+")))).show(); 1L
    }

    val sets = graft.operators.Dedup.shingleSets(docs, "doc_id", "text", 3).cache()
    timed("shingleSets")(sets.count())
    val shingles = sets.select(col("doc_id"), explode(col("shingles")).as("shingle"))
    timed("explode shingles")(shingles.count())
    timed("distinct shingles")(shingles.select("shingle").distinct().count())

    val sigCols = (0 until 12).map { s =>
      min(md5(concat(lit(s + ":"), col("shingle")).cast("binary"))).as(s"sig$s")
    }
    val mh = shingles.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    timed("minhash sigs (12x md5/row)")(mh.count())

    timed("full minhashLSH")(
      graft.operators.Dedup.minhashLSH(docs, "doc_id", "text").count())
    spark.stop()
  }
}
