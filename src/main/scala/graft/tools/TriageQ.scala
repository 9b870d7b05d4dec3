package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Bench, SparkEntry}

/** Round-4 triage of the q27/q29/q30 catalog regressions (VERDICT r3
  * "what's wrong" #3): reproduce the bench session exactly, then time
  * each suspect query N times in a row to split first-timed-run
  * overhead (codegen, file-listing, cache warm) from steady-state data
  * work, at both the r2 (32) and r3 (24) shuffle-partition settings.
  * Run by hand; prints one line per sample.
  */
object TriageQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).select(org.apache.spark.sql.functions.sum("id")).collect()

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val suspects = Seq("q13_text_tokens", "q27_tokens_bpeish", "q29_winnow_fp",
      "q30_langid_chargram")

    // sf0.001 untimed warmup, like the bench
    suspects.foreach { n =>
      try Bench.forceSink(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () }
    }
    Seq("24", "32").foreach { parts =>
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      suspects.foreach { n =>
        val samples = (1 to 5).map { _ =>
          timed(Bench.forceSink(SparkEntry.queries(n)(spark, sfDir)))
        }
        println(f"TRIAGE parts=$parts $n%-22s " +
          samples.map(s => f"$s%6.3f").mkString(" "))
      }
    }
    spark.stop()
  }
}
