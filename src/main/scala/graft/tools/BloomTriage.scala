package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Bench, SparkEntry}

/** Round-20 triage of the q97 bulk-bloom entry after the
  * deterministic-surrogate-key change: time q96 (the untouched
  * filtered twin — the same-window noise control) against q97 and
  * print the per-call Spark job count for each, splitting real
  * key-scheme overhead from host contamination. Run by hand.
  */
object BloomTriage {
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
    val names = Seq("q96_vdb_querydf_filtered", "q97_vdb_querydf_bloom")
    // untimed warmup at sf0.001, like the bench
    names.foreach { n =>
      try Bench.forceSink(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
      catch { case e: Throwable => println(s"warmup $n: $e") }
    }
    val sc = spark.sparkContext
    names.foreach { n =>
      val samples = (1 to 5).map { _ =>
        val j0 = sc.statusTracker.getJobIdsForGroup(null).length
        val t = timed(Bench.forceSink(SparkEntry.queries(n)(spark, sfDir)))
        val j1 = sc.statusTracker.getJobIdsForGroup(null).length
        (t, j1 - j0)
      }
      println(f"BLOOMTRIAGE $n%-26s " +
        samples.map { case (t, j) => f"$t%6.3f s/$j%d jobs" }.mkString("  "))
    }
    // one traced q97 call: per-job wall + call site
    val before = sc.statusTracker.getJobIdsForGroup(null).toSet
    Bench.forceSink(SparkEntry.queries("q97_vdb_querydf_bloom")(spark, sfDir))
    val after = sc.statusTracker.getJobIdsForGroup(null).toSet
    (after -- before).toSeq.sorted.foreach { id =>
      sc.statusTracker.getJobInfo(id).foreach { j =>
        val stages = j.stageIds().flatMap(sid =>
          sc.statusTracker.getStageInfo(sid).map(si =>
            s"${si.name().take(60)}(${si.numTasks()}t)"))
        println(s"JOB $id ${j.status()} stages=${stages.mkString(" | ")}")
      }
    }
    spark.stop()
  }
}
