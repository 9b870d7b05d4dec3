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
    // Round 21: optional plan dump of a q97-MIRROR frame, because the
    // catalog entry localCheckpoints its result — the committed plan
    // would be an opaque LogicalRDD scan. This rebuilds the identical
    // store/conf/query fixture and explains the frame queryDF actually
    // returns, so plans/r21 evidences the keying shape (windowed r20
    // vs window-free fast path r21). Usage: first CLI arg = output
    // file path.
    if (args.nonEmpty) {
      import org.apache.spark.sql.functions._
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      val st = graft.core.VdbStore.empty(spark, dim)
      st.upsertDF(emb.select(
        lpad(col("vec_id").cast("string"), 8, "0").as("_id_"),
        col("embedding").as("vector"),
        lit(null).cast("string").as("meta")))
      st.enableAnn(16)
      spark.conf.set("graft.ann.filtered", "true")
      spark.conf.set("graft.query.exact", "true")
      spark.conf.set("graft.ann.filtered.max", "2")
      spark.conf.set("graft.ann.filtered.bloom.fpp", "0.3")
      val qdf = emb.filter(col("vec_id") >= 480 && col("vec_id") < 500)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val frame = st.queryDF(qdf, "qid", "qvec", topK = 10, nProbe = 16,
        where = Some(col("_id_") >= "00000100"))
      val txt = frame.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val out = java.nio.file.Paths.get(args(0))
      Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(out, txt)
      println(s"q97-mirror plan written to ${args(0)}")
    }
    spark.stop()
  }
}
