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
    if (sys.env.contains("SPARK_GRAFT_PROFILE_BENCHLIKE")) {
      // Reproduce the bench's state when q22 runs: shingle cache warm,
      // q21 executed, then q22 timed on its FIRST execution.
      graft.operators.Dedup.prewarmShingles(docs, "doc_id", "text")
      // the bench's exact evaluation sink; rows are NOT displayed on
      // this path (a count() would pre-run the query and destroy the
      // first-run timing this mode exists to measure)
      def force(df: org.apache.spark.sql.DataFrame): Long = {
        graft.Bench.forceSink(df); -1L
      }
      timed("q21 (benchlike)")(force(
        graft.operators.Dedup.ngramJaccardBlocked(docs, "doc_id", "text")))
      timed("q22 first run")(force(
        graft.operators.Dedup.minhashLSH(docs, "doc_id", "text")))
      timed("q22 second run")(force(
        graft.operators.Dedup.minhashLSH(docs, "doc_id", "text")))
      spark.stop()
      return
    }
    if (sys.env.contains("SPARK_GRAFT_PROFILE_Q28")) {
      val sigs = graft.operators.Dedup.simhash(docs, "doc_id", "text").cache()
      timed("simhash sigs")(sigs.count())
      timed("q28 full")(
        graft.operators.Dedup.simhashNearDup(docs, "doc_id", "text").count())
      timed("q28 again")(
        graft.operators.Dedup.simhashNearDup(docs, "doc_id", "text").count())
      spark.stop()
      return
    }
    if (sys.env.contains("SPARK_GRAFT_PROFILE_ONLY_FULL")) {
      timed("full cold (fresh session)")(
        graft.operators.Dedup.minhashLSH(docs, "doc_id", "text").count())
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          System.err.println(
            s"Q22STAGE id=${s.stageInfo.stageId} tasks=${s.stageInfo.numTasks} " +
            s"run=${s.stageInfo.taskMetrics.executorRunTime}ms " +
            s"wall=${s.stageInfo.completionTime.getOrElse(0L) - s.stageInfo.submissionTime.getOrElse(0L)}ms " +
            s"name=${s.stageInfo.name.take(60)}")
      })
      timed("full warm")(
        graft.operators.Dedup.minhashLSH(docs, "doc_id", "text").count())
      spark.stop()
      return
    }
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
      min(md5(concat(lit(s"$s:"), col("shingle")).cast("binary"))).as(s"sig$s")
    }
    val mh = shingles.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    timed("minhash sigs (12x md5/row)")(mh.count())

    val mhc = mh.cache(); mhc.count()
    val nBands = 4
    val bandCols = (0 until nBands).map { b =>
      val sigs = (0 until 3).map(o => col(s"sig${b * 3 + o}"))
      struct(lit(b).as("band"),
        md5(concat_ws("|", sigs: _*).cast("binary")).as("bkey"))
    }
    val bands = mhc
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    timed("bands")(bands.count())
    val bc = bands.cache(); bc.count()
    val x = bc.select(col("doc_id").as("a"), col("band"), col("bkey"))
    val y = bc.select(col("doc_id").as("b"), col("band"), col("bkey"))
    val cand = x.join(y, Seq("band", "bkey")).filter(col("a") < col("b"))
      .select("a", "b").distinct()
    timed("cand join")(cand.count())
    val cc = cand.cache(); cc.count()
    val sa = sets.select(col("doc_id").as("a"), col("shingles").as("sa"))
    val sb = sets.select(col("doc_id").as("b"), col("shingles").as("sb"))
    val ver = cc.join(sa, Seq("a")).join(sb, Seq("b"))
      .withColumn("jaccard",
        size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb"))).cast("double"))
      .filter(col("jaccard") >= 0.5)
    timed("verify")(ver.count())

    timed("full minhashLSH")(
      graft.operators.Dedup.minhashLSH(docs, "doc_id", "text").count())
    timed("full again")(
      graft.operators.Dedup.minhashLSH(docs, "doc_id", "text").count())
    spark.stop()
  }
}
