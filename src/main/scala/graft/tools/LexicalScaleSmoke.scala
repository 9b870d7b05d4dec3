package graft.tools

import org.apache.spark.sql.SparkSession

/** Inverted-index scale smoke with ADVERSARIAL stopword skew — the
  * measurement r13's done-criterion asked for: N synthetic docs
  * (default 1M, ~30 tokens from a 50k vocabulary) where ONE term
  * ("the") appears in 90% of documents. Under the old
  * `row_number()/count() OVER (PARTITION BY term)` plan that term was
  * one WindowExec task ranking 0.9·N rows to keep `maxPostings` (AQE
  * does not split window partitions); under the `min_k_ids`
  * bounded-heap aggregate only k ids + a count per term per map
  * partition cross the term-keyed exchange, so the stopword costs the
  * same as any other term. Prints wall + shuffle volume for a uniform
  * corpus and the skewed one — the two rows SCALING.md cites.
  */
object LexicalScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = sys.env.get("SPARK_GRAFT_SMOKE_DOCS").map(_.toInt).getOrElse(1000000)
    val spark = SparkSession.builder().master("local[24]")
      .config("spark.sql.shuffle.partitions", "24")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val shuffleW = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          shuffleW.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
          ()
        }
      })
    def timed(name: String)(f: => Long): Unit = {
      Thread.sleep(300)
      val w0 = shuffleW.get()
      val t0 = System.nanoTime()
      val out = f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val mb = (shuffleW.get() - w0) / 1048576.0
      println(f"LEXSMOKE $name%-28s $dt%7.2f s  shuffleMB=$mb%8.1f  (rows=$out)")
    }

    def corpus(stopword: Boolean) =
      spark.sparkContext.range(0, n, 1, 24).map { i =>
        val rng = new java.util.Random(i * 2654435761L + 5)
        val words = Array.fill(30)("w" + rng.nextInt(50000))
        val text =
          if (stopword && i % 10 != 0) "the " + words.mkString(" ")
          else words.mkString(" ")
        (i, text)
      }.toDF("doc_id", "text").persist()

    val uniform = corpus(stopword = false)
    timed("generate uniform")(uniform.count())
    timed("invertedIndex uniform") {
      graft.operators.Lexical.invertedIndex(
        uniform, "doc_id", "text", maxPostings = 8, minDf = 3L).count()
    }
    val skewed = corpus(stopword = true)
    timed("generate skewed")(skewed.count())
    timed("invertedIndex 90% stopword") {
      graft.operators.Lexical.invertedIndex(
        skewed, "doc_id", "text", maxPostings = 8, minDf = 3L).count()
    }
    uniform.unpersist(); skewed.unpersist()
    spark.stop()
  }
}
