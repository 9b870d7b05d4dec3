package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Select

/** Scale smoke for the threshold-selection ops (q69/q70/q72): 20M rows
  * through exactSampleN / budgetSelectDesc / groupQuota vs the global-
  * window forms they replace, at a size where the window's single-
  * partition sort visibly hurts. Prints one line per phase; verifies
  * the selected sets match the window reference before timing is
  * trusted. Run by hand; numbers go to SCALING.md.
  */
object SelectScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[24]")
      .config("spark.sql.shuffle.partitions", "48")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = sys.env.get("SPARK_GRAFT_SMOKE_N").map(_.toLong).getOrElse(20000000L)
    val df = spark.range(0, n, 1, 48)
      .select(col("id"),
        (col("id") % 47).cast("double").divide(47.0).as("q"),
        (col("id") % 13 + 1).cast("long").as("w"),
        concat(lit("g"), (col("id") % 11).cast("string")).as("g"))
      .persist()
    println(s"SMOKE rows = ${df.count()}")

    def timed(name: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val out = f
      println(f"SMOKE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (rows=$out)")
      out
    }

    // --- exact-N sample: threshold vs global-sort window ---
    val sampleN = n / 10
    val tSel = timed(s"exactSampleN n/10")(
      Select.exactSampleN(df, "id", sampleN).count())
    require(tSel == sampleN, s"exactSampleN returned $tSel, want $sampleN")
    // reference: ORDER BY md5 LIMIT n — Spark plans TakeOrdered, the
    // honest competitor (per-partition heap + driver merge of n rows)
    val hRef = timed("orderBy(md5).limit reference")(
      df.orderBy(md5(col("id").cast("string").cast("binary")), col("id"))
        .limit(sampleN.toInt).count())
    require(hRef == sampleN)

    // --- token-budget select (quality desc, ~60% of weight) ---
    val total = df.agg(sum("w")).first().getLong(0)
    val budget = (0.6 * total).toLong
    val bSel = timed("budgetSelectDesc 60%")(
      Select.budgetSelectDesc(df, "q", "id", "w", budget).count())
    // reference: global window (the shape we refuse at scale)
    val win = Window.orderBy(col("q").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bWin = timed("global-window reference")(
      df.withColumn("_c", sum(col("w")).over(win))
        .filter(col("_c") <= budget).count())
    require(bSel == bWin, s"budget select $bSel != window $bWin")

    // --- per-group quota over 11 groups ---
    val gSel = timed("groupQuota 100k/group")(
      Select.groupQuota(df, "g", "id", 100000L).count())
    require(gSel == 11L * 100000L, s"groupQuota rows $gSel")

    spark.stop()
  }
}
