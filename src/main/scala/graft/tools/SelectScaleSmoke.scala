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
        // 90%-skewed groups: "big" holds 9/10 of rows — the giant-group
        // case the per-group histogram + 2-level refine exists for
        when(col("id") % 10 === 0,
          concat(lit("g"), (col("id") % 7).cast("string")))
          .otherwise(lit("big")).as("g"))
      .persist()
    println(s"SMOKE rows = ${df.count()}")

    def timed(name: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val out = f
      println(f"SMOKE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (rows=$out)")
      out
    }

    // order-independent SET checksum: (count, sum of xxhash64(id)) —
    // equal checksums mean the same selected id set with overwhelming
    // probability, so the timed runs are verified, not just counted
    def sig(d: org.apache.spark.sql.DataFrame): (Long, BigDecimal) = {
      // decimal sum: ANSI mode would overflow a long sum of 2M hashes
      val r = d.agg(count(lit(1)),
        sum(xxhash64(col("id")).cast("decimal(38,0)"))).first()
      (r.getLong(0), BigDecimal(r.getDecimal(1)))
    }

    // --- exact-N sample: threshold vs global-sort window ---
    val sampleN = n / 10
    val selDf = Select.exactSampleN(df, "id", sampleN)
    val tSel = timed(s"exactSampleN n/10")(selDf.count())
    require(tSel == sampleN, s"exactSampleN returned $tSel, want $sampleN")
    // reference: ORDER BY md5 LIMIT n — Spark plans TakeOrdered, the
    // honest competitor (per-partition heap + driver merge of n rows)
    val refDf = df.orderBy(md5(col("id").cast("string").cast("binary")), col("id"))
      .limit(sampleN.toInt)
    val hRef = timed("orderBy(md5).limit reference")(refDf.count())
    require(hRef == sampleN)
    require(sig(selDf) == sig(refDf), "exactSampleN set != limit-reference set")

    // --- token-budget select (quality desc, ~60% of weight) ---
    val total = df.agg(sum("w")).first().getLong(0)
    val budget = (0.6 * total).toLong
    val bDf = Select.budgetSelectDesc(df, "q", "id", "w", budget)
    val bSel = timed("budgetSelectDesc 60%")(bDf.count())
    // reference: global window (the shape we refuse at scale)
    val win = Window.orderBy(col("q").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDf = df.withColumn("_c", sum(col("w")).over(win))
      .filter(col("_c") <= budget)
    val bWin = timed("global-window reference")(wDf.count())
    require(bSel == bWin, s"budget select $bSel != window $bWin")
    require(sig(bDf) == sig(wDf), "budget-select set != window set")

    // --- per-group quota: 7 small groups + one 90%-of-rows group ---
    val gDf = Select.groupQuota(df, "g", "id", 100000L)
    val gSel = timed("groupQuota 100k/group skewed")(gDf.count())
    require(gSel == 8L * 100000L, s"groupQuota rows $gSel")
    val gWin = Window.partitionBy(col("g")).orderBy(
      md5(col("id").cast("string").cast("binary")), col("id"))
    val gRef = df.withColumn("_rk", row_number().over(gWin))
      .filter(col("_rk") <= 100000)
    require(sig(gDf) == sig(gRef), "groupQuota set != per-group window set")

    spark.stop()
  }
}
