package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed order-statistics selection: "take the best rows until a
  * budget is exhausted" WITHOUT a global sort.
  *
  * The naive form of every corpus-curation selection — "highest-quality
  * documents up to a 2T-token budget", "exactly N docs sampled by
  * hash", "top quota per language" — is a global window
  * `SUM(w) OVER (ORDER BY key) <= budget`, which at 100 TB means a
  * full-corpus range-partitioned sort (terabytes through one total
  * order) before a single row is kept. This operator replaces it with
  * the classic two-pass threshold scheme used by distributed
  * ORDER BY ... LIMIT implementations:
  *
  *  1. HISTOGRAM pass: each row maps to a coarse bucket (a monotone
  *     quantization of the sort key, e.g. the top 16 bits of an md5
  *     prefix, or `floor(quality * 64Ki)`); one `groupBy(bucket)` sums
  *     the weights — a shuffle of at most `nBuckets` rows, collected
  *     to the driver (bounded: 64Ki longs, same driver-boundedness
  *     argument as the k-means sampleCap).
  *  2. PREFIX scan on the driver finds the boundary bucket b*: every
  *     bucket strictly before b* fits inside the budget in full; b*
  *     itself only partially.
  *  3. SELECT pass: rows in buckets < b* are kept with a map-side
  *     filter (no shuffle, no sort); ONLY the boundary bucket's rows —
  *     an expected 1/nBuckets of the data (~1.5 GB of a 100 TB corpus
  *     at the 64Ki default) — go through an exact in-bucket window to
  *     spend the remaining budget.
  *
  * The result is row-for-row identical to the global window (the
  * bucket function is a monotone coarsening of the total order, so
  * cross-bucket order is already decided; the window re-establishes
  * the exact order only where it still matters). Equivalence against
  * the window form is pinned in SelectSpec.
  *
  * The same machinery runs per-group (`groupCols` non-empty) for
  * per-language / per-domain quotas: the histogram keys on
  * (group, bucket) — driver-bounded by nGroups x occupied buckets —
  * and the boundary window partitions on the group, so a single giant
  * group ("en" at 90% of the corpus) never funnels through one task
  * the way a plain `row_number() OVER (PARTITION BY lang)` does.
  */
object Select {

  private val B = "_tsel_bucket"

  /** Keep, per group (or globally when `groupCols` is empty), the
    * maximal prefix of rows — ordered by `order` — whose running
    * `weight` sum stays <= `budget`. A row is kept iff the cumulative
    * weight INCLUDING it is within budget (the SQL-window semantics).
    *
    * `bucket` must be a monotone coarsening of `order`: if bucket(r1)
    * < bucket(r2) then r1 precedes r2 in the intended order, and rows
    * that compare equal land in the same bucket (make it a function of
    * the leading sort key only). Buckets are traversed ascending. A
    * NULL bucket (e.g. md5 of a NULL id) coalesces to bucket 0,
    * consistent with Spark's NULLS-FIRST ascending sort — rows with a
    * NULL sort key are the earliest prefix, exactly where the window
    * form puts them. NULL GROUP keys are a real group (null-safe
    * join), matching `PARTITION BY`.
    *
    * `weight` must be a non-negative integral column; a NULL weight
    * counts as 0 (SQL SUM semantics).
    */
  def thresholdSelect(df: DataFrame, bucket: Column, order: Seq[Column],
                      weight: Column, budget: Long,
                      groupCols: Seq[String] = Nil): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    thresholdSelectWith(df, bucket, order, weight, groupCols)(
      (_, _) => budget)
  }

  /** Core: like [[thresholdSelect]] but the per-group budget is a
    * function of (group key, group's total weight) — computed from
    * the histogram pass, so data-derived budgets ("60% of corpus
    * tokens") cost NO extra corpus scan.
    */
  def thresholdSelectWith(df: DataFrame, bucket: Column,
                          order: Seq[Column], weight: Column,
                          groupCols: Seq[String] = Nil)
                         (budgetOf: (List[Any], Long) => Long): DataFrame = {
    require(order.nonEmpty, "need at least one order column")
    val dfb = df.withColumn(B, coalesce(bucket.cast("int"), lit(0)))
    val gcols = groupCols.map(col)

    // Pass 1: (group, bucket) weight histogram, driver-bounded.
    val hist = dfb.groupBy((gcols :+ col(B)): _*)
      .agg(coalesce(sum(weight.cast("long")), lit(0L)).as("_w"))
      .collect()

    // Driver prefix scan per group -> (boundary bucket, remaining
    // budget inside it). Groups whose total fits entirely get cut =
    // (Int.MaxValue, 0): every bucket passes the strict filter.
    type Cut = (Int, Long)
    val byGroup = hist.groupBy(r => groupCols.map(r.getAs[Any]).toList)
    val cuts: Map[List[Any], Cut] = byGroup.map { case (g, rows) =>
      val sorted = rows.map(r => (r.getAs[Int](B), r.getAs[Long]("_w")))
        .sortBy(_._1)
      val budget = budgetOf(g, sorted.iterator.map(_._2).sum)
      require(budget >= 0, s"budget must be >= 0, got $budget for group $g")
      var cum = 0L
      var cut: Cut = (Int.MaxValue, 0L)
      var i = 0
      var done = false
      while (i < sorted.length && !done) {
        val (b, w) = sorted(i)
        if (cum + w > budget) { cut = (b, budget - cum); done = true }
        else cum += w
        i += 1
      }
      g -> cut
    }

    if (groupCols.isEmpty) {
      val (cutB, remaining) = cuts.getOrElse(Nil, (Int.MaxValue, 0L))
      val full = dfb.filter(col(B) < cutB)
      // remaining == 0 still needs the window: zero-weight rows at the
      // front of the boundary bucket are kept by the SQL-window form.
      val boundary =
        if (cutB == Int.MaxValue) None
        else {
          val w = Window.partitionBy(lit(0)).orderBy(order: _*)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          Some(dfb.filter(col(B) === cutB)
            .withColumn("_cum", sum(weight.cast("long")).over(w))
            .filter(col("_cum") <= remaining).drop("_cum"))
        }
      boundary.fold(full)(full.unionByName(_)).drop(B)
    } else {
      // Broadcast the per-group cut table; boundary window partitions
      // on the group, so only ~1/nBuckets of each group's rows sort.
      // The join is NULL-SAFE (<=>) with renamed cut columns: a NULL
      // group key is a real partition, as in the window form.
      val spark = df.sparkSession
      val cutRows = cuts.toSeq.map { case (g, (b, r)) =>
        org.apache.spark.sql.Row.fromSeq(g :+ b :+ r)
      }
      val gSchema = groupCols.map(c =>
        dfb.schema(c).copy(name = "_cutg_" + c))
      val cutSchema = org.apache.spark.sql.types.StructType(
        gSchema :+
          org.apache.spark.sql.types.StructField("_cutb", org.apache.spark.sql.types.IntegerType) :+
          org.apache.spark.sql.types.StructField("_rem", org.apache.spark.sql.types.LongType))
      val cutDf = broadcast(
        spark.createDataFrame(spark.sparkContext.parallelize(cutRows, 1), cutSchema))
      val joinCond = groupCols.map(c => dfb(c) <=> cutDf("_cutg_" + c))
        .reduce(_ && _)
      val joined = dfb.join(cutDf, joinCond)
        .drop(groupCols.map("_cutg_" + _): _*)
      val full = joined.filter(col(B) < col("_cutb"))
      val w = Window.partitionBy(gcols: _*).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // bucket values are < Int.MaxValue, so fully-fitting groups
      // (cut = MaxValue) contribute no boundary rows here.
      val boundary = joined.filter(col(B) === col("_cutb"))
        .withColumn("_cum", sum(weight.cast("long")).over(w))
        .filter(col("_cum") <= col("_rem")).drop("_cum")
      full.unionByName(boundary).drop(B, "_cutb", "_rem")
    }
  }

  /** Hex-hash ordering columns for deterministic sampling, matching
    * the q38 convention (md5 of the id rendered as a string): the full
    * 32-char lowercase hex compares identically to the 128-bit value,
    * and its top 16 bits give the monotone bucket.
    */
  def hashOrder(idCol: String, nHexChars: Int = 4): (Column, Seq[Column]) = {
    require(nHexChars >= 1 && nHexChars <= 7, "1..7 hex chars (int-safe)")
    val h = md5(col(idCol).cast("string").cast("binary"))
    val bucket = conv(substring(h, 1, nHexChars), 16, 10).cast("int")
    (bucket, Seq(h, col(idCol)))
  }

  /** Exactly-N deterministic global sample: the N rows with the
    * smallest md5(id) (ties by id). Equivalent to
    * `ORDER BY md5(id::varchar), id LIMIT n` without the global sort.
    */
  def exactSampleN(df: DataFrame, idCol: String, n: Long): DataFrame = {
    val (bucket, order) = hashOrder(idCol)
    thresholdSelect(df, bucket, order, lit(1L), n)
  }

  /** Per-group exactly-`quota` deterministic sample (language /
    * domain balancing): within each group, the `quota` rows with the
    * smallest md5(id). Equivalent to
    * `row_number() OVER (PARTITION BY group ORDER BY md5(id), id) <= quota`
    * with the boundary-bucket window as the only per-row sort.
    */
  def groupQuota(df: DataFrame, groupCol: String, idCol: String,
                 quota: Long): DataFrame = {
    // 256 buckets per group keeps the driver histogram at
    // nGroups x 256 rows while still sorting only ~1/256 of each
    // group through the boundary window.
    val (bucket, order) = hashOrder(idCol, nHexChars = 2)
    thresholdSelect(df, bucket, order, lit(1L), quota, Seq(groupCol))
  }

  /** Token-budget curation: order rows by (`scoreCol` DESC, id ASC) —
    * scoreCol must already be rounded/quantized so both engines agree
    * on ties — and keep the best prefix whose `weightCol` (token
    * count) sum fits the budget. `lo`/`hi` bound the score range for
    * bucketization (score values outside are clamped).
    */
  def budgetSelectDesc(df: DataFrame, scoreCol: String, idCol: String,
                       weightCol: String, budget: Long,
                       lo: Double = 0.0, hi: Double = 1.0,
                       nBuckets: Int = 1 << 16): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    thresholdSelectWith(df, descBucket(scoreCol, lo, hi, nBuckets),
      Seq(col(scoreCol).desc, col(idCol)), col(weightCol))((_, _) => budget)
  }

  /** [[budgetSelectDesc]] with a DATA-DERIVED budget: keep the best
    * prefix holding `frac` of the TOTAL weight (e.g. "the
    * highest-quality 60% of corpus tokens"). The total comes from the
    * histogram pass — no extra corpus scan.
    */
  def budgetSelectDescFraction(df: DataFrame, scoreCol: String,
                               idCol: String, weightCol: String,
                               frac: Double,
                               lo: Double = 0.0, hi: Double = 1.0,
                               nBuckets: Int = 1 << 16): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, s"frac in [0,1], got $frac")
    thresholdSelectWith(df, descBucket(scoreCol, lo, hi, nBuckets),
      Seq(col(scoreCol).desc, col(idCol)), col(weightCol))(
      (_, total) => math.floor(frac * total).toLong)
  }

  private def descBucket(scoreCol: String, lo: Double, hi: Double,
                         nBuckets: Int): Column = {
    val span = hi - lo
    require(span > 0, "hi must exceed lo")
    // Monotone DESC mapping: higher score -> lower bucket.
    val frac = (lit(hi) - least(greatest(col(scoreCol), lit(lo)), lit(hi))) / lit(span)
    least(floor(frac * nBuckets), lit(nBuckets - 1)).cast("int")
  }
}
