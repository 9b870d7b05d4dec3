package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Distributed order-statistics selection: "take the best rows until a
  * budget is exhausted" WITHOUT a global sort.
  *
  * The naive form of every corpus-curation selection — "highest-quality
  * documents up to a 2T-token budget", "exactly N docs sampled by
  * hash", "top quota per language" — is a global window
  * `SUM(w) OVER (ORDER BY key) <= budget`, which at 100 TB means a
  * full-corpus range-partitioned sort (terabytes through one total
  * order) before a single row is kept. This operator replaces it with
  * the classic multi-pass threshold scheme used by distributed
  * ORDER BY ... LIMIT implementations:
  *
  *  1. HISTOGRAM pass: each row maps to a coarse bucket (a monotone
  *     quantization of the sort key, e.g. the top 8 bits of an md5
  *     prefix, or `floor(quality * 256)`); one `groupBy(bucket)` sums
  *     the weights — a shuffle of at most nBuckets rows, collected
  *     to the driver (bounded: the same driver-boundedness argument
  *     as the k-means sampleCap).
  *  2. PREFIX scan on the driver finds the boundary bucket b*: every
  *     bucket strictly before b* fits inside the budget in full; b*
  *     itself only partially.
  *  3. REFINE (optional further levels): the boundary bucket's rows —
  *     an expected 1/nBuckets of the input — repeat (1)+(2) with a
  *     finer bucketization and the remaining budget. Each level is a
  *     map-side filter + a tiny histogram; no shuffles of row data.
  *  4. SELECT pass: rows in buckets < b* at any level are kept with a
  *     map-side filter (no shuffle, no sort); ONLY the final level's
  *     boundary rows — 1/(nBuckets^levels) of the input, ~6 MB of a
  *     100 TB corpus at two 256-way levels — go through an exact
  *     in-bucket window to spend the remaining budget.
  *
  * The result is row-for-row identical to the global window (each
  * bucket function is a monotone coarsening of the total order, so
  * cross-bucket order is already decided; the window re-establishes
  * the exact order only where it still matters). Equivalence against
  * the window form is pinned in SelectSpec, including multi-level.
  *
  * The same machinery runs per-group (`groupCols` non-empty) for
  * per-language / per-domain quotas: histograms key on
  * (group, bucket) — driver-bounded by nGroups x occupied buckets —
  * and the final window partitions on the group, so a single giant
  * group ("en" at 90% of the corpus) never funnels through one task
  * the way a plain `row_number() OVER (PARTITION BY lang)` does: with
  * two 256-way levels its window input is 1/65536 of the group.
  *
  * Each level's histogram re-filters from the source (levels are
  * map-side filter scans — cheap, shuffle-free, and cache-friendly if
  * the caller persisted the input); nothing is pinned internally.
  */
object Select {

  private val B = "_tsel_bucket"

  /** Keep, per group (or globally when `groupCols` is empty), the
    * maximal prefix of rows — ordered by `order` — whose running
    * `weight` sum stays <= `budget`. A row is kept iff the cumulative
    * weight INCLUDING it is within budget (the SQL-window semantics).
    *
    * `buckets` are coarse-to-fine monotone coarsenings of `order`:
    * for the first level, bucket(r1) < bucket(r2) implies r1 precedes
    * r2 in the intended order; each later level needs the same
    * property only WITHIN one parent bucket (a strict prefix
    * refinement, e.g. 2 then 4 leading md5 hex chars, satisfies it
    * globally). Rows that compare equal under `order` must land in
    * the same bucket at every level. Buckets traverse ascending. A
    * NULL bucket (e.g. md5 of a NULL id) coalesces to bucket 0,
    * consistent with Spark's NULLS-FIRST ascending sort — rows with a
    * NULL sort key are the earliest prefix, exactly where the window
    * form puts them. NULL GROUP keys are a real group (null-safe
    * join), matching `PARTITION BY`.
    *
    * `weight` must be a non-negative integral column; a NULL weight
    * counts as 0 (SQL SUM semantics).
    */
  def thresholdSelect(df: DataFrame, buckets: Seq[Column],
                      order: Seq[Column], weight: Column, budget: Long,
                      groupCols: Seq[String] = Nil): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    thresholdSelectWith(df, buckets, order, weight, groupCols)(
      (_, _) => budget)
  }

  /** Single-level convenience overload. */
  def thresholdSelect(df: DataFrame, bucket: Column, order: Seq[Column],
                      weight: Column, budget: Long): DataFrame =
    thresholdSelect(df, Seq(bucket), order, weight, budget)

  /** Core: like [[thresholdSelect]] but the per-group budget is a
    * function of (group key, group's total weight) — computed from
    * the first histogram pass, so data-derived budgets ("60% of
    * corpus tokens") cost NO extra corpus scan.
    */
  def thresholdSelectWith(df: DataFrame, buckets: Seq[Column],
                          order: Seq[Column], weight: Column,
                          groupCols: Seq[String] = Nil)
                         (budgetOf: (List[Any], Long) => Long): DataFrame = {
    require(order.nonEmpty, "need at least one order column")
    require(buckets.nonEmpty, "need at least one bucket level")
    val gcols = groupCols.map(col)
    val wLong = weight.cast("long")

    var work: DataFrame = df
    var keeps: List[DataFrame] = Nil
    // per-group remaining budget, carried across levels
    var budgets: Map[List[Any], Long] = Map.empty

    for ((bk, li) <- buckets.zipWithIndex) {
      val dfb = work.withColumn(B, coalesce(bk.cast("int"), lit(0)))
      val hist = dfb.groupBy((gcols :+ col(B)): _*)
        .agg(coalesce(sum(wLong), lit(0L)).as("_w"))
        .collect()
      val byGroup = hist.groupBy(r => groupCols.map(r.getAs[Any]).toList)
      val cuts: Map[List[Any], (Int, Long)] = byGroup.map { case (g, rows) =>
        val sorted = rows.map(r => (r.getAs[Int](B), r.getAs[Long]("_w")))
          .sortBy(_._1)
        val budget =
          if (li == 0) {
            val b = budgetOf(g, sorted.iterator.map(_._2).sum)
            require(b >= 0, s"budget must be >= 0, got $b for group $g")
            b
          } else budgets.getOrElse(g, 0L)
        var cum = 0L
        var cut = (Int.MaxValue, 0L)
        var i = 0
        var done = false
        while (i < sorted.length && !done) {
          val (b, w) = sorted(i)
          if (cum + w > budget) { cut = (b, budget - cum); done = true }
          else cum += w
          i += 1
        }
        // fully-fitting group: whole level keeps, nothing boundary —
        // remaining budget is irrelevant (no rows survive to refine)
        g -> cut
      }
      budgets = cuts.map { case (g, (_, rem)) => g -> rem }

      if (groupCols.isEmpty) {
        val (cutB, _) = cuts.getOrElse(Nil, (Int.MaxValue, 0L))
        keeps ::= dfb.filter(col(B) < cutB).drop(B)
        work =
          if (cutB == Int.MaxValue) dfb.filter(lit(false)).drop(B)
          else dfb.filter(col(B) === cutB).drop(B)
      } else {
        val joined = joinCuts(dfb, groupCols, cuts.map {
          case (g, (b, _)) => g -> b
        })
        keeps ::= joined.filter(col(B) < col("_cutb")).drop(B, "_cutb")
        // bucket values are < Int.MaxValue, so fully-fitting groups
        // contribute no boundary rows here.
        work = joined.filter(col(B) === col("_cutb")).drop(B, "_cutb")
      }
    }

    // Final exact window over the last boundary — remaining == 0 still
    // needs it: zero-weight rows at the front of the boundary are kept
    // by the SQL-window form.
    val finals =
      if (groupCols.isEmpty) {
        val remaining = budgets.getOrElse(Nil, 0L)
        val w = Window.partitionBy(lit(0)).orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        work.withColumn("_cum", sum(wLong).over(w))
          .filter(col("_cum") <= remaining).drop("_cum")
      } else {
        val joined = joinRem(work, groupCols, budgets)
        val w = Window.partitionBy(gcols: _*).orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        joined.withColumn("_cum", sum(wLong).over(w))
          .filter(col("_cum") <= col("_rem")).drop("_cum", "_rem")
      }
    (finals :: keeps).reduce(_ unionByName _)
  }

  /** Broadcast a per-group int payload and null-safe-join it on the
    * group columns as `_cutb` (NULL group keys are a real group).
    */
  private def joinCuts(dfb: DataFrame, groupCols: Seq[String],
                       cut: Map[List[Any], Int]): DataFrame = {
    val rows = cut.toSeq.map { case (g, b) => Row.fromSeq(g :+ b) }
    joinPayload(dfb, groupCols, rows,
      StructField("_cutb", IntegerType))
  }

  private def joinRem(dfb: DataFrame, groupCols: Seq[String],
                      rem: Map[List[Any], Long]): DataFrame = {
    val rows = rem.toSeq.map { case (g, r) => Row.fromSeq(g :+ r) }
    joinPayload(dfb, groupCols, rows,
      StructField("_rem", LongType))
  }

  private def joinPayload(dfb: DataFrame, groupCols: Seq[String],
                          rows: Seq[Row], payload: StructField): DataFrame = {
    val spark = dfb.sparkSession
    val gSchema = groupCols.map(c => dfb.schema(c).copy(name = "_cutg_" + c))
    val schema = StructType(gSchema :+ payload)
    val cutDf = broadcast(
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema))
    val cond = groupCols.map(c => dfb(c) <=> cutDf("_cutg_" + c))
      .reduce(_ && _)
    dfb.join(cutDf, cond).drop(groupCols.map("_cutg_" + _): _*)
  }

  /** Hex-hash ordering columns for deterministic sampling, matching
    * the q38 convention (md5 of the id rendered as a string): the full
    * 32-char lowercase hex compares identically to the 128-bit value,
    * and hex prefixes give nested monotone buckets — level i uses the
    * first 2·i chars, so each level 256-way refines its parent.
    */
  def hashBuckets(idCol: String,
                  nLevels: Int = 2): (Seq[Column], Seq[Column]) = {
    require(nLevels >= 1 && nLevels <= 3, "1..3 levels (int-safe)")
    val h = md5(col(idCol).cast("string").cast("binary"))
    val buckets = (1 to nLevels).map(l =>
      conv(substring(h, 1, 2 * l), 16, 10).cast("int"): Column)
    (buckets, Seq(h, col(idCol)))
  }

  /** Single-level variant of [[hashBuckets]] (kept for callers that
    * band rows themselves).
    */
  def hashOrder(idCol: String, nHexChars: Int = 4): (Column, Seq[Column]) = {
    require(nHexChars >= 1 && nHexChars <= 7, "1..7 hex chars (int-safe)")
    val h = md5(col(idCol).cast("string").cast("binary"))
    val bucket = conv(substring(h, 1, nHexChars), 16, 10).cast("int")
    (bucket, Seq(h, col(idCol)))
  }

  /** Exactly-N deterministic global sample: the N rows with the
    * smallest md5(id) (ties by id). Equivalent to
    * `ORDER BY md5(id::varchar), id LIMIT n` without the global sort;
    * two 256-way levels leave 1/65536 of the rows for the final
    * window.
    */
  def exactSampleN(df: DataFrame, idCol: String, n: Long): DataFrame = {
    val (buckets, order) = hashBuckets(idCol)
    thresholdSelect(df, buckets, order, lit(1L), n)
  }

  /** Per-group exactly-`quota` deterministic sample (language /
    * domain balancing): within each group, the `quota` rows with the
    * smallest md5(id). Equivalent to
    * `row_number() OVER (PARTITION BY group ORDER BY md5(id), id) <= quota`
    * — two 256-way levels per group, so even a 90%-of-corpus group
    * sorts only 1/65536 of its rows in the final window; the driver
    * histograms stay nGroups x 256.
    */
  def groupQuota(df: DataFrame, groupCol: String, idCol: String,
                 quota: Long): DataFrame = {
    val (buckets, order) = hashBuckets(idCol)
    thresholdSelect(df, buckets, order, lit(1L), quota, Seq(groupCol))
  }

  /** Token-budget curation: order rows by (`scoreCol` DESC, id ASC) —
    * scoreCol must already be rounded/quantized so both engines agree
    * on ties — and keep the best prefix whose `weightCol` (token
    * count) sum fits the budget. `lo`/`hi` bound the score range for
    * bucketization (score values outside are clamped).
    */
  def budgetSelectDesc(df: DataFrame, scoreCol: String, idCol: String,
                       weightCol: String, budget: Long,
                       lo: Double = 0.0, hi: Double = 1.0): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    thresholdSelectWith(df, descBuckets(scoreCol, lo, hi),
      Seq(col(scoreCol).desc, col(idCol)), col(weightCol))((_, _) => budget)
  }

  /** [[budgetSelectDesc]] with a DATA-DERIVED budget: keep the best
    * prefix holding `frac` of the TOTAL weight (e.g. "the
    * highest-quality 60% of corpus tokens"). The total comes from the
    * first histogram pass — no extra corpus scan.
    */
  def budgetSelectDescFraction(df: DataFrame, scoreCol: String,
                               idCol: String, weightCol: String,
                               frac: Double,
                               lo: Double = 0.0, hi: Double = 1.0): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, s"frac in [0,1], got $frac")
    thresholdSelectWith(df, descBuckets(scoreCol, lo, hi),
      Seq(col(scoreCol).desc, col(idCol)), col(weightCol))(
      (_, total) => math.floor(frac * total).toLong)
  }

  /** Two nested DESC quantizations (256-way then 65536-way): the finer
    * level's value is `parent*256 + child`, so it monotone-refines its
    * parent bucket exactly.
    */
  private def descBuckets(scoreCol: String, lo: Double,
                          hi: Double): Seq[Column] =
    Seq(descBucket(scoreCol, lo, hi, 1 << 8),
      descBucket(scoreCol, lo, hi, 1 << 16))

  private def descBucket(scoreCol: String, lo: Double, hi: Double,
                         nBuckets: Int): Column = {
    val span = hi - lo
    require(span > 0, "hi must exceed lo")
    // Monotone DESC mapping: higher score -> lower bucket. NULL scores
    // map to the LAST bucket: the order column `scoreCol DESC` sorts
    // NULLS LAST in both Spark and DuckDB, so the bucketization must
    // agree that a NULL score is worse than every non-null one — the
    // caller-side coalesce-to-0 default would instead route NULLs to
    // the best-quality bucket and break the window-form row identity
    // (the intra-bucket window resolves their relative order).
    val frac = (lit(hi) - least(greatest(col(scoreCol), lit(lo)), lit(hi))) / lit(span)
    coalesce(least(floor(frac * nBuckets), lit(nBuckets - 1)).cast("int"),
      lit(nBuckets - 1))
  }
}
