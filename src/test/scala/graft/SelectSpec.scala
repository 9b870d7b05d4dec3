package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Select

/** Threshold selection (q69/q70/q72 machinery): the histogram +
  * boundary-bucket path must be ROW-IDENTICAL to the global-window
  * form it replaces, across boundary placements, zero-weight rows,
  * and degenerate budgets.
  */
class SelectSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Brute-force reference: SUM(w) OVER (ORDER BY h, id) <= budget. */
  private def windowSelect(df: DataFrame, budget: Long): Set[Long] = {
    val w = Window.orderBy(
        md5(col("id").cast("string").cast("binary")), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(col("w")).over(w))
      .filter(col("_cum") <= budget)
      .collect().map(_.getAs[Long]("id")).toSet
  }

  private def hashSelect(df: DataFrame, budget: Long): Set[Long] = {
    val (bucket, order) = Select.hashOrder("id", nHexChars = 2)
    Select.thresholdSelect(df, bucket, order, col("w"), budget)
      .collect().map(_.getAs[Long]("id")).toSet
  }

  test("thresholdSelect equals the global window at every budget sweep point") {
    import spark.implicits._
    val df = (0L until 300L).map(i => (i, 1L + i % 7)).toDF("id", "w").cache()
    val total = df.agg(sum("w")).first().getLong(0)
    for (budget <- Seq(0L, 1L, 17L, total / 3, total / 2, total - 1, total, total + 50)) {
      assert(hashSelect(df, budget) == windowSelect(df, budget),
        s"mismatch at budget=$budget")
    }
  }

  test("zero-weight rows at the boundary are kept, matching the window") {
    import spark.implicits._
    // every other row weighs 0 — the window keeps 0-weight rows whose
    // running sum (incl. themselves) is exactly at the budget
    val df = (0L until 200L).map(i => (i, if (i % 2 == 0) 0L else 3L))
      .toDF("id", "w").cache()
    for (budget <- Seq(0L, 3L, 30L, 31L, 90L))
      assert(hashSelect(df, budget) == windowSelect(df, budget),
        s"mismatch at budget=$budget")
  }

  test("exactSampleN returns exactly n rows, the window-prefix ones") {
    import spark.implicits._
    val df = (0L until 250L).map(i => (i, s"s${i % 3}")).toDF("id", "source")
    val got = Select.exactSampleN(df, "id", 41L)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(got.size == 41)
    val want = windowSelect(df.withColumn("w", lit(1L)), 41L)
    assert(got == want)
  }

  test("exactSampleN with n >= count keeps everything") {
    import spark.implicits._
    val df = (0L until 30L).map(i => (i, "x")).toDF("id", "source")
    assert(Select.exactSampleN(df, "id", 1000L).count() == 30)
  }

  test("groupQuota matches per-group row_number and survives a skewed group") {
    import spark.implicits._
    // group "big" has 90% of the rows — the skew case the per-group
    // histogram exists for
    val df = (0L until 400L)
      .map(i => (i, if (i % 10 == 0) s"g${i % 3}" else "big"))
      .toDF("id", "g").cache()
    val got = Select.groupQuota(df, "g", "id", 25L)
      .select("g", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val w = Window.partitionBy(col("g")).orderBy(
      md5(col("id").cast("string").cast("binary")), col("id"))
    val want = df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= 25)
      .select("g", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want)
    // small groups (<= 25 members) keep all rows; big group exactly 25
    assert(got.count(_._1 == "big") == 25)
  }

  test("NULL group keys form a real partition, matching PARTITION BY") {
    import spark.implicits._
    val df = (0L until 120L)
      .map(i => (i, if (i % 4 == 0) null else s"g${i % 3}"))
      .toDF("id", "g").cache()
    val got = Select.groupQuota(df, "g", "id", 10L)
      .select("g", "id").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    val w = Window.partitionBy(col("g")).orderBy(
      md5(col("id").cast("string").cast("binary")), col("id"))
    val want = df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= 10)
      .select("g", "id").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    assert(got == want)
    assert(got.count(_._1.isEmpty) == 10) // the NULL group fills its quota
  }

  test("NULL sort keys coalesce to the earliest bucket (Spark NULLS FIRST)") {
    import spark.implicits._
    // ids 0..49 plus 5 null-id rows; window form: NULLS FIRST means
    // the null rows are the first prefix
    val df = ((0L until 50L).map(i => (Some(i), 1L)) ++
        Seq.fill(5)((Option.empty[Long], 1L)))
      .toDF("id", "w").cache()
    val (bucket, order) = Select.hashOrder("id", nHexChars = 2)
    val got = Select.thresholdSelect(df, bucket, order, col("w"), 3L)
      .collect().map(r => Option(r.get(0)))
    // budget 3 < 5 null rows: everything kept is a null-id row
    assert(got.length == 3 && got.forall(_.isEmpty))
  }

  test("budgetSelectDescFraction equals the fixed-budget form at the same total") {
    import spark.implicits._
    val df = (0L until 150L).map(i => (i, (i % 9).toDouble / 10.0, 1L + i % 4))
      .toDF("id", "q", "w").cache()
    val total = df.agg(sum("w")).first().getLong(0)
    val fixed = Select.budgetSelectDesc(df, "q", "id", "w",
        math.floor(0.6 * total).toLong)
      .collect().map(_.getAs[Long]("id")).toSet
    val frac = Select.budgetSelectDescFraction(df, "q", "id", "w", 0.6)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(fixed == frac)
  }

  test("thresholdSelect equals the window on random corpora (seeded trials)") {
    import spark.implicits._
    val rng = new scala.util.Random(271828)
    for (trial <- 1 to 4) {
      val n = 50 + rng.nextInt(300)
      // random weights including zeros, random group fan-out
      val rows = (0L until n.toLong).map { i =>
        (i, rng.nextInt(5).toLong, s"g${rng.nextInt(1 + rng.nextInt(4))}")
      }
      val df = rows.toDF("id", "w", "g").cache()
      val total = rows.map(_._2).sum
      val budget = (rng.nextDouble() * total * 1.2).toLong
      assert(hashSelect(df, budget) == windowSelect(df, budget),
        s"trial $trial ungrouped, budget=$budget")
      val quota = 1L + rng.nextInt(40)
      val got = Select.groupQuota(df, "g", "id", quota)
        .select("g", "id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      val w = Window.partitionBy(col("g")).orderBy(
        md5(col("id").cast("string").cast("binary")), col("id"))
      val want = df.withColumn("_rk", row_number().over(w))
        .filter(col("_rk") <= quota)
        .select("g", "id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == want, s"trial $trial grouped, quota=$quota")
      df.unpersist()
    }
  }

  test("budgetSelectDesc: NULL scores sort last, matching the window's NULLS LAST (ADVICE r12)") {
    import spark.implicits._
    // 40 scored rows + 6 NULL-score rows: `q DESC` sorts NULLS LAST in
    // both Spark and DuckDB, so the threshold path must route NULL
    // scores to the WORST bucket (selected only after every scored
    // row), not coalesce them into the best one.
    val df = ((0L until 40L).map(i => (i, Some((i % 8).toDouble / 10.0), 3L)) ++
        (100L until 106L).map(i => (i, Option.empty[Double], 3L)))
      .toDF("id", "q", "w").cache()
    val win = Window.orderBy(col("q").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    for (budget <- Seq(30L, 90L, 120L, 126L, 138L)) {
      val got = Select.budgetSelectDesc(df, "q", "id", "w", budget)
        .collect().map(_.getAs[Long]("id")).toSet
      val want = df.withColumn("_cum", sum(col("w")).over(win))
        .filter(col("_cum") <= budget)
        .collect().map(_.getAs[Long]("id")).toSet
      assert(got == want, s"budget=$budget")
    }
    df.unpersist()
  }

  test("budgetSelectDesc keeps the best-quality prefix with exact tie order") {
    import spark.implicits._
    // deliberately heavy ties in the score column
    val df = (0L until 120L).map(i => (i, (i % 5).toDouble / 10.0, 2L + i % 3))
      .toDF("id", "q", "w").cache()
    val budget = 60L
    val got = Select.budgetSelectDesc(df, "q", "id", "w", budget)
      .collect().map(_.getAs[Long]("id")).toSet
    val win = Window.orderBy(col("q").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("_cum", sum(col("w")).over(win))
      .filter(col("_cum") <= budget)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(got == want)
  }
}
