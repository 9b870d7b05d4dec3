package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: attach to each left row the most recent right
  * row of the same key whose time is <= the left row's time (classic
  * point-in-time / attribution join; absent from both the reference —
  * picovdb has no event surface — and from Spark's built-in operator
  * set, which plans a time-inequality join as a BroadcastNestedLoop).
  *
  * Spark-first shape: instead of a range join (candidate explosion:
  * every left row pairs with ALL earlier right rows before the window
  * prunes to one), tag both inputs, UNION them, and run one
  * carry-forward window per key — `last(rightPayload, ignoreNulls)`
  * over rows ordered by (time, side, tieBreak). Each right row is
  * touched once; the physical plan is a single Exchange on the key +
  * one Sort, i.e. exactly the distributed merge that a native as-of
  * operator (DuckDB `ASOF JOIN`, pandas `merge_asof`) performs, with
  * no intermediate pair blow-up.
  *
  * Determinism: at equal times the right row sorts before the left row
  * (side 0 < 1, so `<=` is inclusive), and right rows tied on time are
  * resolved by `tieBreak` ascending — the LAST (max tieBreak) wins,
  * matching an `ORDER BY t DESC, tieBreak DESC ... rn = 1` oracle.
  *
  * Scale shape (100 TB): one hash shuffle on the key, per-key
  * sequential scans, zero driver traffic. Parallelism follows key
  * cardinality; a single hot key serializes its own partition, which
  * is inherent to order-sensitive semantics, not to this plan. No
  * state beyond the sort buffer; AQE is free to coalesce or split the
  * post-shuffle partitions.
  */
object AsOfJoin {

  /** Left rows (columns `leftCols`) plus the matched right payload
    * columns (null when the key has no right row at or before the left
    * time, or none within `tolerance`). Time columns must be numeric
    * (any unit — the catalog uses epoch µs); `tieBreak` is a
    * right-side column ordering equal-time rights deterministically.
    * `tolerance` (same unit as time) nulls out matches further than
    * that from the left row — pandas `merge_asof(tolerance=...)`.
    */
  def backward(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               leftCols: Seq[String], rightPayload: Seq[String],
               tieBreak: String, tolerance: Option[Long] = None): DataFrame =
    asof(left, right, leftKey, rightKey, leftTime, rightTime,
      leftCols, rightPayload, tieBreak, tolerance, forward = false)

  /** Forward as-of join: the EARLIEST right row at or after each left
    * row's time (ties by MIN tieBreak) — `merge_asof
    * (direction='forward')`. Same single-Exchange carry-forward plan,
    * running over time reversed.
    */
  def forward(left: DataFrame, right: DataFrame,
              leftKey: String, rightKey: String,
              leftTime: String, rightTime: String,
              leftCols: Seq[String], rightPayload: Seq[String],
              tieBreak: String, tolerance: Option[Long] = None): DataFrame =
    asof(left, right, leftKey, rightKey, leftTime, rightTime,
      leftCols, rightPayload, tieBreak, tolerance, forward = true)

  private def asof(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTime: String, rightTime: String,
                   leftCols: Seq[String], rightPayload: Seq[String],
                   tieBreak: String, tolerance: Option[Long],
                   forward: Boolean): DataFrame = {
    val scratch = Seq("_k_", "_t_", "_side_", "_tb_", "_l_", "_r_", "_m_", "_mt_")
    scratch.foreach { c =>
      require(!leftCols.exists(_.equalsIgnoreCase(c)) &&
        !rightPayload.exists(_.equalsIgnoreCase(c)),
        s"'$c' collides with an as-of scratch column; rename it first")
    }
    require(right.columns.contains(tieBreak),
      s"tieBreak '$tieBreak' must be a right-side column")
    val overlap = leftCols.map(_.toLowerCase).toSet
      .intersect(rightPayload.map(_.toLowerCase).toSet)
    require(overlap.isEmpty,
      s"leftCols and rightPayload share names $overlap — alias one side first")
    // up-front type checks: the carry-forward sort, the tolerance
    // subtraction, and the forward negation all need plain numerics —
    // failing here beats an opaque analysis error deep in the plan
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, NumericType, ShortType}
    Seq(leftTime -> left, rightTime -> right).foreach { case (c, side) =>
      val dt = side.schema(side.schema.fieldIndex(c)).dataType
      require(dt.isInstanceOf[NumericType],
        s"as-of time column '$c' must be numeric (epoch micros/nanos), got $dt")
    }
    val tbType = right.schema(right.schema.fieldIndex(tieBreak)).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(tbType),
      s"tieBreak '$tieBreak' must be an integral column (it is compared " +
        s"as a long), got $tbType")

    import org.apache.spark.sql.types.StructType
    val lType = StructType(leftCols.map(c => left.schema(left.schema.fieldIndex(c))))
    val rType = StructType(rightPayload.map(c => right.schema(right.schema.fieldIndex(c))))
    // A null _r_ on left-tagged rows is what ignoreNulls skips; the
    // explicit null casts pin the struct types so the union sides agree.
    val rSide = right.select(
      col(rightKey).as("_k_"), col(rightTime).as("_t_"),
      lit(0).as("_side_"), col(tieBreak).cast("long").as("_tb_"),
      lit(null).cast(lType).as("_l_"),
      struct(rightPayload.map(col): _*).as("_r_"))
    val lSide = left.select(
      col(leftKey).as("_k_"), col(leftTime).as("_t_"),
      lit(1).as("_side_"), lit(Long.MaxValue).as("_tb_"),
      struct(leftCols.map(col): _*).as("_l_"),
      lit(null).cast(rType).as("_r_"))

    // forward = backward over reversed time; tie direction flips too
    // (forward picks the EARLIEST qualifying right, MIN tieBreak), so
    // negate both sort keys rather than flipping the frame. Right rows
    // still sort before left at equal time, keeping the match inclusive.
    val timeKey = if (forward) negate(col("_t_")) else col("_t_")
    val tieKey = if (forward) negate(col("_tb_")) else col("_tb_")
    val w = Window.partitionBy(col("_k_"))
      .orderBy(timeKey, col("_side_"), tieKey)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = rSide.unionByName(lSide)
      .withColumn("_m_", last(col("_r_"), ignoreNulls = true).over(w))
      .withColumn("_mt_",
        last(when(col("_side_") === 0, col("_t_")), ignoreNulls = true).over(w))
      .filter(col("_side_") === 1)
    val keep = tolerance match {
      case Some(tol) =>
        require(tol >= 0, s"need tolerance >= 0, got $tol")
        col("_mt_").isNotNull && abs(col("_t_") - col("_mt_")) <= tol
      case None => col("_m_").isNotNull
    }
    val payload = when(keep, col("_m_"))
    matched.select(
      leftCols.map(c => col(s"_l_.$c").as(c)) ++
        rightPayload.map(c => payload.getField(c).as(c)): _*)
  }
}
