package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: the classic event-pipeline operator that
  * groups a user's time-ordered events into sessions, cutting a new
  * session whenever the gap to the previous event exceeds `gap` (in
  * `tsCol`'s own units — the operator is unit-agnostic).
  * (Absent from the reference — picovdb has no event surface — this is
  * part of the training-data/event-pipeline family alongside q24's
  * tumbling windows; the streaming analog of the same semantics is
  * Structured Streaming's `session_window`, which cannot be oracled
  * batch-side, so the batch formulation here is the catalog entry.)
  *
  * Semantics (deterministic, engine-reproducible): events are ordered
  * per key by (tsCol, tieCol); event i starts a new session iff it is
  * the key's first event or `ts_i - ts_{i-1} > gap`; `session_seq`
  * is the 1-based running count of session starts. Both window passes
  * share one partitioning and one sort, so the physical plan is a
  * single Exchange + Sort feeding two WindowExecs.
  *
  * Scale shape (100 TB): one shuffle on the session key, then per-key
  * sequential scans — the minimum any order-sensitive sessionizer can
  * do. Parallelism follows key cardinality (user_id-grade keys give
  * millions of independent partitions); there is no global sort and no
  * driver traffic. A skewed single key is inherent to the semantics
  * (its events must be seen in order), not to this implementation.
  */
object Sessionize {

  /** Per-event session labels: input columns plus `session_seq` (1-based
    * per-key session index). `tsCol` is any monotone numeric column —
    * the testdata events carry raw epoch nanos (TESTDATA.md,
    * `spark.sql.legacy.parquet.nanosAsLong`).
    */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String, gap: Long): DataFrame = {
    require(gap > 0, s"need gap > 0, got $gap")
    // the output column and the two scratch columns must not silently
    // clobber caller data (resolver is case-insensitive by default)
    Seq("session_seq", "_prev_ts_", "_new_s_").foreach { c =>
      require(!events.columns.exists(_.equalsIgnoreCase(c)),
        s"input already has a '$c' column; rename it before sessionize")
    }
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("_prev_ts_", lag(col(tsCol), 1).over(w))
      .withColumn("_new_s_",
        when(col("_prev_ts_").isNull ||
          (col(tsCol) - col("_prev_ts_")) > gap, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("_new_s_")).over(run))
      .drop("_prev_ts_", "_new_s_")
  }

  /** Per-session rollup: (key, session_seq, n_events, start_ts, end_ts,
    * sum of `valueCol` rounded to 4 dp). One extra hash aggregation on
    * (key, session_seq) — partial map-side combine applies, and the
    * input is already partitioned by key so AQE can skip the exchange.
    */
  def sessionStats(events: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String, valueCol: String,
                   gap: Long): DataFrame =
    sessionize(events, keyCol, tsCol, tieCol, gap)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"),
        round(sum(col(valueCol)), 4).as("sum_value"))
}
