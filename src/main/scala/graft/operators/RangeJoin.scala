package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed (band) range join: pair rows of the same key whose numeric
  * "time" values lie within `delta` of each other. Spark has no native
  * range-join operator — a raw `|a.t - b.t| <= delta` predicate plans
  * as a per-key BroadcastNestedLoop (or worse, a cartesian), which is
  * O(n_k^2) comparisons per key and does not survive a 100x scale-up.
  *
  * Spark-first shape (the standard epsilon-join blocking): quantize
  * time into `delta`-wide buckets, replicate ONE side into its bucket
  * and both neighbors (3x, constant factor), and equi-join on
  * (key, bucket) before applying the exact |dt| <= delta filter. Any
  * qualifying pair is at most one bucket apart, and the probe side
  * keeps a single bucket per row, so every pair is found exactly once
  * — no post-join dedup. The plan is a shuffle equi-join (hash or
  * sort-merge, AQE's choice) instead of a nested loop: comparisons
  * drop from O(n_k^2) to O(sum over co-bucketed pairs), i.e.
  * proportional to the true temporal density, and both sides stream.
  *
  * Scale shape (100 TB): one shuffle per side on (key, bucket); skew
  * follows genuine temporal hot-spots (many rows of one key inside one
  * delta window), which AQE skew-join splitting handles because the
  * join is now an equi-join. `delta` controls the blocking granularity
  * directly — no tuning knob beyond the semantic parameter itself.
  */
object RangeJoin {

  /** Unordered within-`delta` pairs of distinct rows sharing `keyCol`,
    * emitted once each as (idCol x 2, key, gap): rows a, b with
    * `a.id < b.id` and `|a.t - b.t| <= delta`. `tsCol` must be numeric
    * (any unit; `delta` is in the same unit).
    */
  def selfWithin(df: DataFrame, keyCol: String, idCol: String,
                 tsCol: String, delta: Long): DataFrame = {
    require(delta > 0, s"need delta > 0, got $delta")
    val base = df.select(col(keyCol).as("_k_"), col(idCol).as("_id_"),
      col(tsCol).cast("long").as("_t_"))
    // floor-division in LONG arithmetic: floor(t / delta) via double
    // division silently mis-buckets once |t| exceeds 2^53 (epoch NANOS
    // are ~1.7e18 today). pmod is non-negative, so (t - pmod) is the
    // exact floor multiple for negative t too, and `div` is exact.
    val bucket = expr(s"(_t_ - pmod(_t_, ${delta}L)) div ${delta}L")
    // replicated side: a row can meet partners in its own bucket or
    // either neighbor; the probe side stays single-bucket so each
    // qualifying pair co-locates in exactly one (key, bucket) cell
    val a = base.withColumn("_b_",
      explode(array(bucket - 1, bucket, bucket + 1)))
    val b = base.withColumn("_b_", bucket)
      .withColumnRenamed("_id_", "_id2_").withColumnRenamed("_t_", "_t2_")
    a.join(b, Seq("_k_", "_b_"))
      .filter(col("_id_") < col("_id2_") &&
        abs(col("_t_") - col("_t2_")) <= delta)
      .select(col("_k_").as(keyCol),
        col("_id_").as(s"${idCol}_a"), col("_id2_").as(s"${idCol}_b"),
        abs(col("_t_") - col("_t2_")).as("gap"))
  }
}
