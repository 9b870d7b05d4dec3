package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, RangeJoin}

/** Scale evidence for the round-12 join operators (q60/q61): N events
  * (default 5M, SPARK_GRAFT_SMOKE_N to override) across 100k users in
  * a 30-day window, plus a deliberately skewed variant where ONE user
  * owns 10% of all events — the case a naive per-key nested loop dies
  * on (0.5M^2 = 2.5e11 comparisons for that key alone) and the
  * (key, time-bucket) blocking is supposed to spread across buckets.
  * Run by hand; prints one line per phase; numbers land in SCALING.md.
  */
object JoinScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[24]")
      .config("spark.sql.shuffle.partitions", "96")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = sys.env.get("SPARK_GRAFT_SMOKE_N").map(_.toInt).getOrElse(5000000)
    val spanUs = 30L * 86400 * 1000000 // 30 days
    val nUsers = 100000

    def gen(skewed: Boolean) = spark.range(0, n, 1, 96).select(
      col("id").as("event_id"),
      (if (skewed)
        when(pmod(hash(col("id")), lit(10)) === 0, lit(7L)) // user 7: ~10%
          .otherwise(pmod(hash(col("id"), lit(1)), lit(nUsers)).cast("long"))
      else pmod(hash(col("id"), lit(1)), lit(nUsers)).cast("long")
        ).as("user_id"),
      pmod(hash(col("id"), lit(2)).cast("long") * 1048573L, lit(spanUs)).as("us"),
      pmod(hash(col("id"), lit(3)), lit(5)).as("etype"))

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val out = f
      println(f"SMOKE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($out)")
    }

    for ((label, skewed) <- Seq(("uniform", false), ("skew10pct", true))) {
      val ev = gen(skewed).persist()
      ev.count()
      val purchases = ev.filter(col("etype") === 0)
        .select(col("event_id"), col("user_id"), col("us"))
      val clicks = ev.filter(col("etype") === 1)
        .select(col("event_id").as("click_id"), col("user_id"),
          col("us").as("click_us"))
      timed(s"asof $label ${n / 1000000}M") {
        AsOfJoin.backward(purchases, clicks, "user_id", "user_id",
            "us", "click_us", Seq("event_id", "user_id", "us"),
            Seq("click_id", "click_us"), "click_id")
          .filter(col("click_id").isNotNull).count()
      }
      timed(s"range $label ${n / 1000000}M d=1h") {
        RangeJoin.selfWithin(ev, "user_id", "event_id", "us",
          delta = 3600L * 1000000).count()
      }
      ev.unpersist()
    }
    spark.stop()
  }
}
