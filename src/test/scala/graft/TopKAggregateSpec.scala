package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.top_k_hits

/** The TypedImperativeAggregate top-k (SURVEY §4.3 item 3) must rank
  * identically to the row_number Window plan it replaces — score desc,
  * id asc — while moving only k rows per group through the shuffle.
  */
class TopKAggregateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("top_k_hits equals the Window row_number plan (long ids, ties included)") {
    val rng = new scala.util.Random(31)
    val rows = for {
      q <- 0 until 7
      i <- 0 until 200
    } yield (q.toLong, i.toLong, math.round(rng.nextDouble() * 20) / 20.0) // forced ties
    val df = rows.toDF("qid", "id", "score")

    val agg = df.groupBy($"qid")
      .agg(top_k_hits($"score", $"id", 10).as("hits"))
      .select($"qid", posexplode($"hits"))
      .select($"qid", ($"pos" + 1).cast("long").as("rank"),
        $"col.id".as("id"), $"col.score".as("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

    val w = Window.partitionBy($"qid").orderBy($"score".desc, $"id".asc)
    val win = df.withColumn("rank", row_number().over(w)).filter($"rank" <= 10)
      .select($"qid", $"rank".cast("long"), $"id", $"score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

    assert(agg == win)
  }

  test("top_k_hits with string ids and a pre-filter composes in one aggregation") {
    val df = Seq(
      (1L, "a", 0.9), (1L, "b", 0.9), (1L, "c", 0.1), (1L, "d", 0.95),
      (2L, "x", 0.5), (2L, "y", 0.6)).toDF("qid", "id", "score")
    val out = df.filter($"score" > 0.2)
      .groupBy($"qid").agg(top_k_hits($"score", $"id", 2).as("hits"))
      .select($"qid", $"hits.id".as("ids")).as[(Long, Seq[String])]
      .collect().toMap
    assert(out(1L) == Seq("d", "a")) // 0.95, then the a/b tie breaks to "a"
    assert(out(2L) == Seq("y", "x"))
  }

  test("partial heaps keep the shuffle at k rows per group (plan shape)") {
    val df = spark.range(0, 10000).select(
      (col("id") % 4).as("qid"), col("id").as("id"),
      (col("id") % 97).cast("double").as("score"))
    val plan = df.groupBy("qid").agg(top_k_hits(col("score"), col("id"), 5).as("h"))
      .queryExecution.executedPlan.toString
    // partial aggregation (ObjectHashAggregate/SortAggregate partial pass)
    // must appear below the exchange
    assert(plan.contains("top_k_hits"))
    assert(plan.contains("partial_top_k_hits") ||
      "(ObjectHashAggregate|SortAggregate)".r.findAllIn(plan).size >= 2,
      s"no partial aggregate in:\n$plan")
  }
}
