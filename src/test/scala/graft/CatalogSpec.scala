package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Catalog invariants the driver's correctness gate depends on. */
class CatalogSpec extends AnyFunSuite {

  test("every catalog query has a DuckDB oracle (round 19: no exemptions left)") {
    // the five approximate-recall entries (q26/q46/q55/q76/q78) were the
    // last exemptions; since round 19 they emit a checked per-query
    // artifact — (qid, n_hits, recall_floor_met), gated by an in-engine
    // recall-floor assert against the exact twin — that the SQL oracle
    // verifies (VERDICT r18 next-round #4)
    val noOracle = Queries.all.keySet -- Oracles.all.keySet
    assert(noOracle.isEmpty, s"missing oracles: $noOracle")
    val orphans = Oracles.all.keySet -- Queries.all.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("SparkEntry exposes the full catalog") {
    assert(SparkEntry.queries eq Queries.all)
    assert(SparkEntry.oracleSql eq Oracles.all)
    assert(Queries.all.size >= 30)
  }

  test("q24/q53 are robust to both events.ts encodings (long nanos vs timestamp)") {
    // The testdata generator has written events.ts both as parquet NANOS
    // (read as BIGINT under nanosAsLong) and as timestamp[us]
    // (TIMESTAMP_NTZ). The catalog entries must bucket identically on
    // either encoding — round 11 broke when the encoding flipped.
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = java.time.LocalDateTime.of(2024, 1, 15, 10, 0, 0)
    val rows = Seq( // (user, minutesOffset, event_id, type, value)
      (1L, 0L, 100L, "click", 1.0), (1L, 10L, 101L, "click", 2.0),
      (1L, 50L, 102L, "view", 4.0), (2L, 65L, 200L, "view", 8.0))
    val tsRows = rows.map { case (u, m, e, ty, v) =>
      (e, base.plusMinutes(m.toInt), u, ty, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val epochUs = base.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    val longRows = rows.map { case (u, m, e, ty, v) =>
      (e, (epochUs + m * 60000000L) * 1000L, u, ty, v) // nanos as long
    }.toDF("event_id", "ts", "user_id", "event_type", "value")

    def runBoth(dfTs: org.apache.spark.sql.DataFrame,
                dfLong: org.apache.spark.sql.DataFrame,
                q: (SparkSession, String) => org.apache.spark.sql.DataFrame)
      : (Set[String], Set[String]) = {
      def dump(df: org.apache.spark.sql.DataFrame): String = {
        val dir = java.nio.file.Files.createTempDirectory("cat24").toString
        df.write.mode("overwrite").parquet(s"$dir/events.parquet")
        dir
      }
      def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
        df.collect().map(_.toSeq.mkString("|")).toSet
      (canon(q(spark, dump(dfTs))), canon(q(spark, dump(dfLong))))
    }
    val (a24, b24) = runBoth(tsRows, longRows, Queries.eventWindows)
    assert(a24 == b24 && a24.nonEmpty, s"q24 mismatch: $a24 vs $b24")
    val (a53, b53) = runBoth(tsRows, longRows, Queries.sessionizeEvents)
    assert(a53 == b53 && a53.nonEmpty, s"q53 mismatch: $a53 vs $b53")
    // sanity: the 40-min gap splits user 1 into two sessions -> 3 sessions total
    assert(a53.size == 3)
  }
}
