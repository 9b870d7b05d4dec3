package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Catalog invariants the driver's correctness gate depends on. */
class CatalogSpec extends AnyFunSuite {

  test("every catalog query has a DuckDB oracle — for q26/q46/q55/q76/q78 the SQL verifies the ARTIFACT SHAPE, the recall invariant is the in-entry assert") {
    // Honest scope of the five approximate-recall oracles (ADVICE r19):
    // ANN hit sets are approximate, so no SQL over the source tables can
    // reproduce them — these entries emit a checked per-query artifact
    // (qid, n_hits, recall_floor_met) whose SHAPE the SQL oracle
    // verifies (one row per query, exactly k hits, verdict literal).
    // The recall invariant itself is enforced by the in-entry
    // assertRecallFloor against the in-engine exact twin, which THROWS
    // (reddening the correctness row) before a floor-violating run can
    // produce the shape SQL expects. A measured per-query recall value
    // cannot ride the artifact: the driver compares by hash equality,
    // and SQL cannot predict a data-dependent recall — the boolean is
    // the strongest SQL-checkable encoding of "the assert passed". The
    // machinery behind each entry stays independently bit-oracled
    // (q47-q49, q56, q75/q77, q79).
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
