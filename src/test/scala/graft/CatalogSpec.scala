package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog invariants the driver's correctness gate depends on. */
class CatalogSpec extends AnyFunSuite {

  test("every catalog query has a DuckDB oracle (q26/q46/q55 approx exempt by design)") {
    // the approximate entries carry self-asserted recall floors instead
    // of a SQL oracle: q46 ≡ q26 bit-for-bit via the searchDs parity
    // spec, and q55's machinery is oracled at exact-parity via q56
    val noOracle = Queries.all.keySet -- Oracles.all.keySet
    assert(noOracle == Set("q26_ann_ivf", "q46_ann_ivf_ds", "q55_q8_ann"),
      s"missing oracles: $noOracle")
    val orphans = Oracles.all.keySet -- Queries.all.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("SparkEntry exposes the full catalog") {
    assert(SparkEntry.queries eq Queries.all)
    assert(SparkEntry.oracleSql eq Oracles.all)
    assert(Queries.all.size >= 30)
  }
}
