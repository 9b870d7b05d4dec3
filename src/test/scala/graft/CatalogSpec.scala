package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog invariants the driver's correctness gate depends on. */
class CatalogSpec extends AnyFunSuite {

  test("every catalog query has a DuckDB oracle (q26/q46 ANN exempt by design)") {
    // the two ANN entries are approximate by design (no SQL oracle);
    // q46 ≡ q26 bit-for-bit via the searchDs parity spec
    val noOracle = Queries.all.keySet -- Oracles.all.keySet
    assert(noOracle == Set("q26_ann_ivf", "q46_ann_ivf_ds"),
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
