package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{VdbRecord, VdbStore}

/** Exhaustive routing audit of `VdbStore.queryDF`'s dispatch ladder
  * (VERDICT r18 next-round #8): the ladder is 12+ branches deep and was
  * previously pinned only point-wise. This spec sweeps the FULL
  * (q8, pq, bit, hnsw, ann, filtered, bloom, betterThan) lattice —
  * every reachable combination, not a random sample — asserting that
  * `lastQueryStrategy` matches an independently-written statement of
  * the documented precedence, and that every route fills k rows per
  * query on a covering corpus. The bulk filtered+q8 opt-in
  * (`graft.ann.filtered.bulkq8`, round 19) is swept as an extra axis on
  * the combos where it is reachable.
  *
  * Documented precedence (VdbStore scaladoc "strategy" section):
  *   hnsw-filtered[+q8][+bloom] > ann-filtered[+q8 opt-in][+bloom]
  *   > hnsw > ann+q8 > ann+pq > ann+bit > ann > q8 > pq > bit > exact;
  *   any betterThan threshold bypasses every accelerator (exact /
  *   exact-filtered), and filtered acceleration requires the
  *   `graft.ann.filtered` opt-in. All three membership sources —
  *   Column `where`, explicit `ids`, opaque `whereFn` — share
  *   resolveFilterMember, and since round 20 every filtered lattice
  *   point (including the bloom-rung cap) is swept under each source,
  *   not just `where` (VERDICT r19 next-round #5).
  */
class QueryDispatchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** The documented ladder, restated independently of the dispatch
    * code. `filtered`: 0 = none, 1 = where (allow-set rung), 2 = where
    * with both membership sets over the cap (bloom rung).
    */
  private def expectedStrategy(hnsw: Boolean, ann: Boolean, q8: Boolean,
      pq: Boolean, bit: Boolean, filtered: Int, better: Boolean,
      bulkQ8: Boolean): String = {
    val bloomSuffix = if (filtered == 2) "+bloom" else ""
    if (better) { if (filtered > 0) "exact-filtered" else "exact" }
    else if (filtered > 0 && hnsw)
      (if (q8) "hnsw-filtered+q8" else "hnsw-filtered") + bloomSuffix
    else if (filtered > 0 && ann)
      (if (q8 && bulkQ8) "ann-filtered+q8" else "ann-filtered") + bloomSuffix
    else if (filtered > 0) "exact-filtered"
    else if (hnsw) "hnsw"
    else if (ann) {
      if (q8) "ann+q8" else if (pq) "ann+pq" else if (bit) "ann+bit"
      else "ann"
    } else if (q8) "q8" else if (pq) "pq" else if (bit) "bit" else "exact"
  }

  test("queryDF dispatch lattice: every (q8,pq,bit,hnsw,ann,filtered,bloom,betterThan) combo routes per the documented precedence and fills k rows — under all three membership sources (where / ids / whereFn)") {
    val s = VdbStore.empty(spark, 8)
    s.upsert(TestFixtures.twoClusterRecs(seed = 71))
    import spark.implicits._
    val qdf = Seq(
      (0L, { val v = new Array[Float](8); v(0) = 1f; v }),
      (1L, { val v = new Array[Float](8); v(4) = 1f; v }))
      .toDF("qid", "qvec")
    // the three membership sources express the SAME 60-row "b" cluster
    // (VERDICT r19 next-round #5: ids and whereFn share
    // resolveFilterMember with Column filters, but their lattice points
    // — including the bloom-rung cap — were only point-pinned before;
    // now every filtered combo runs under each source)
    val whereB = get_json_object(col("meta"), "$.c") === "b"
    val bIds: Seq[String] = (0 until 60).map(i => f"b$i%03d")
    val fnB: (String, String) => Boolean = (id, _) => id.startsWith("b")
    val k = 3
    // filtered acceleration is always opted in for the sweep; the
    // opt-out collapse to exact-filtered is pinned separately below
    spark.conf.set("graft.ann.filtered", "true")
    var combos = 0
    try {
      for (hnsw <- Seq(false, true)) {
        if (hnsw) s.enableHnsw() else s.disableHnsw()
        for (ann <- Seq(false, true)) {
          if (ann) s.enableAnn(nList = 4) else s.disableAnn()
          for (q8 <- Seq(false, true)) {
            if (q8) s.enableQ8() else s.disableQ8()
            for (pq <- Seq(false, true)) {
              if (pq) s.enablePq() else s.disablePq()
              for (bit <- Seq(false, true)) {
                if (bit) s.enableBit() else s.disableBit()
                for {
                  better <- Seq(false, true)
                  filtered <- Seq(0, 1, 2)
                  src <- if (filtered == 0) Seq("none")
                         else Seq("where", "ids", "fn")
                  // the bulk q8 opt-in only reaches the ladder on the
                  // ann-filtered rung; sweep it there, pin default
                  // (false) everywhere else
                  bulkQ8 <- if (q8 && ann && !hnsw && filtered > 0 && !better)
                              Seq(false, true)
                            else Seq(false)
                } {
                  if (filtered == 2) spark.conf.set("graft.ann.filtered.max", "2")
                  else spark.conf.unset("graft.ann.filtered.max")
                  if (bulkQ8) spark.conf.set("graft.ann.filtered.bulkq8", "true")
                  else spark.conf.unset("graft.ann.filtered.bulkq8")
                  val want = expectedStrategy(hnsw, ann, q8, pq, bit,
                    filtered, better, bulkQ8)
                  val combo = s"hnsw=$hnsw ann=$ann q8=$q8 pq=$pq bit=$bit " +
                    s"filtered=$filtered src=$src better=$better bulkQ8=$bulkQ8"
                  val rows = s.queryDF(qdf, "qid", "qvec", k,
                      betterThan = if (better) Some(-1.0) else None,
                      where = if (src == "where") Some(whereB) else None,
                      ids = if (src == "ids") Some(bIds) else None,
                      whereFn = if (src == "fn") Some(fnB) else None)
                    .select("qid").collect().map(_.getLong(0))
                  assert(s.lastQueryStrategy == Some(want),
                    s"[$combo] routed ${s.lastQueryStrategy}, expected $want")
                  val perQ = rows.groupBy(identity).view.mapValues(_.length)
                  assert(Seq(0L, 1L).forall(q => perQ.getOrElse(q, 0) == k),
                    s"[$combo] route $want underfilled: $perQ (want $k per query)")
                  combos += 1
                }
              }
            }
          }
        }
      }
      // 2(hnsw) x 2(ann) x 2(q8) x 2(pq) x 2(bit) x 2(better) x
      // [1 (unfiltered) + 2(filtered) x 3(src)] = 32 x 2 x 7 = 448,
      // plus the bulkQ8=true twin on its 24 reachable combos
      // (4 pq/bit x 2 filtered x 3 src)
      assert(combos == 472, s"lattice coverage drifted: ran $combos combos")
      // opt-out pin: without graft.ann.filtered, a filtered query
      // bypasses every accelerator regardless of what is enabled
      spark.conf.unset("graft.ann.filtered")
      s.enableAnn(nList = 4); s.enableHnsw(); s.enableQ8()
      s.queryDF(qdf, "qid", "qvec", k, where = Some(whereB)).collect()
      assert(s.lastQueryStrategy == Some("exact-filtered"),
        s"opt-out collapse broken: ${s.lastQueryStrategy}")
    } finally {
      Seq("graft.ann.filtered", "graft.ann.filtered.max",
        "graft.ann.filtered.bulkq8").foreach(spark.conf.unset)
      s.disableQ8(); s.disablePq(); s.disableBit()
      s.disableHnsw(); s.disableAnn()
    }
  }

  test("betterThan pruning slice (round 21, VERDICT r20 next-round #7): a threshold that actually prunes routes exact / exact-filtered AND returns exactly the independently-computed thresholded hit set, under every membership source") {
    // The 472-combo sweep above pins ROUTING with betterThan = -1.0
    // (filters nothing). This slice re-runs the better=true rung at a
    // threshold that genuinely prunes on the two-cluster fixture
    // (cross-cluster cosine ~0, in-cluster ~1, thr = 0.3 sits >0.25
    // from both), asserting result parity against a driver-side
    // restatement of the documented semantics: admit score >= thr,
    // then top-k (BlockStore.scoreBlock; reference pico_vdb.py:745
    // skips score < better_than). k exceeds the cluster size so the
    // hit SET is exactly the thresholded member set — no float-tie
    // ambiguity at a top-k boundary.
    val s = VdbStore.empty(spark, 8)
    val recs = TestFixtures.twoClusterRecs(seed = 71)
    s.upsert(recs)
    import spark.implicits._
    val q0 = { val v = new Array[Float](8); v(0) = 1f; v }
    val q1 = { val v = new Array[Float](8); v(4) = 1f; v }
    val qdf = Seq((0L, q0), (1L, q1)).toDF("qid", "qvec")
    val whereB = get_json_object(col("meta"), "$.c") === "b"
    val bIds: Seq[String] = (0 until 60).map(i => f"b$i%03d")
    val fnB: (String, String) => Boolean = (id, _) => id.startsWith("b")
    val k = 100
    val thr = 0.3
    def scoreOf(q: Array[Float], v: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < q.length) { s += q(i).toDouble * v(i).toDouble; i += 1 }
      s
    }
    def truthSet(q: Array[Float], member: String => Boolean): Set[String] =
      recs.filter(r => member(r.id))
        .filter(r => scoreOf(q, r.vector) >= thr).map(_.id).toSet
    spark.conf.set("graft.ann.filtered", "true")
    try {
      for (accel <- Seq(false, true)) {
        // the bypass must hold whether or not accelerators are enabled
        if (accel) { s.enableHnsw(); s.enableAnn(nList = 4); s.enableQ8() }
        else { s.disableHnsw(); s.disableAnn(); s.disableQ8() }
        for (src <- Seq("none", "where", "ids", "fn")) {
          val member: String => Boolean =
            if (src == "none") _ => true else _.startsWith("b")
          val got = s.queryDF(qdf, "qid", "qvec", k,
              betterThan = Some(thr),
              where = if (src == "where") Some(whereB) else None,
              ids = if (src == "ids") Some(bIds) else None,
              whereFn = if (src == "fn") Some(fnB) else None)
            .select("qid", "_id_").collect()
            .groupBy(_.getLong(0)).view
            .mapValues(_.map(_.getString(1)).toSet).toMap
          val want = if (src == "none") "exact" else "exact-filtered"
          assert(s.lastQueryStrategy == Some(want),
            s"[accel=$accel src=$src] routed ${s.lastQueryStrategy}")
          Seq(0L -> q0, 1L -> q1).foreach { case (qid, q) =>
            val expect = truthSet(q, member)
            assert(got.getOrElse(qid, Set.empty) == expect,
              s"[accel=$accel src=$src qid=$qid] hit set != exact-filtered " +
                s"ground truth (got ${got.getOrElse(qid, Set.empty).size}, " +
                s"want ${expect.size})")
          }
          // the slice must PRUNE: q0 scores ~0 against cluster b, so
          // the filtered rung returns nothing for it, and the
          // unfiltered rung drops the opposite cluster entirely
          if (src != "none") assert(truthSet(q0, member).isEmpty)
          else assert(truthSet(q0, member) == recs.map(_.id)
            .filter(_.startsWith("a")).toSet)
        }
      }
    } finally {
      spark.conf.unset("graft.ann.filtered")
      s.disableQ8(); s.disableHnsw(); s.disableAnn()
    }
  }

  test("auto-tier budget boundaries (round 20): tier choice pinned at every substrate boundary ±1 byte, and the catalog's store-sized budget formulas sit on stable rungs") {
    import graft.core.PqStore
    // The pure decision (VdbStore.autoTier) swept at each boundary and
    // one byte to either side (VERDICT r19 next-round #6: the r17 clean
    // pass recorded q91/q92 `requirement failed` flaps at tier
    // boundaries; r18 moved the catalog to store-sized budgets — this
    // table keeps the contract from re-flapping silently). Shapes cover
    // dim % 8 == 0 (autoM = dim/8), dim % 4 == 0 only (autoM = dim/4),
    // and dim % 4 != 0 (PQ unreachable — bit is the only rung below q8).
    val shapes = Seq((500L, 64), (2000L, 64), (100000L, 1024),
      (50L, 12), (123L, 48), (77L, 10), (9L, 7))
    for ((rows, dim) <- shapes) {
      val d = dim.toLong
      val fp32B = rows * d * 4L
      val q8B = rows * d
      def tier(b: Long) = graft.core.VdbStore.autoTier(rows, dim, b)
      assert(tier(fp32B) == "exact", s"($rows x $dim) at the fp32 boundary")
      assert(tier(fp32B - 1) == "q8", s"($rows x $dim) 1 B under fp32")
      assert(tier(q8B) == "q8", s"($rows x $dim) at the int8 boundary")
      if (dim % 4 == 0) {
        val pqB = rows * PqStore.autoM(dim).toLong
        assert(pqB < q8B, s"autoM must compress below int8 ($rows x $dim)")
        assert(tier(q8B - 1) == "pq", s"($rows x $dim) 1 B under int8")
        assert(tier(pqB) == "pq", s"($rows x $dim) at the PQ boundary")
        assert(tier(pqB - 1) == "bit", s"($rows x $dim) 1 B under PQ")
      } else {
        // PQ can't split this geometry: q8 falls straight to bit
        assert(tier(q8B - 1) == "bit", s"($rows x $dim) 1 B under int8 (no PQ)")
      }
      assert(tier(0L) == "bit", s"($rows x $dim) at zero budget")
    }
    // The catalog's q91-q93 budget formulas (Queries.vdbAutoTopk,
    // headroom 0.5 -> budget = memBytes/2), at BOTH verify-time store
    // shapes (sf0.01: 500 embeddings, sf0.1: 2000) — each lands
    // strictly inside (or on the stable <= edge of) its intended rung:
    for ((rows, dim) <- Seq((500L, 64), (2000L, 64))) {
      val m = PqStore.autoM(dim).toLong
      def tier(b: Long) = graft.core.VdbStore.autoTier(rows, dim, b)
      assert(tier(2L * rows * dim / 2) == "q8", s"q91 formula ($rows x $dim)")
      assert(tier(rows * dim.toLong / 2) == "pq", s"q92 formula ($rows x $dim)")
      assert(tier(rows * m / 2) == "bit", s"q93 formula ($rows x $dim)")
    }
  }
}
