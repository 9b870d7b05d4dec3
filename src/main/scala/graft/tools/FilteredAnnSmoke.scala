package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel
import graft.core.{BlockStore, SetMember}
import graft.operators.CosineTopK

/** Round-16 evidence pass for the filtered-ANN scale claim
  * (SCALING.md "Filtered ANN"): the exact filtered path re-packs every
  * matching row PER QUERY CALL, the filtered-ANN path reuses the
  * cached bucket pack and broadcasts a membership set — at bench scale
  * (100k rows) the pack is cheap and the two look close, so this smoke
  * measures both at N x 256-d where the repack term is visible.
  * Default 1M; SPARK_GRAFT_SMOKE_N=10000000 runs the 10M evidence
  * pass (~10 GB packed + ~5 GB per filtered repack). Phases:
  *
  *  - exact filtered 1000q: filter -> pack -> gemm scan, timed PER
  *    CALL like `VdbStore.query`'s exact-filtered strategy (two calls
  *    timed separately — the second pays the repack AGAIN, which IS
  *    the point);
  *  - filtered-ANN 1000q at np32 and covering nProbe over the cached
  *    bucket pack (build cost its own phase, paid once);
  *  - the int8 composition (searchMergedQ8Allowed) at np32 with
  *    rescore overfetch 4.
  *
  * Run by hand; prints one line per phase.
  */
object FilteredAnnSmoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sc = spark.sparkContext

    val dim = 256
    val n = sys.env.get("SPARK_GRAFT_SMOKE_N").map(_.toInt).getOrElse(1000000)
    val nQueries = 1000
    val topK = 10
    val parts = 24 * math.max(1, n / 1000000)

    val raw = sc.range(0, n, 1, parts).map { i =>
      val rng = new java.util.Random(i * 7919L)
      (i, Array.fill(dim)(rng.nextFloat()))
    }.persist(StorageLevel.MEMORY_ONLY)
    raw.count()
    val qrng = new java.util.Random(17)
    val queries = Array.tabulate(nQueries) { i =>
      (i.toLong, Array.fill(dim)(qrng.nextFloat()))
    }

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val out = f
      println(f"FILTSMOKE $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($out)")
    }

    // 50%-selectivity filter: even ids. The exact path's honest cost
    // is filter + pack + scan per call (pico_vdb slices its matrix per
    // query the same way; VdbStore.packCandidates is per-call too).
    def exactFilteredCall(): Long = {
      val sub = BlockStore.fromRDD(raw.filter(_._1 % 2 == 0), normalize = true)
      CosineTopK.gemmBlocks(sub, queries, topK).count()
    }
    timed(s"exact filtered 1000q (call 1)")(exactFilteredCall())
    timed(s"exact filtered 1000q (call 2)")(exactFilteredCall())

    // IVF build over the full store (paid once, amortized over calls)
    val annDf = raw.toDF("vec_id", "vec")
    val nList = graft.operators.IvfIndex.defaultNList(n)
    var idx: graft.operators.IvfIndex = null
    timed(s"ivf build (nList=$nList)") {
      val cents = graft.operators.IvfIndex.fitCentroids(annDf, "vec",
        nList = nList, normalized = false)
      idx = graft.operators.IvfIndex.assign(annDf, cents, "vec_id", "vec")
      idx.assigned.count()
    }
    timed("bucket pack (cached after)") {
      idx.searchMerged[Long](queries.take(1), k = 1, nProbe = 1,
        normalized = false).count()
    }

    val member = SetMember(Array.tabulate(n / 2)(i => 2L * i))
    def filteredAnn(np: Int): Long =
      idx.searchMergedAllowed[Long](queries, k = topK, member, deny = false,
        nProbe = np, normalized = false).count()
    timed("filtered-ANN 1000q np32")(filteredAnn(32))
    timed("filtered-ANN 1000q np32 (again)")(filteredAnn(32))
    timed(s"filtered-ANN 1000q covering")(filteredAnn(nList))

    timed("q8 pack (cached after)") {
      idx.searchMergedQ8[Long](queries.take(1), k = 1, nProbe = 1,
        normalized = false).count()
    }
    def filteredAnnQ8(np: Int): Long =
      idx.searchMergedQ8Allowed[Long](queries, k = topK, member, deny = false,
        nProbe = np, normalized = false, overfetch = 4).count()
    timed("filtered-ANN+q8 1000q np32 of4")(filteredAnnQ8(32))
    timed("filtered-ANN+q8 1000q np32 (again)")(filteredAnnQ8(32))

    // ---- round 17: Dataset-query filtered twin (searchPackedAllowed) ----
    val qds = spark.createDataset(queries.toSeq).repartition(8)
    def filteredPacked(np: Int): Long =
      idx.searchPackedAllowed[Long](qds, k = topK, member, deny = false,
        nProbe = np, normalized = false).count()
    timed("filtered-packed 1000q np32")(filteredPacked(32))
    timed("filtered-packed 1000q np32 (again)")(filteredPacked(32))

    // ---- round 18: bulk int8 filtered twin (searchPackedQ8Allowed) —
    // VERDICT r17 next #5: does the 4x candidate-bandwidth win survive
    // the distributed adaptive loop? (q8 pack already cached above)
    def filteredPackedQ8(np: Int): Long =
      idx.searchPackedQ8Allowed[Long](qds, k = topK, member, deny = false,
        nProbe = np, normalized = false, overfetch = 4).count()
    timed("filtered-packed+q8 1000q np32 of4")(filteredPackedQ8(32))
    timed("filtered-packed+q8 1000q np32 (again)")(filteredPackedQ8(32))

    // ---- round 17: filtered HNSW (the graph rung) vs the exact repack ----
    // SPARK_GRAFT_SMOKE_HNSW=0 skips the build (it dominates wall at 10M)
    if (sys.env.getOrElse("SPARK_GRAFT_SMOKE_HNSW", "1") == "1") {
      var hst: graft.operators.HnswStore[Long] = null
      timed("hnsw shard build") {
        hst = graft.operators.HnswStore.fromRDD(spark, raw,
          normalize = true, m = 16, efConstruction = 100,
          numShards = parts).persist()
        hst.materialize()._1
      }
      def hnswFiltered(ef: Int): Long =
        hst.searchMergedMember(queries, topK, member, deny = false, ef).count()
      timed("hnsw-filtered 1000q ef64")(hnswFiltered(64))
      println(s"FILTSMOKE   hnsw member fallback scans: ${hst.lastMemberFallbackScans}")
      timed("hnsw-filtered 1000q ef64 (again)")(hnswFiltered(64))
      hst.unpersist()
    }

    // release the engine-path caches before the facade phase (the 10M
    // pass would otherwise hold raw + bucket + q8 + facade copies)
    idx.unpersistAssigned()

    // ---- round 17: bloom rung END-TO-END (facade: build + scan +
    // verification semi-join + refill) at a forced mid-selectivity cap ----
    if (sys.env.getOrElse("SPARK_GRAFT_SMOKE_BLOOM", "1") == "1") {
      import org.apache.spark.sql.functions.{col, lit, lpad, expr}
      val store = graft.core.VdbStore.empty(spark, dim)
      timed("vdb upsertDF (facade store)") {
        store.upsertDF(raw.toDF("_id_", "vector")
          .withColumn("_id_", lpad(col("_id_").cast("string"), 10, "0"))
          .withColumn("meta", lit(null).cast("string")), dedupIds = false)
        store.count()
      }
      store.enableAnn()
      timed("vdb ann build + pack (1 query)") {
        store.query(Seq(queries(0)._2), topK = 1).head.size.toLong
      }
      spark.conf.set("graft.ann.filtered", "true")
      // 50% selectivity with the cap at n/100: match set AND complement
      // both overflow -> the Bloom rung a 100 TB store actually runs in
      spark.conf.set("graft.ann.filtered.max", (n / 100).toString)
      val whereEven = Some(expr("CAST(_id_ AS LONG) % 2 = 0"))
      val qvecs = queries.map(_._2).toSeq
      def bloomBatch(): Long = {
        val hits = store.query(qvecs, topK = topK, where = whereEven)
        require(store.lastQueryStrategy.exists(_.endsWith("+bloom")),
          s"expected the bloom rung, got ${store.lastQueryStrategy}")
        hits.map(_.size.toLong).sum
      }
      timed("vdb bloom cold (build+scan+verify)")(bloomBatch())
      println(s"FILTSMOKE   bloom refills (fpp=0.03): ${store.lastBloomRefillCount}" +
        s", member source: ${store.lastFilterMemberSource}")
      timed("vdb bloom warm")(bloomBatch())
      println(s"FILTSMOKE   bloom refills (fpp=0.03, warm): ${store.lastBloomRefillCount}" +
        s", member source: ${store.lastFilterMemberSource}")
      // brutal fpp: how much over-fetch + refill the verification layer
      // absorbs when the filter lies 30% of the time
      spark.conf.set("graft.ann.filtered.bloom.fpp", "0.3")
      timed("vdb bloom cold fpp=0.3")(bloomBatch())
      println(s"FILTSMOKE   bloom refills (fpp=0.3): ${store.lastBloomRefillCount}")
      timed("vdb bloom warm fpp=0.3")(bloomBatch())
      println(s"FILTSMOKE   bloom refills (fpp=0.3, warm): ${store.lastBloomRefillCount}")
      spark.conf.unset("graft.ann.filtered.bloom.fpp")
      // ---- round 18: the BULK facade through the bloom rung (the
      // distributed verification semi-join + per-query refill that
      // replaced r17's exact-repack fallback) ----
      val qdfBulk = spark.createDataset(queries.toSeq)
        .toDF("qid", "qvec").repartition(8)
      def bloomBulk(): Long = {
        val n = store.queryDF(qdfBulk, "qid", "qvec", topK = topK,
          where = whereEven).count()
        require(store.lastQueryStrategy.exists(_.endsWith("+bloom")),
          s"expected the bulk bloom rung, got ${store.lastQueryStrategy}")
        n
      }
      timed("vdb bloom BULK cold (fpp=0.03)")(bloomBulk())
      println(s"FILTSMOKE   bulk bloom refills (fpp=0.03): ${store.lastBloomRefillCount}" +
        s", member source: ${store.lastFilterMemberSource}")
      timed("vdb bloom BULK warm")(bloomBulk())
      spark.conf.set("graft.ann.filtered.bloom.fpp", "0.3")
      timed("vdb bloom BULK warm fpp=0.3")(bloomBulk())
      println(s"FILTSMOKE   bulk bloom refills (fpp=0.3): ${store.lastBloomRefillCount}")
      spark.conf.unset("graft.ann.filtered.bloom.fpp")
      spark.conf.unset("graft.ann.filtered.max")
      spark.conf.unset("graft.ann.filtered")
    }

    spark.stop()
  }
}
