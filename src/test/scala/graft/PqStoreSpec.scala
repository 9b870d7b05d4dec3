package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{BlockStore, PqCodebook, PqStore}
import graft.operators.{CosineTopK, Kernels}

/** Product-quantized store: training is deterministic, the ADC scan
  * scores the codebook reconstruction exactly, the overfetch-all
  * rescore is bit-equal to the exact engine (the q79 contract), and
  * realistic overfetch recovers the true top-k on clustered data.
  */
class PqStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def randVec(rng: java.util.Random, dim: Int) =
    Array.fill(dim)(rng.nextFloat() * 2f - 1f)

  private def clusteredDf(rng: java.util.Random, dim: Int, n: Int,
                          nCenters: Int) = {
    import spark.implicits._
    val centers =
      Array.fill(nCenters)(graft.functions.NormalizeL2.normalize(randVec(rng, dim)))
    val rows = (0 until n).map { i =>
      val c = centers(i % nCenters)
      val v = c.zip(randVec(rng, dim)).map { case (x, e) => x + 0.05f * e }
      (i.toLong, v)
    }
    (rows.toDF("vec_id", "embedding"), centers)
  }

  test("training is deterministic and layout-independent") {
    import spark.implicits._
    val rng = new java.util.Random(7)
    val rows = (0 until 300).map(i => (i.toLong, randVec(rng, 32)))
    val a = BlockStore.fromDataset(
      rows.toDF("vec_id", "embedding").as[(Long, Array[Float])],
      normalize = false)
    // different physical layout, same content
    val b = BlockStore.fromDataset(
      rows.reverse.toDF("vec_id", "embedding").repartition(7)
        .as[(Long, Array[Float])],
      normalize = false)
    val ca = PqStore.train(a, m = 8, ksub = 16, sampleCap = 1000, seed = 5L, maxIter = 8)
    val cb = PqStore.train(b, m = 8, ksub = 16, sampleCap = 1000, seed = 5L, maxIter = 8)
    assert(ca.centroids.sameElements(cb.centroids))
    assert(ca.ksub == cb.ksub && ca.dsub == 4)
  }

  test("ADC table sum equals the dot product against the reconstruction") {
    import spark.implicits._
    val rng = new java.util.Random(13)
    val dim = 24
    val rows = (0 until 200).map(i => (i.toLong, randVec(rng, dim)))
    val bs = BlockStore.fromDataset(
      rows.toDF("v", "e").as[(Long, Array[Float])], normalize = false)
    val pq = PqStore.fromBlockStore(bs, m = 6, ksub = 16, sampleCap = 1000, seed = 3L)
    val block = pq.blocks.collect().head
    val q = randVec(rng, dim)
    val tab = pq.codebook.adcTable(q)
    val ksub = pq.codebook.ksub
    val m = pq.codebook.m
    var r = 0
    while (r < math.min(block.rows, 32)) {
      var adc = 0.0
      var sub = 0
      while (sub < m) {
        adc += tab(sub * ksub + (block.codes(r * m + sub) & 0xFF))
        sub += 1
      }
      val recon = pq.codebook.decodeRow(block.codes, r * m)
      val exact = Kernels.dotPackedD(q, recon, 0)
      assert(math.abs(adc - exact) < 1e-3,
        s"row $r: ADC $adc vs reconstruction dot $exact")
      r += 1
    }
  }

  test("overfetch-all rescore is bit-equal to the exact engine (cosine mode)") {
    import spark.implicits._
    val rng = new java.util.Random(23)
    val dim = 24
    val rows = (0 until 400).map(i => (i.toLong, randVec(rng, dim))) :+
      (400L, Array.fill(dim)(0f)) // zero row: cosine 0 everywhere
    val df = rows.toDF("vec_id", "embedding")
    val queries = Array.tabulate(7)(i => (100L + i, randVec(rng, dim)))

    val expected = CosineTopK.gemm(df, "vec_id", "embedding", queries, k = 10,
        betterThan = None, normalized = false, exact = true)
      .select(col("qid"), col("rank").cast("long"), col("id"),
        round(col("score"), 9)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

    val pq = PqStore.fromBlockStore(
      BlockStore.fromDataset(df.as[(Long, Array[Float])], normalize = false),
      m = 6, ksub = 32, sampleCap = 1000, seed = 3L)
    val got = pq.rescoredTopK(queries, k = 10, overfetch = 0)
      .select(col("qid"), col("rank").cast("long"), col("id"),
        round(col("score"), 9)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expected)
  }

  test("overfetch-8 rescore recovers the exact top-k on clustered data") {
    import spark.implicits._
    val rng = new java.util.Random(37)
    val (df, centers) = clusteredDf(rng, dim = 32, n = 400, nCenters = 8)
    val queries = Array.tabulate(8)(i => (i.toLong, centers(i)))

    val pq = PqStore.fromBlockStore(
      BlockStore.fromDataset(df.as[(Long, Array[Float])], normalize = false),
      m = 8, ksub = 32, sampleCap = 1000, seed = 3L)
    def ids(of: Int): Map[Long, Set[Long]] =
      pq.rescoredTopK(queries, k = 10, overfetch = of)
        .select(col("qid"), col("id")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // cap 80 >= the 50-member cluster: separation puts every in-cluster
    // row above every out-cluster row in ADC score, so the exact top-10
    // cannot be lost — small overfetch == overfetch-all
    assert(ids(8) == ids(0))
  }

  test("normalized mode: rescore matches the exact normalized engine") {
    import spark.implicits._
    val rng = new java.util.Random(41)
    val dim = 20
    val rows = (0 until 300).map(i =>
      (i.toLong, graft.functions.NormalizeL2.normalize(randVec(rng, dim))))
    val df = rows.toDF("vec_id", "embedding")
    val queries = Array.tabulate(5)(i => (i.toLong, randVec(rng, dim)))

    val bs = BlockStore.fromDataset(df.as[(Long, Array[Float])],
      normalize = false, assumeNormalized = true)
    val expected = bs.topKMerged(queries, k = 8, exact = true)
    val expSet = queries.map(_._1).zip(expected).flatMap { case (qid, hits) =>
      hits.map { case (id, s) =>
        (qid, id, BigDecimal(s).setScale(9, BigDecimal.RoundingMode.HALF_UP))
      }
    }.toSet

    val pq = PqStore.fromBlockStore(bs, m = 5, ksub = 32, sampleCap = 1000, seed = 3L)
    val got = pq.rescoredTopK(queries, k = 8, overfetch = 0)
      .select(col("qid"), col("id"), col("score")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP))).toSet
    assert(got == expSet)
  }

  test("ADC-only top-1 lands on the query's cluster at m bytes per row") {
    import spark.implicits._
    val rng = new java.util.Random(53)
    val dim = 32
    val (df, centers) = clusteredDf(rng, dim, n = 320, nCenters = 8)
    val pq = PqStore.fromBlockStore(
      BlockStore.fromDataset(df.as[(Long, Array[Float])], normalize = false),
      m = 8, ksub = 32, sampleCap = 1000, seed = 3L)
    // 8 bytes per row instead of 128: 16x compression
    val block = pq.blocks.collect().head
    assert(block.codes.length == block.rows * 8)
    val queries = Array.tabulate(8)(i => (i.toLong, centers(i)))
    val hits = pq.topKMerged(queries, k = 10)
    queries.zip(hits).foreach { case ((qid, _), hit) =>
      // every ADC hit for center c's query belongs to cluster c
      // (ids were dealt round-robin: id % 8 == cluster)
      assert(hit.nonEmpty)
      assert(hit.forall { case (id, _) => id % 8 == qid },
        s"query $qid: ADC hits ${hit.map(_._1).mkString(",")} off-cluster")
    }
  }

  test("m must divide dim") {
    import spark.implicits._
    val rows = (0 until 50).map(i => (i.toLong, Array.fill(30)(i.toFloat)))
    val bs = BlockStore.fromDataset(
      rows.toDF("v", "e").as[(Long, Array[Float])], normalize = false)
    val e = intercept[IllegalArgumentException] {
      PqStore.train(bs, m = 7, ksub = 8, sampleCap = 100, seed = 1L, maxIter = 4)
    }
    assert(e.getMessage.contains("must divide"))
  }

  test("topKMerged query chunking is invisible (tiny table budget == one chunk)") {
    // the same per-task table bound as IvfIndex.searchMergedPq: chunks
    // are pure mechanics, each query's heap sees the same blocks and
    // the same float tables whichever chunk it lands in
    import spark.implicits._
    val rng = new scala.util.Random(9)
    val rows = (0 until 400).map(i =>
      (i.toLong, Array.fill(16)((rng.nextFloat() - 0.5f) * 2f)))
    val bs = BlockStore.fromDataset(
      rows.toDF("v", "e").as[(Long, Array[Float])], normalize = false)
    val pq = PqStore.fromBlockStore(bs, m = 4, sampleCap = 1000, seed = 3L)
    val queries = rows.filter(_._1 % 3 == 0).toArray // 134 queries
    def key(r: Array[Array[(Long, Double)]]) =
      r.map(_.map { case (id, s) =>
        (id, java.lang.Double.doubleToLongBits(s)) }.toSeq).toSeq
    val one = key(pq.topKMerged(queries, 5))
    // m=4/ksub=256 -> 4 KB per query table; 1 MB budget -> 256-query
    // chunks... still one chunk at 134. Force multi-chunk by batch
    // size: replicate to 600 queries (3 chunks at 1 MB).
    val big = Array.tabulate(600)(i => queries(i % queries.length))
    val bigOne = key(pq.topKMerged(big, 5))
    spark.conf.set("graft.pq.table.budget.mb", "1")
    try {
      assert(key(pq.topKMerged(queries, 5)) == one)
      assert(key(pq.topKMerged(big, 5)) == bigOne)
    } finally spark.conf.unset("graft.pq.table.budget.mb")
  }

  test("ksub > 256 is rejected loudly (codes are one byte)") {
    // encodeRow stores indices with .toByte and readers widen with
    // & 0xFF, so a 512-centroid codebook would silently wrap half its
    // codes modulo 256 — wrong ADC scores, no exception. The codebook
    // ctor guards every creation path (train, sidecar load).
    val e = intercept[IllegalArgumentException] {
      new PqCodebook(8, 2, 512, new Array[Float](8 * 512 / 2 * 2))
    }
    assert(e.getMessage.contains("[1, 256]"))
    import spark.implicits._
    val rows = (0 until 300).map(i =>
      (i.toLong, Array.fill(8)(i.toFloat + (i % 7))))
    val bs = BlockStore.fromDataset(
      rows.toDF("v", "e").as[(Long, Array[Float])], normalize = false)
    val e2 = intercept[IllegalArgumentException] {
      PqStore.train(bs, m = 2, ksub = 512, sampleCap = 1000, seed = 1L,
        maxIter = 2)
    }
    assert(e2.getMessage.contains("[1, 256]"))
  }
  test("bulk rescoredTopKPacked is bit-identical to the driver-batch twin (round 18)") {
    import spark.implicits._
    val rng = new java.util.Random(59)
    val dim = 24
    val rows = (0 until 400).map(i => (i.toLong, randVec(rng, dim)))
    val df = rows.toDF("vec_id", "embedding")
    val queries = Array.tabulate(9)(i => (i.toLong, randVec(rng, dim)))
    val pq = PqStore.fromBlockStore(
      BlockStore.fromDataset(df.as[(Long, Array[Float])], normalize = false),
      m = 6, ksub = 16, sampleCap = 1000, seed = 3L).persist()
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select("qid", "rank", "id", "score").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    // multiple query partitions + a tiny ADC table budget: the in-task
    // chunking must be invisible (per-query tables are independent) and
    // the global candidate cut makes parity hold at ANY overfetch
    val qds = spark.createDataset(queries.toSeq).repartition(3)
    spark.conf.set("graft.pq.table.budget.mb", "1")
    try {
      for (of <- Seq(2, 41)) { // partial AND covering (41 * 10 >= 400)
        assert(canon(pq.rescoredTopKPacked(qds, 10, of)) ==
          canon(pq.rescoredTopK(queries, 10, of)), s"overfetch=$of")
      }
      assert(canon(pq.rescoredTopKPacked(qds, 10, 41)) ==
        canon(CosineTopK.gemmQueries[Long](pq.source, qds, 10, None, exact = true)))
      intercept[IllegalArgumentException](pq.rescoredTopKPacked(qds, 10, 0))
    } finally spark.conf.unset("graft.pq.table.budget.mb")
    pq.unpersist(cascadeSource = true)
  }
}
