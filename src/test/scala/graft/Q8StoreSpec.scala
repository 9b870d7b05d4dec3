package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{BlockStore, Q8Store}
import graft.operators.{CosineTopK, Kernels}

/** Int8 scalar-quantized store: the scan's error is bounded by the
  * per-row quantization step, the overfetch-all rescore is bit-equal to
  * the exact engine (the q56 contract), and realistic overfetch
  * recovers the true top-k on clustered data.
  */
class Q8StoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def randVec(rng: java.util.Random, dim: Int) =
    Array.fill(dim)(rng.nextFloat() * 2f - 1f)

  test("quantized dot error stays inside the provable per-row bound") {
    val rng = new java.util.Random(11)
    val dim = 96
    val rows = (0 until 64).map(i => (i.toLong, randVec(rng, dim)))
    val block = BlockStore.packPartition[Long](rows.iterator, normalize = true).next()
    val qb = Q8Store.quantize(block)
    val q = graft.functions.NormalizeL2.normalize(randVec(rng, dim))
    val sumAbsQ = q.map(x => math.abs(x).toDouble).sum
    var r = 0
    while (r < qb.rows) {
      val off = r * dim
      val approx = Kernels.dotQ8F(q, qb.codes, off) * qb.scales(r)
      val exact = Kernels.dotPackedD(q, block.data, off)
      // |round error per coord| <= scale/2, weighted by |q_i|; float
      // accumulation slack is orders below 1e-3 at this dim
      val bound = qb.scales(r) / 2.0 * sumAbsQ + 1e-3
      assert(math.abs(approx - exact) <= bound,
        s"row $r: |$approx - $exact| > $bound")
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

    val q8 = Q8Store.fromBlockStore(
      BlockStore.fromDataset(df.as[(Long, Array[Float])], normalize = false))
    val got = q8.rescoredTopK(queries, k = 10, overfetch = 0)
      .select(col("qid"), col("rank").cast("long"), col("id"),
        round(col("score"), 9)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expected)
  }

  test("overfetch-4 rescore recovers the exact top-k on clustered data") {
    import spark.implicits._
    val rng = new java.util.Random(37)
    val dim = 32
    // 8 well-separated unit centers, 50 points each with small noise
    val centers = Array.fill(8)(graft.functions.NormalizeL2.normalize(randVec(rng, dim)))
    val rows = (0 until 400).map { i =>
      val c = centers(i % 8)
      val v = c.zip(randVec(rng, dim)).map { case (x, n) => x + 0.05f * n }
      (i.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val queries = Array.tabulate(8)(i => (i.toLong, centers(i)))

    val q8 = Q8Store.fromBlockStore(
      BlockStore.fromDataset(df.as[(Long, Array[Float])], normalize = false))
    def ids(of: Int): Map[Long, Set[Long]] =
      q8.rescoredTopK(queries, k = 10, overfetch = of)
        .select(col("qid"), col("id")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(ids(4) == ids(0)) // small overfetch == overfetch-all on separated data
  }

  test("normalized mode: rescore matches the exact normalized gemm") {
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

    val q8 = Q8Store.fromBlockStore(bs)
    // normalized mode: rescoredTopK normalizes the raw queries once up
    // front — the same NormalizeL2 prep topKMerged runs — so raw
    // queries into both paths score identically
    val got = q8.rescoredTopK(queries, k = 8, overfetch = 0)
      .select(col("qid"), col("id"), col("score")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP))).toSet
    assert(got == expSet)
  }

  test("bulk rescoredTopKPacked is bit-identical to the driver-batch twin (round 18)") {
    import spark.implicits._
    val rng = new java.util.Random(53)
    val dim = 24
    val rows = (0 until 400).map(i => (i.toLong, randVec(rng, dim)))
    val df = rows.toDF("vec_id", "embedding")
    val queries = Array.tabulate(9)(i => (i.toLong, randVec(rng, dim)))
    val q8 = Q8Store.fromBlockStore(
      BlockStore.fromDataset(df.as[(Long, Array[Float])], normalize = false))
      .persist()
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select("qid", "rank", "id", "score").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    // multiple query partitions: the per-partition heaps still make a
    // GLOBAL per-query candidate cut (reduceByKey over all code blocks
    // precedes the CandIndex build), so parity holds at ANY overfetch
    val qds = spark.createDataset(queries.toSeq).repartition(3)
    for (of <- Seq(2, 41)) { // partial AND covering (41 * 10 >= 400 rows)
      assert(canon(q8.rescoredTopKPacked(qds, 10, of)) ==
        canon(q8.rescoredTopK(queries, 10, of)), s"overfetch=$of")
    }
    // covering overfetch == the exact Dataset-query engine
    assert(canon(q8.rescoredTopKPacked(qds, 10, 41)) ==
      canon(CosineTopK.gemmQueries[Long](q8.source, qds, 10, None, exact = true)))
    // keep-all is driver-batch-only by construction
    intercept[IllegalArgumentException](q8.rescoredTopKPacked(qds, 10, 0))
    // a mis-dimensioned query fails loudly when the dim is supplied
    val bad = spark.createDataset(Seq((99L, Array.fill(5)(0.1f))))
    intercept[org.apache.spark.SparkException](
      q8.rescoredTopKPacked(bad, 10, 4, dim = dim).count())
    q8.unpersist(cascadeSource = true)
  }

  test("quantization is 4x smaller and zero rows stay representable") {
    val rows = Seq((0L, Array(0f, 0f, 0f, 0f)), (1L, Array(1f, -1f, 0.5f, 0.25f)))
    val block = BlockStore.packPartition[Long](rows.iterator, normalize = false).next()
    val qb = Q8Store.quantize(block)
    assert(qb.codes.length == block.data.length) // 1 byte vs 4 per coord
    assert(qb.scales(0) == 0f && qb.codes.slice(0, 4).forall(_ == 0))
    assert(qb.codes(4) == 127 && qb.codes(5) == -127)
  }
}
