package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{BitStore, BlockStore}
import graft.operators.CosineTopK

/** Binary-sketch store: the Hamming estimator behaves (identical rows
  * at distance 0, antipodal rows near `bits`), the overfetch-all
  * rescore is bit-equal to the exact engine (the shared rescore
  * contract every quantized tier carries — the q82 contract), and
  * realistic overfetch recovers clustered neighbors.
  */
class BitStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def randVec(rng: java.util.Random, dim: Int) =
    Array.fill(dim)(rng.nextFloat() * 2f - 1f)

  test("Hamming estimator: self at 0, antipode near bits, random near bits/2") {
    val dim = 64
    val rng = new java.util.Random(5)
    val v = randVec(rng, dim)
    val anti = v.map(x => -x)
    val planes = BitStore.hyperplanes(256, dim, 42L)
    val w = (256 + 63) >>> 6
    val codes = new Array[Long](3 * w)
    BitStore.encodeRow(v, 0, dim, planes, 256, codes, 0)
    BitStore.encodeRow(anti, 0, dim, planes, 256, codes, w)
    BitStore.encodeRow(v, 0, dim, planes, 256, codes, 2 * w)
    def ham(a: Int, b: Int): Int =
      (0 until w).map(t =>
        java.lang.Long.bitCount(codes(a * w + t) ^ codes(b * w + t))).sum
    assert(ham(0, 2) == 0)
    // sign(dot(-v, h)) flips except at exact zero-dot planes (measure 0
    // under gaussian directions)
    assert(ham(0, 1) >= 250, s"antipode hamming ${ham(0, 1)} should be ~256")
    val u = randVec(rng, dim)
    val uc = new Array[Long](w)
    BitStore.encodeRow(u, 0, dim, planes, 256, uc, 0)
    val h = (0 until w).map(t => java.lang.Long.bitCount(codes(t) ^ uc(t))).sum
    assert(h > 64 && h < 192, s"random-vs-random hamming $h should be near 128")
  }

  test("overfetch-all rescore is bit-equal to the exact engine (cosine mode)") {
    import spark.implicits._
    val rng = new java.util.Random(23)
    val dim = 24
    val rows = (0 until 300).map(i => (i.toLong, randVec(rng, dim))) :+
      (300L, Array.fill(dim)(0f)) // zero row: cosine 0 everywhere
    val df = rows.toDF("vec_id", "embedding")
    val queries = Array.tabulate(7)(i => (100L + i, randVec(rng, dim)))
    val expected = CosineTopK.gemm(df, "vec_id", "embedding", queries, k = 10,
        betterThan = None, normalized = false, exact = true)
      .select(col("qid"), col("rank").cast("long"), col("id"),
        round(col("score"), 9)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val bit = BitStore.fromBlockStore(
      BlockStore.fromDataset(df.as[(Long, Array[Float])], normalize = false),
      bits = 128).persist()
    val got = bit.rescoredTopK(queries, k = 10, overfetch = 0)
      .select(col("qid"), col("rank").cast("long"), col("id"),
        round(col("score"), 9)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expected)
    bit.unpersist(cascadeSource = true)
  }

  test("normalized mode: rescore matches the exact normalized engine") {
    import spark.implicits._
    val rng = new java.util.Random(41)
    val dim = 20
    val rows = (0 until 200).map(i =>
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
    val bit = BitStore.fromBlockStore(bs, bits = 128).persist()
    val got = bit.rescoredTopK(queries, k = 8, overfetch = 0)
      .select(col("qid"), col("id"), col("score")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP))).toSet
    assert(got == expSet)
    bit.unpersist(cascadeSource = true)
  }

  test("realistic overfetch recovers clustered neighbors (angle-aligned sketch)") {
    import spark.implicits._
    // 8 well-separated clusters: same-cluster Hamming sits far below
    // cross-cluster, so a small candidate multiple recovers the exact
    // top-k
    val rng = new java.util.Random(11)
    val dim = 64
    val centers = Array.fill(8)(randVec(rng, dim))
    val rows = (0 until 400).map { i =>
      val c = centers(i % 8)
      (i.toLong, Array.tabulate(dim)(t => c(t) + (rng.nextFloat() - 0.5f) * 0.1f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val bs = BlockStore.fromDataset(df.as[(Long, Array[Float])],
      normalize = false)
    bs.persist(); bs.materialize()
    val bit = BitStore.fromBlockStore(bs, bits = 256).persist()
    val queries = rows.filter(_._1 % 37 == 0).toArray
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select("qid", "id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = ids(CosineTopK.gemmBlocks(bs, queries, 10))
    val got = ids(bit.rescoredTopK(queries, 10, overfetch = 8))
    val recall = queries.map { case (qid, _) =>
      val ex = exact.getOrElse(qid, Set.empty[Long])
      if (ex.isEmpty) 1.0
      else got.getOrElse(qid, Set.empty[Long]).count(ex).toDouble / ex.size
    }.sum / queries.length
    assert(recall >= 0.8, s"clustered bit-sketch recall@10 = $recall (floor 0.8)")
    bit.unpersist(cascadeSource = true)
  }

  test("bits must be in range; duplicate qids merge (the flat-tier contract); 32 B/row at 256 bits") {
    import spark.implicits._
    val rng = new java.util.Random(3)
    val rows = (0 until 40).map(i => (i.toLong, randVec(rng, 8)))
    val bs = BlockStore.fromDataset(
      rows.toDF("v", "e").as[(Long, Array[Float])], normalize = false)
    val e = intercept[IllegalArgumentException] {
      BitStore.fromBlockStore(bs, bits = 0)
    }
    assert(e.getMessage.contains("[1, 65536]"))
    val bit = BitStore.fromBlockStore(bs, bits = 256).persist()
    val block = bit.blocks.collect().head
    assert(block.words == 4 && block.codes.length == block.rows * 4)
    // duplicate qids MERGE on the flat tiers (matches Q8Store/PqStore
    // rescoredTopK: one ranked list per qid) — the IVF paths keep them
    // independent via uid keys instead
    val dup = Array((7L, rows(3)._2), (7L, rows(9)._2))
    assert(bit.rescoredTopK(dup, 3, overfetch = 0).count() == 3)
    bit.unpersist(cascadeSource = true)
  }
  test("bulk rescoredTopKPacked is bit-identical to the driver-batch twin (round 18)") {
    import spark.implicits._
    val rng = new java.util.Random(61)
    val dim = 24
    val rows = (0 until 300).map(i => (i.toLong, randVec(rng, dim)))
    val df = rows.toDF("vec_id", "embedding")
    val queries = Array.tabulate(9)(i => (i.toLong, randVec(rng, dim)))
    val bit = BitStore.fromBlockStore(
      BlockStore.fromDataset(df.as[(Long, Array[Float])], normalize = false),
      bits = 128).persist()
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select("qid", "rank", "id", "score").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    // query sketches build once per packed query partition (prep stage)
    // under the store's seed, so parity with the driver twin is exact
    val qds = spark.createDataset(queries.toSeq).repartition(3)
    for (of <- Seq(4, 31)) { // partial AND covering (31 * 10 >= 300)
      assert(canon(bit.rescoredTopKPacked(qds, 10, of)) ==
        canon(bit.rescoredTopK(queries, 10, of)), s"overfetch=$of")
    }
    assert(canon(bit.rescoredTopKPacked(qds, 10, 31)) ==
      canon(CosineTopK.gemmQueries[Long](bit.source, qds, 10, None, exact = true)))
    intercept[IllegalArgumentException](bit.rescoredTopKPacked(qds, 10, 0))
    // a mis-dimensioned query hits the sketch-dim guard task-side
    val bad = spark.createDataset(Seq((99L, Array.fill(5)(0.1f))))
    intercept[org.apache.spark.SparkException](
      bit.rescoredTopKPacked(bad, 10, 4).count())
    bit.unpersist(cascadeSource = true)
  }
}
