package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.BlockStore
import graft.operators.CosineTopK

/** gemmQueries (distributed query side) must match gemmBlocks (driver
  * query side) exactly: same kernels, same heap tie-break, on a query
  * batch large enough to be meaningfully partitioned. The query side is
  * a Dataset end-to-end — the operator never collects it (by
  * construction: pack-per-partition + cartesian + reduceByKey).
  */
object CosineTopKSpecData {
  def mkVec(seed: Long, dim: Int): Array[Float] = {
    val rng = new java.util.Random(seed)
    Array.fill(dim)(rng.nextFloat() - 0.5f)
  }
}

class CosineTopKSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import CosineTopKSpecData.mkVec

  test("gemmQueries == gemmBlocks on a 10k-query batch (normalized store)") {
    val dim = 8
    val sc = spark.sparkContext
    val storeRdd = sc.range(0, 1000, 1, 4).map(i => (i, mkVec(i * 7 + 1, dim)))
    val store = BlockStore.fromRDD(storeRdd, normalize = true).persist()
    store.materialize()

    val nQ = 10000
    val qArr = Array.tabulate(nQ)(i => (i.toLong, mkVec(i * 13 + 5, dim)))
    val qDs = spark.createDataset(qArr.toSeq).repartition(8)

    val dist = CosineTopK.gemmQueries(store, qDs, k = 5, betterThan = Some(0.1))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    val drv = CosineTopK.gemmBlocks(store, qArr, k = 5, betterThan = Some(0.1))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    assert(dist.length == drv.length && dist.nonEmpty)
    assert(dist.sameElements(drv)) // bit-identical scores, same ranking
    store.unpersist()
  }

  test("gemmQueries matches on an un-normalized (cosine-mode) store, exact scoring") {
    val dim = 6
    val sc = spark.sparkContext
    val storeRdd = sc.range(0, 300, 1, 3).map(i => (i, mkVec(i + 11, dim)))
    val store = BlockStore.fromRDD(storeRdd, normalize = false).persist()
    store.materialize()
    val qArr = Array.tabulate(500)(i => (i.toLong, mkVec(i + 3, dim)))
    val qDs = spark.createDataset(qArr.toSeq).repartition(4)
    val dist = CosineTopK.gemmQueries(store, qDs, k = 3, exact = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted
    val drv = CosineTopK.gemmBlocks(store, qArr, k = 3, exact = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).sorted
    assert(dist.sameElements(drv) && dist.length == 500 * 3)
    store.unpersist()
  }

  test("gemmQueriesManaged.release drops the packed-query cache eagerly") {
    val dim = 4
    val sc = spark.sparkContext
    val storeRdd = sc.range(0, 100, 1, 2).map(i => (i, mkVec(i + 17, dim)))
    val store = BlockStore.fromRDD(storeRdd, normalize = true).persist()
    store.materialize()
    val qDs = spark.createDataset(
      Array.tabulate(50)(i => (i.toLong, mkVec(i + 29, dim))).toSeq).repartition(2)
    val before = sc.getPersistentRDDs.keySet
    val h = CosineTopK.gemmQueriesManaged(store, qDs, k = 3)
    val added = sc.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "packed query RDD should be persisted")
    assert(h.df.count() == 50 * 3)
    h.release()
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty,
      "release() must unpersist the packed query RDD")
    store.unpersist()
  }
}
