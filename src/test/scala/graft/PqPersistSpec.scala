package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{PqStore, StoreIO, VdbRecord, VdbStore}

/** PQ codebook persistence — the trained book is data-distribution
  * state like the IVF centroids: save writes it beside the rows
  * (`_pq_codebook` sidecar + `pq_m`/`pq_ksub` meta), load hydrates it
  * with ZERO retrains ([[PqStore.trainsInJvm]]-pinned, the
  * Hnsw.buildsInJvm pattern), and a corrupt/absent sidecar degrades to
  * a logged retrain, never a wrong answer.
  */
class PqPersistSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def rec(id: String, v: Array[Float], meta: String = null) =
    VdbRecord(id, v, meta)

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/store"

  private def seeded(dim: Int, n: Int): VdbStore = {
    val s = VdbStore.empty(spark, dim)
    val rng = new scala.util.Random(17)
    s.upsert((0 until n).map { i =>
      rec(s"r$i", Array.fill(dim)(rng.nextFloat() - 0.5f), s"""{"i": $i}""")
    })
    s
  }

  test("save/load hydrates the codebook: pq strategy answers with zero retrains, bit-identically") {
    val s = seeded(dim = 8, n = 120)
    s.enablePq(m = 2)
    val q = Array(0.3f, -0.1f, 0.5f, 0f, 0.2f, -0.4f, 0.1f, 0.9f)
    val before = s.queryOne(q, topK = 6) // trains + encodes here
    assert(s.lastQueryStrategy.contains("pq"))

    val dir = tmpDir("pqsave")
    StoreIO.save(s, dir)
    val trains0 = PqStore.trainsInJvm.get()
    val loaded = StoreIO.load(spark, dir)
    val after = loaded.queryOne(q, topK = 6)
    assert(loaded.lastQueryStrategy.contains("pq"),
      s"restored store answered via ${loaded.lastQueryStrategy}")
    assert(PqStore.trainsInJvm.get() == trains0,
      "loading a persisted codebook must not retrain")
    assert(after.map(h => (h.id, h.metrics)) ==
      before.map(h => (h.id, h.metrics)))
  }

  test("corrupt sidecar degrades to a retrain, never a wrong answer") {
    val s = seeded(dim = 8, n = 100)
    s.enablePq(m = 4)
    val q = Array(0.1f, 0.2f, -0.3f, 0.4f, 0f, 0.6f, -0.2f, 0.5f)
    val before = s.queryOne(q, topK = 5)

    val dir = tmpDir("pqcorrupt")
    StoreIO.save(s, dir)
    // tear every parquet part of the codebook sidecar
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snap = StoreIO.resolveCurrent(fs, root).get
    val pqDir = new org.apache.hadoop.fs.Path(snap, "_pq_codebook")
    fs.listStatus(pqDir).filter(_.getPath.getName.endsWith(".parquet"))
      .foreach { st =>
        val out = fs.create(st.getPath, true)
        try out.write("not a parquet file".getBytes) finally out.close()
      }
    val trains0 = PqStore.trainsInJvm.get()
    val loaded = StoreIO.load(spark, dir)
    val after = loaded.queryOne(q, topK = 5)
    assert(loaded.lastQueryStrategy.contains("pq"))
    assert(PqStore.trainsInJvm.get() == trains0 + 1,
      "a torn sidecar must retrain exactly once on next use")
    // same rows, same double-rescore arithmetic: the retrained book
    // yields the same exact-rescored hits on this tiny store (the
    // candidate cut cannot lose rows when k*overfetch covers it)
    assert(after.map(h => (h.id, h.metrics)) ==
      before.map(h => (h.id, h.metrics)))
  }

  test("a store saved without pq enabled loads without pq keys") {
    val s = seeded(dim = 4, n = 30)
    val dir = tmpDir("pqnone")
    StoreIO.save(s, dir)
    val loaded = StoreIO.load(spark, dir)
    loaded.queryOne(Array(0.1f, 0.2f, 0.3f, 0.4f), topK = 3)
    assert(loaded.lastQueryStrategy.contains("exact"))
  }
}
