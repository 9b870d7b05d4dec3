package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{VdbRecord, VdbStore}
import graft.sources.PicoStore

/** Migration source/sink for the reference's native layout
  * (ids.json + vecs.npy + meta.json). The import fixture under
  * src/test/resources/picostore was written by REAL numpy/json.dump
  * (same calls as pico_vdb.py:343-393), so this is byte-level format
  * parity, not a self-consistent round-trip only.
  */
class PicoStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val fixture = {
    val url = getClass.getResource("/picostore/refstore.meta.json")
    assert(url != null, "fixture missing")
    url.getPath.stripSuffix(".meta.json")
  }

  test("imports a numpy-written reference store: ids, tombstones, nested docs, side data") {
    val s = PicoStore.load(spark, fixture)
    assert(s.dim == 4)
    assert(s.count() == 3 && s.capacity() == 4) // "gone" is a tombstone
    // int id 7 arrives as "7" (README id deviation)
    val seven = s.get(Seq("7")).head
    assert(seven.metaJson.get.contains(""""nested": {"q": [1, 2]}"""))
    val a = s.get(Seq("a")).head
    assert(a.metaJson.get.contains(""""label": "x"""") &&
      a.metaJson.get.contains(""""n": 3"""))
    // doc with only _id_ -> no metadata
    assert(s.get(Seq("b")).head.metaJson.isEmpty)
    assert(s.get(Seq("gone")).isEmpty) // deleted ids invisible to get
    // vectors imported intact (reference stores them normalized):
    // query by a's direction returns a first
    val hits = s.queryOne(Array(1f, 0f, 0f, 0f), topK = 1)
    assert(hits.head.id == "a" && hits.head.metrics > 0.99)
    // nested side data raw
    assert(s.getAdditionalDataJson("cfg") == """{"k": [1, 2]}""")
    assert(s.getAdditionalData("note") == "hi")
  }

  test("save -> load round-trips through the reference layout") {
    val dir = java.nio.file.Files.createTempDirectory("picostore").toString + "/store"
    val s = VdbStore.empty(spark, 3)
    s.upsert(Seq(
      VdbRecord("a", Array(1f, 0f, 0f), """{"g": "x"}"""),
      VdbRecord("b", Array(0f, 1f, 0f), null),
      VdbRecord("dead", Array(0f, 0f, 1f), """{"t": 1}""")))
    s.delete(Seq("dead"))
    s.storeAdditionalDataJson("cfg" -> """{"deep": [1, {"two": 2}]}""")
    PicoStore.save(s, dir)

    val back = PicoStore.load(spark, dir)
    assert(back.dim == 3)
    assert(back.count() == 2 && back.capacity() == 3)
    assert(back.get(Seq("a")).head.metaJson.get.contains(""""g": "x""""))
    assert(back.get(Seq("b")).head.metaJson.isEmpty)
    assert(back.get(Seq("dead")).isEmpty)
    assert(back.getAdditionalDataJson("cfg") == """{"deep": [1, {"two": 2}]}""")
    assert(back.queryOne(Array(0f, 1f, 0f), topK = 1).head.id == "b")
    // tombstone slot exported with a zeroed vector + null doc, like pico
    val ids = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir + ".ids.json")))
    assert(ids.contains("\"dead\""))
    val meta = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir + ".meta.json")))
    assert(meta.contains("null"))
  }

  test("a .faiss file next to the matrix re-enables ANN (stale-index rebuild analog)") {
    // copy the fixture and add an (unparseable) faiss file — presence is
    // the signal (pico_vdb.py:260-283 rebuilds stale indexes on load)
    val dir = java.nio.file.Files.createTempDirectory("picofaiss")
    val base = dir.toString + "/refstore"
    Seq(".ids.json", ".vecs.npy", ".meta.json").foreach { suf =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(fixture + suf), java.nio.file.Paths.get(base + suf))
    }
    assert(!PicoStore.load(spark, base).annInfo.enabled) // no faiss file
    java.nio.file.Files.write(
      java.nio.file.Paths.get(base + ".vecs.npy.faiss"), "opaque".getBytes)
    val s = PicoStore.load(spark, base)
    assert(s.annInfo.enabled && s.annInfo.lastRebuildMode == "none")
    // first unfiltered query builds the IVF index lazily
    s.queryOne(Array(1f, 0f, 0f, 0f), topK = 1)
    assert(s.annInfo.lastRebuildMode == "full" && s.annInfo.upToDate)
  }

  test("npy codec round-trips and rejects non-npy input") {
    val rows = Array(Array(1.5f, -2f), Array(0f, 3f), Array(Float.MinPositiveValue, 1e30f))
    val bytes = PicoStore.npyBytes(rows, 2)
    val tmp = java.nio.file.Files.createTempFile("npy", ".npy")
    java.nio.file.Files.write(tmp, bytes)
    val (dim, back) = PicoStore.readNpy(spark, tmp.toString)
    assert(dim == 2 && back.length == 3)
    assert(back.zip(rows).forall { case (x, y) => x.sameElements(y) })
    val bad = java.nio.file.Files.createTempFile("bad", ".npy")
    java.nio.file.Files.write(bad, "not an npy".getBytes)
    intercept[IllegalArgumentException] { PicoStore.readNpy(spark, bad.toString) }
  }
}
