package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Hnsw, VdbRecord, VdbStore}

/** HNSW graph index: recall floors vs brute force on clustered AND
  * structure-free data (the case IVF's probed-mass bound cannot win),
  * build determinism, and the LocalReplica serving integration.
  */
class HnswSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def normalize(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (n == 0.0) { val e = new Array[Float](v.length); e(0) = 1f; e }
    else v.map(x => (x / n).toFloat)
  }

  private def bruteTop(data: Array[Array[Float]], q: Array[Float],
                       k: Int): Set[Int] =
    data.zipWithIndex.map { case (v, i) =>
      (v.zip(q).map { case (a, b) => a.toDouble * b.toDouble }.sum, i)
    }.sortBy { case (s, i) => (-s, i) }.take(k).map(_._2).toSet

  private def flat(data: Array[Array[Float]]): Array[Float] = {
    val dim = data(0).length
    val f = new Array[Float](data.length * dim)
    data.zipWithIndex.foreach { case (v, i) =>
      System.arraycopy(v, 0, f, i * dim, dim)
    }
    f
  }

  private def recallOf(idx: Hnsw, data: Array[Array[Float]],
                       queries: Seq[Array[Float]], k: Int,
                       ef: Int): Double = {
    val per = queries.map { q =>
      val want = bruteTop(data, q, k)
      val got = idx.search(q, k, ef).map(_._1).toSet
      got.count(want).toDouble / k
    }
    per.sum / per.length
  }

  test("recall >= 0.95 on clustered data at ef=64 (the IvfIndexSpec fixture shape)") {
    val rng = new scala.util.Random(5)
    val data = Array.tabulate(800) { i =>
      val v = new Array[Float](16)
      v(2 * (i % 8)) = 1f
      (0 until 16).foreach(j => v(j) = v(j) + (rng.nextFloat() - 0.5f) * 0.15f)
      normalize(v)
    }
    val idx = Hnsw.build(flat(data), data.length, 16)
    val queries = (0 until 50).map(i => data(i * 7 % data.length))
    assert(recallOf(idx, data, queries, k = 10, ef = 64) >= 0.95)
  }

  test("recall floor on STRUCTURE-FREE vectors (IVF's losing case): >= 0.85 at ef=128") {
    // 2000 x 64-d uniform — on this shape IVF recall ~= probed mass
    // (SCALING.md "ANN"); the graph index must clear a floor no probed
    // fraction explains
    val rng = new scala.util.Random(11)
    val data = Array.tabulate(2000)(_ =>
      normalize(Array.fill(64)(rng.nextFloat() - 0.5f)))
    val idx = Hnsw.build(flat(data), data.length, dim = 64)
    val queries = (0 until 40).map(_ =>
      normalize(Array.fill(64)(rng.nextFloat() - 0.5f)))
    val r128 = recallOf(idx, data, queries, k = 10, ef = 128)
    val r32 = recallOf(idx, data, queries, k = 10, ef = 32)
    assert(r128 >= 0.85, s"recall@10 ef=128 = $r128")
    assert(r128 >= r32, "recall must be monotone in ef")
  }

  test("batch build survives two same-batch nodes raising maxLevel (review r13 AIOOBE)") {
    // seedSequential=1 puts nearly everything in the batched phase;
    // with the deterministic level draws, nodes 3 and 29 both draw
    // level 1 over the frozen maxLevel 0 in the first batch — the old
    // applyInsert indexed perLayer with the LIVE maxLevel and crashed
    val rng = new scala.util.Random(3)
    val data = Array.tabulate(400)(_ =>
      normalize(Array.fill(8)(rng.nextFloat() - 0.5f)))
    val idx = Hnsw.build(flat(data), data.length, dim = 8,
      seedSequential = 1)
    val q = data(100)
    val got = idx.search(q, 5, ef = 64).map(_._1)
    assert(got.nonEmpty && got.contains(100)) // finds itself
  }

  test("seedSequential=0 is clamped to 1 (batch phase needs an entry point)") {
    val rng = new scala.util.Random(5)
    val data = Array.tabulate(300)(_ =>
      normalize(Array.fill(8)(rng.nextFloat() - 0.5f)))
    val idx = Hnsw.build(flat(data), data.length, dim = 8, seedSequential = 0)
    assert(idx.search(data(7), 3, ef = 64).nonEmpty)
  }

  test("parallel commit is parallelism-independent: sequential and pooled builds serialize byte-identically (round 19)") {
    // the round-19 commit decomposition (parallel plan + per-target
    // grouped back-links) claims a graph BIT-IDENTICAL to the
    // sequential commit's; writeGraph bytes are the strongest equality
    // check available. seedSequential=1 maximizes the batched phase.
    val rng = new scala.util.Random(41)
    val data = Array.tabulate(3000)(_ =>
      normalize(Array.fill(32)(rng.nextFloat() - 0.5f)))
    def bytesOf(parallelism: Int): Array[Byte] = {
      val idx = Hnsw.build(flat(data), data.length, 32,
        seedSequential = 1, parallelism = parallelism)
      val bos = new java.io.ByteArrayOutputStream()
      idx.writeGraph(new java.io.DataOutputStream(bos))
      bos.toByteArray
    }
    val seq = bytesOf(1)
    val par8 = bytesOf(8)
    assert(java.util.Arrays.equals(seq, par8),
      "pooled build must serialize byte-identically to the sequential one")
  }

  test("build is deterministic: same input -> identical results") {
    val rng = new scala.util.Random(23)
    val data = Array.tabulate(600)(_ =>
      normalize(Array.fill(24)(rng.nextFloat() - 0.5f)))
    val a = Hnsw.build(flat(data), data.length, 24)
    val b = Hnsw.build(flat(data), data.length, 24)
    val queries = (0 until 20).map(_ =>
      normalize(Array.fill(24)(rng.nextFloat() - 0.5f)))
    queries.foreach { q =>
      assert(a.search(q, 10, 64).toSeq == b.search(q, 10, 64).toSeq)
    }
  }

  test("writeGraph/readGraph codec round-trip: identical searches, no rebuild, corrupt counts rejected") {
    val rng = new scala.util.Random(31)
    val data = Array.tabulate(500)(_ =>
      normalize(Array.fill(16)(rng.nextFloat() - 0.5f)))
    val f = flat(data)
    val idx = Hnsw.build(f, data.length, 16, m = 8, efConstruction = 60)
    val bos = new java.io.ByteArrayOutputStream()
    idx.writeGraph(new java.io.DataOutputStream(bos))
    val bytes = bos.toByteArray

    val before = Hnsw.buildsInJvm
    val back = Hnsw.readGraph(
      new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes)), f, 16)
    assert(Hnsw.buildsInJvm == before, "readGraph must not count as a build")
    assert(back.n == idx.n && back.dim == idx.dim)
    val queries = (0 until 25).map(_ =>
      normalize(Array.fill(16)(rng.nextFloat() - 0.5f)))
    queries.foreach { q =>
      assert(back.search(q, 10, 64).toSeq == idx.search(q, 10, 64).toSeq,
        "deserialized graph must search identically to the original")
    }
    // corrupt a neighbor count in the header region past the levels:
    // readGraph's per-node guard must reject it loudly
    val corrupt = bytes.clone()
    // first neighbor-count word sits right after: m, n, entry, maxLevel,
    // then n levels -> offset (4 + n) * 4
    val off = (4 + idx.n) * 4
    corrupt(off) = 0x7F.toByte // huge count
    intercept[IllegalArgumentException] {
      Hnsw.readGraph(
        new java.io.DataInputStream(new java.io.ByteArrayInputStream(corrupt)), f, 16)
    }
    // a graph/matrix mismatch (wrong slab) is rejected up front
    intercept[IllegalArgumentException] {
      Hnsw.readGraph(
        new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes)),
        new Array[Float](16), 16)
    }
  }

  test("LocalReplica.queryOneHnsw: serving integration, meta carried, recall vs exact") {
    val rng = new scala.util.Random(31)
    val s = VdbStore.empty(spark, 32)
    val recs = (0 until 500).map { i =>
      VdbRecord(f"h$i%04d", Array.fill(32)(rng.nextFloat() - 0.5f),
        s"""{"i": $i}""")
    }
    s.upsert(recs)
    val rep = s.localReplica()
    intercept[IllegalArgumentException](rep.queryOneHnsw(recs(0).vector))
    rep.buildHnsw()
    val queries = (0 until 25).map(_ => Array.fill(32)(rng.nextFloat() - 0.5f))
    val per = queries.map { q =>
      val want = rep.queryOne(q, topK = 10).map(_.id).toSet
      val got = rep.queryOneHnsw(q, topK = 10, ef = 128)
      assert(got.forall(_.metaJson.isDefined))
      // scores must match the exact path's for the ids both agree on
      val exactScores = rep.queryOne(q, topK = 10).map(h => h.id -> h.metrics).toMap
      got.filter(h => exactScores.contains(h.id)).foreach { h =>
        assert(math.abs(h.metrics - exactScores(h.id)) < 1e-6)
      }
      got.map(_.id).count(want).toDouble / 10
    }
    assert(per.sum / per.length >= 0.85,
      s"serving-path recall@10 = ${per.sum / per.length}")
  }

  test("LocalReplica.queryOneHnswFiltered: members only, covering-beam parity, sub-k snap") {
    val rng = new scala.util.Random(37)
    val s = VdbStore.empty(spark, 16)
    val recs = (0 until 400).map { i =>
      VdbRecord(f"f$i%04d", Array.fill(16)(rng.nextFloat() - 0.5f),
        s"""{"par": ${i % 2}}""")
    }
    s.upsert(recs)
    val rep = s.localReplica()
    rep.buildHnsw()
    val isOdd = (_: String, meta: String) => meta != null && meta.contains("\"par\": 1")
    val q = recs(7).vector
    // at a row-covering beam the filtered walk holds every reachable
    // member; parity with the exact filtered scan (same slabs, same
    // f32 arithmetic) must be hit-for-hit
    val exactF = rep.queryOne(q, topK = 8, whereFn = Some(isOdd))
    val graphF = rep.queryOneHnswFiltered(q, topK = 8, ef = 400, whereFn = isOdd)
    assert(graphF.map(h => (h.id, h.metrics)) ==
      exactF.map(h => (h.id, h.metrics)))
    // partial beam: k member rows, members only
    val partial = rep.queryOneHnswFiltered(q, topK = 8, ef = 16, whereFn = isOdd)
    assert(partial.size == 8 && partial.forall(h => isOdd(h.id, h.metaJson.orNull)))
    // a filter matching fewer than k rows returns exactly those (the
    // underfill -> exact-scan snap), never more, never an error
    val three = Set("f0001", "f0003", "f0005")
    val tiny = rep.queryOneHnswFiltered(q, topK = 10, ef = 16,
      whereFn = (id, _) => three(id))
    assert(tiny.map(_.id).toSet == three, s"got ${tiny.map(_.id)}")
  }

  test("LocalReplica.queryOneHnswFilteredQ8 (round 18): int8 beam + exact rescore, covering parity, sub-k snap") {
    val rng = new scala.util.Random(41)
    val s = VdbStore.empty(spark, 16)
    val recs = (0 until 400).map { i =>
      VdbRecord(f"g$i%04d", Array.fill(16)(rng.nextFloat() - 0.5f),
        s"""{"par": ${i % 2}}""")
    }
    s.upsert(recs)
    val rep = s.localReplica()
    rep.buildHnsw()
    intercept[IllegalArgumentException](
      rep.queryOneHnswFilteredQ8(recs(0).vector, whereFn = (_, _) => true))
    rep.buildHnswQ8()
    val isOdd = (_: String, meta: String) =>
      meta != null && meta.contains("\"par\": 1")
    val q = recs(7).vector
    // covering beam + covering candidate cut: the int8 walk holds every
    // reachable member and the rescore IS the exact filtered scan's
    // arithmetic — parity must be hit-for-hit
    val exactF = rep.queryOne(q, topK = 8, whereFn = Some(isOdd))
    val got = rep.queryOneHnswFilteredQ8(q, topK = 8, ef = 400,
      whereFn = isOdd, overfetch = 50)
    assert(got.map(h => (h.id, h.metrics)) ==
      exactF.map(h => (h.id, h.metrics)))
    // partial beam: k member rows, members only, and every score is
    // the exact arithmetic for its id (int8 never leaks into output)
    val exactScores = rep.queryOne(q, topK = 400, whereFn = Some(isOdd))
      .map(h => h.id -> h.metrics).toMap
    val partial = rep.queryOneHnswFilteredQ8(q, topK = 8, ef = 16,
      whereFn = isOdd, overfetch = 2)
    assert(partial.size == 8 &&
      partial.forall(h => isOdd(h.id, h.metaJson.orNull)))
    partial.foreach(h =>
      assert(math.abs(h.metrics - exactScores(h.id)) < 1e-12,
        s"${h.id}: partial-beam scores must be fp32-rescored"))
    // a filter matching fewer than k rows returns exactly those (the
    // underfill -> exact-scan snap), never more, never an error
    val three = Set("g0001", "g0003", "g0005")
    val tiny = rep.queryOneHnswFilteredQ8(q, topK = 10, ef = 16,
      whereFn = (id, _) => three(id))
    assert(tiny.map(_.id).toSet == three, s"got ${tiny.map(_.id)}")
  }

  test("build parallelism resolution (round 20): explicit wins, in-task builds get the task's CPU share, driver builds get the common pool") {
    assert(Hnsw.resolveBuildParallelism(3) == 3)
    // driver-side auto: the full common pool — this is how
    // LocalReplica.buildHnsw and the bench's serving build inherit the
    // parallel commit without passing anything
    assert(Hnsw.resolveBuildParallelism(0) == math.max(1,
      java.util.concurrent.ForkJoinPool.getCommonPoolParallelism))
    // in-task auto: exactly the task's CPU allocation (1 under the
    // default spark.task.cpus), so per-slab builds in HnswStore.fromRDD
    // and the streaming segment sink never run tasks x pool-width
    // threads on one executor
    val inTask = spark.sparkContext.parallelize(Seq(0), numSlices = 1)
      .map(_ => Hnsw.resolveBuildParallelism(0)).collect().head
    assert(inTask == 1, s"in-task auto parallelism resolved to $inTask")
  }
}
