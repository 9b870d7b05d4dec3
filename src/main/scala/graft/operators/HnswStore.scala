package graft.operators

import scala.reflect.ClassTag

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

import graft.core.{BlockStore, BoundedTopKG, Hnsw, VecBlock}

/** One shard of the distributed graph-ANN store: the raw packed slab
  * (ids + row-major float32 matrix + cosine norms — the exact-path
  * substrate, shared with [[graft.core.BlockStore]]) plus an HNSW graph
  * built over the UNIT-normalized rows. For stores written with the L2
  * invariant the graph traverses the slab matrix itself; in cosine mode
  * (raw rows) a normalized copy is packed next to it so graph
  * similarity is true cosine while the exact path keeps the
  * raw/raw-with-norms arithmetic the oracles hash-match.
  */
final class HnswShard[K](
    val block: VecBlock[K],
    val unit: Array[Float],
    val graph: Hnsw) extends Serializable

/** Distributed sharded-HNSW vector index: `RDD[HnswShard]`, one graph
  * per bounded slab (≤ `maxBlockFloats` floats ≈ 128 MB), persisted
  * deserialized like the BlockStore it mirrors.
  *
  * Why this exists: IVF recall on STRUCTURE-FREE embeddings is bounded
  * by probed mass (nProbe/nList — SCALING.md "ANN"), and the
  * driver-local [[graft.core.Hnsw]] replica answers that only for
  * serving-sized stores (≤ Int.MaxValue floats on one JVM). This is the
  * DISTRIBUTED answer, the standard sharded-graph architecture
  * (FAISS-style shard-and-merge): graph quality lives per shard, scale
  * lives in Spark partitioning.
  *
  * Scale model (100 TB): builds parallelize perfectly — one
  * O(n·log n·m) graph construction per slab, no cross-shard edges, no
  * shuffle (the pointer-chasing part that does NOT map to Spark's model
  * stays inside one task's slab, reference pico_vdb.py:169-212 builds
  * ONE such graph serially). Queries broadcast down, per-shard beam
  * searches run locally, and bounded top-k heaps merge up a
  * treeAggregate — candidate traffic is O(shards × Q × k), independent
  * of N, identical to BlockStore.topKMerged. Sharded recall ≈ the
  * per-shard graph recall (each shard must surface only ITS OWN true
  * top-k rows; the exact union-merge loses nothing), so recall does not
  * degrade as shards are added. The trade is per-query entry overhead
  * O(shards × ef·log n_shard) — at scale keep shards slab-sized (10⁵-10⁶
  * rows), not thousands of tiny graphs.
  */
final class HnswStore[K](
    val spark: SparkSession,
    val shards: RDD[HnswShard[K]],
    val normalized: Boolean,
    val m: Int = 16,
    val efConstruction: Int = 100)(implicit ct: ClassTag[K], ord: Ordering[K]) {

  def persist(): this.type = persist(StorageLevel.MEMORY_ONLY)

  /** Stream-derived stores should pass MEMORY_AND_DISK: a MEMORY_ONLY
    * shard evicted under pressure recomputes through its lineage, and
    * a foreachBatch micro-batch source may no longer be replayable.
    */
  def persist(level: StorageLevel): this.type = {
    shards.persist(level)
    this
  }

  def unpersist(blocking: Boolean = false): Unit = {
    shards.unpersist(blocking)
    swapQPrep(null)
    synchronized {
      if (q8ShardsRef != null) { q8ShardsRef.unpersist(blocking); q8ShardsRef = null }
    }
  }

  /** INT8 sibling of `shards` — the quantized copy of each shard's
    * UNIT matrix, persisted as codes ONLY (the packedQ8Buckets trade:
    * +25% shard memory buys a 4× cheaper beam). A derived PERSISTED
    * RDD, not a lazy field on the shard (round-18 review): a task
    * reading a shard partition non-locally deserializes a fresh
    * HnswShard, so a @transient-lazy copy would re-run the full-slab
    * quantize once per remote fetch — up to qparts times per shard per
    * packed call. NOT persisted as (shard, codes) PAIRS (ADVICE r18):
    * a pair cache re-stores the full fp32 slab + graph beside the
    * codes — double the storage accounting, a disk spill serializes
    * the fp32 shard twice, and eviction pressure lands on the very
    * caches the codes exist to protect. [[q8Shards]] re-pairs codes
    * with shards lazily via zipPartitions — narrow, co-located with
    * both caches, no third copy of anything. An eviction recomputes
    * exactly one lost codes partition from its shard. Derived on the
    * first hnsw-filtered+q8 query, so only that strategy pays the
    * memory; never serialized into the [[HnswIO]] snapshot (re-derived
    * deterministically from the units). norms stay null deliberately:
    * the graph walks unit rows, so the dequantized dot IS the cosine
    * estimate.
    */
  @volatile private var q8ShardsRef: RDD[graft.core.Q8Block[K]] = null

  private def q8Codes(): RDD[graft.core.Q8Block[K]] = {
    val cur = q8ShardsRef
    if (cur != null) cur
    else synchronized {
      if (q8ShardsRef == null) {
        val derived = shards.map { sh =>
          graft.core.Q8Store.quantize(
            new VecBlock[K](sh.block.ids, sh.unit, sh.block.dim, null))
        }.setName("graft.hnsw.q8shards")
          .persist(StorageLevel.MEMORY_AND_DISK)
        derived.count()
        q8ShardsRef = derived
      }
      q8ShardsRef
    }
  }

  /** (shard, codes) pairs for the q8 beam paths: a lazy partition-wise
    * zip of the two caches — 1:1 by construction (q8Codes is a narrow
    * map of shards), with an explicit out-of-step guard because
    * Iterator.zip would silently DROP a trailing shard instead of
    * failing loudly.
    */
  private def q8Shards(): RDD[(HnswShard[K], graft.core.Q8Block[K])] =
    shards.zipPartitions(q8Codes(), preservesPartitioning = true) { (a, b) =>
      new Iterator[(HnswShard[K], graft.core.Q8Block[K])] {
        def hasNext: Boolean = {
          val l = a.hasNext; val r = b.hasNext
          require(l == r,
            "hnsw q8 codes cache out of step with the shard cache")
          l
        }
        def next(): (HnswShard[K], graft.core.Q8Block[K]) = (a.next(), b.next())
      }
    }

  /** [[searchPacked]]'s per-call packed-query cache — latest call only,
    * the IvfIndex.lastFullScanQPrep discipline (VERDICT r14 wrong #1):
    * a new call (or this store's unpersist) releases the previous
    * slab, so repeated Dataset-query batches hold one cached query RDD,
    * not an unbounded trail. A previous call's still-lazy result DF
    * recomputes its prep from lineage — correct, one re-pack slower.
    */
  @volatile private var lastQPrep: RDD[_] = null

  private def swapQPrep(next: RDD[_]): Unit = {
    val prev = lastQPrep
    lastQPrep = next
    if (prev != null && (prev ne next)) prev.unpersist(false)
  }

  /** Force the build; returns (total rows, shard count). */
  def materialize(): (Long, Int) = {
    val counts = shards.map(_.block.rows.toLong).collect()
    // executor copies of lineage-only broadcasts (rebuildTouched's
    // dirty set — ADVICE r16) are safe to free once every shard is
    // materialized; unpersist not destroy, so an evicted kept shard
    // recomputing through its lineage just re-fetches from the driver
    val rel = releaseOnMaterialize
    releaseOnMaterialize = Nil
    rel.foreach(_.unpersist(false))
    (counts.sum, counts.length)
  }

  // broadcast handles referenced only by this store's shard lineage,
  // freed from executors at the first materialize() (see above);
  // without this each incremental refresh would leak a broadcast of
  // up to graft.hnsw.incr.cap ids for the life of the store
  @volatile private[operators] var releaseOnMaterialize:
    List[org.apache.spark.broadcast.Broadcast[_]] = Nil

  /** Store dimension (one tiny job on first use; empty store → -1). */
  lazy val dim: Int =
    shards.map(_.block.dim).take(1).headOption.getOrElse(-1)

  /** Persist every shard (slab + graph topology) under `path` as an
    * immutable pointer-flipped snapshot; [[HnswStore.load]] restores
    * it with ZERO graph rebuilds (the build is the dominant cost this
    * persistence exists to amortize — see [[HnswIO]]). Returns the
    * snapshot dir.
    */
  def save(path: String): String = HnswIO.save(this, path)

  /** Segment-style incremental maintenance — the distributed analog of
    * the reference's incremental index adds (O26): new rows become NEW
    * shards, so only the new rows pay graph construction and existing
    * shards (and their persist state) are untouched. [[searchMerged]]
    * is shard-count-agnostic, so the returned store sees the union
    * immediately. Repeated small appends accumulate small graphs whose
    * per-query entry overhead grows with shard count — fold them with
    * [[compact]] when that taxes the fan-out (the Lucene segment-merge
    * pattern). The new shards are persisted here; `unpersist()` on the
    * RETURNED store releases only the union handle — release the
    * source stores through their own handles.
    */
  def append(rdd: RDD[(K, Array[Float])], numShards: Int = 0): HnswStore[K] = {
    val extra = HnswStore.fromRDD(spark, rdd, normalize = normalized,
      assumeNormalized = false, m = m, efConstruction = efConstruction,
      numShards = numShards)
    extra.persist()
    new HnswStore[K](spark, shards.union(extra.shards), normalized,
      m, efConstruction)
  }

  /** Re-pack every row into fresh slab-sized shards and rebuild their
    * graphs — O(N·log N) construction total but perfectly parallel
    * (one build per slab task). Exact-mode results are unchanged
    * (spec-pinned: packing is scoring-order-free); graph recall
    * typically improves over a long append tail (fewer, larger
    * graphs). Rows pass through byte-identically: unit slabs re-pack
    * under `assumeNormalized`, cosine slabs re-pack raw with norms
    * recomputed by the same arithmetic.
    */
  def compact(numShards: Int = 0,
              maxBlockFloats: Int = BlockStore.MaxBlockFloats): HnswStore[K] = {
    val rows = shards.flatMap { sh =>
      val b = sh.block
      val d = b.dim
      Iterator.tabulate(b.rows) { r =>
        (b.ids(r),
          java.util.Arrays.copyOfRange(b.data, r * d, (r + 1) * d))
      }
    }
    // numShards=0 folds to the cluster's parallelism — inheriting the
    // union's partitioning would rebuild the same fragmented layout
    val target =
      if (numShards > 0) numShards else shards.sparkContext.defaultParallelism
    HnswStore.fromRDD(spark, rows, normalize = false,
      assumeNormalized = normalized, m = m, efConstruction = efConstruction,
      numShards = target, maxBlockFloats = maxBlockFloats)
  }

  /** Shard-local invalidation — the reference's incremental index
    * maintenance (pico_vdb.py:195-204, 866-921,
    * test_task36_faiss_incremental_threshold.py) done the distributed
    * way: shards containing NO touched id keep their graphs (and their
    * persist state flows through untouched — the union references the
    * same cached shard objects), and ONLY the touched shards' rows +
    * the mutated rows pay graph construction.
    *
    * `dirty` is every id upserted or deleted since this store was
    * built; `changed` is the CURRENT row of each dirty id that still
    * exists (deleted ids simply absent). Surviving rows of touched
    * shards re-extract from the shard slabs themselves (byte-identical
    * floats, the [[compact]] convention), so the only store-scale work
    * is an id scan over the persisted shards — nothing full-store
    * shuffles; the one repartition moves just the repacked rows
    * (bounded by the caller's incremental threshold). The repack
    * target is slab-sized: `ceil(repackRows / rowsPerSlab)` partitions,
    * so a one-row update of a loaded store rebuilds exactly ONE graph
    * ([[graft.core.Hnsw.buildsInJvm]]-pinned in HnswPersistSpec).
    *
    * The returned store is UNPERSISTED (its kept shards still read
    * through this store's cache): persist + materialize it BEFORE
    * unpersisting this store, or the kept graphs rebuild from lineage.
    */
  def rebuildTouched(dirty: Set[K], changed: RDD[(K, Array[Float])],
      maxBlockFloats: Int = BlockStore.MaxBlockFloats): HnswStore[K] = {
    if (dirty.isEmpty) return this
    val sc = shards.sparkContext
    val bc = sc.broadcast(dirty)
    val keep = shards.filter { sh =>
      val d = bc.value
      !sh.block.ids.exists(d.contains)
    }
    val survivors = shards.filter { sh =>
      val d = bc.value
      sh.block.ids.exists(d.contains)
    }.flatMap { sh =>
      val d = bc.value
      val b = sh.block
      val dm = b.dim
      Iterator.tabulate(b.rows) { r =>
        (b.ids(r), java.util.Arrays.copyOfRange(b.data, r * dm, (r + 1) * dm))
      }.filterNot(row => d.contains(row._1))
    }
    val repack = survivors.union(changed)
    val nRows = repack.count()
    if (nRows == 0) {
      val out = new HnswStore[K](spark, keep, normalized, m, efConstruction)
      out.releaseOnMaterialize = List(bc)
      return out
    }
    val rowDim = repack.map(_._2.length).take(1).head
    val rowsPerSlab = math.max(1, maxBlockFloats / math.max(1, rowDim))
    val nPart = math.max(1L, (nRows + rowsPerSlab - 1) / rowsPerSlab).toInt
    val extra = HnswStore.fromRDD(spark, repack.repartition(nPart),
      normalize = false, assumeNormalized = normalized,
      m = m, efConstruction = efConstruction, maxBlockFloats = maxBlockFloats)
    val out = new HnswStore[K](spark, keep.union(extra.shards), normalized,
      m, efConstruction)
    out.releaseOnMaterialize = List(bc)
    out
  }

  /** Batch top-k as one shuffle-free job, the [[graft.core.BlockStore.topKMerged]]
    * shape: broadcast the query matrix, per-shard bounded heaps, merge
    * up a treeAggregate, rank on the driver (Q×k rows).
    *
    * `exact=true` ignores the graphs and scores every row with the
    * sequential-double arithmetic of the declarative path
    * (BlockStore.scoreBlock) — exact by construction, so the standard
    * DuckDB top-k oracle hash-matches; this pins the shard packing,
    * merge and ranking plumbing. `exact=false` runs the per-shard HNSW
    * beam search at `ef` (recall grows with ef; the graph path is
    * approximate — no oracle, recall-floor invariants instead).
    *
    * Cosine mode (un-normalized store): exact scores are
    * dot/(|q|·|v|) via the stored norms; the graph path normalizes the
    * query ONCE on the driver and traverses unit rows, so its scores
    * are the same cosine up to float32 rounding.
    */
  def searchMerged(queries: Array[(Long, Array[Float])], k: Int,
                   ef: Int = 64, exact: Boolean = false)(
      implicit outEnc: org.apache.spark.sql.Encoder[(Long, K, Double, Int)])
      : DataFrame = {
    // mis-dimensioned queries fail loudly (ADVICE r13): in exact mode
    // dotPackedD iterates q.length over the packed slab, so a short
    // query would silently score row PREFIXES and a long one would read
    // into the next row — the IvfIndex.search contract, same wording
    val d = dim
    if (d > 0) queries.foreach { case (qid, v) =>
      require(v.length == d,
        s"HnswStore.searchMerged: query $qid has dim ${v.length}, store dim is $d")
    }
    val (qids, qvecs, qnorms, qunits) =
      HnswStore.prepQueries(queries, normalized, exact)
    val bc = shards.sparkContext.broadcast((qvecs, qnorms, qunits))
    val kk = k
    val efk = math.max(ef, k)
    val ex = exact
    val localOrd = ord
    val merged =
      try {
        shards.treeAggregate(null: Array[BoundedTopKG[K]])(
          seqOp = (acc, shard) => {
            val (qv, qn, qu) = bc.value
            val heaps = if (acc != null) acc
                        else Array.fill(qv.length)(new BoundedTopKG[K](kk)(localOrd))
            HnswStore.scoreShard(heaps, shard, qv, qn, qu, kk, efk, ex)
            heaps
          },
          combOp = (a, b) =>
            if (a == null) b
            else if (b == null) a
            else {
              var i = 0
              while (i < a.length) { a(i).absorb(b(i)); i += 1 }
              a
            },
          depth = 2)
      } finally bc.destroy()
    val rows: Seq[(Long, K, Double, Int)] =
      if (merged == null) Seq.empty
      else merged.iterator.zipWithIndex.flatMap { case (h, i) =>
        h.sortedHits().iterator.take(kk).zipWithIndex.map {
          case ((id, s), r) => (qids(i), id, s, r + 1)
        }
      }.toSeq
    spark.createDataset(rows)(outEnc).toDF("qid", "id", "score", "rank")
  }

  /** Exact member-scan fallbacks the most recent [[searchMergedMember]]
    * call's shards performed (one count per (query, shard) whose
    * filtered beam exhausted its component under k accepted rows —
    * see the underfill proof in [[HnswStore.scoreShardMember]]). 0 =
    * every shard filled every query from its graph; grows as the
    * filter gets selective relative to shard size — the
    * lastFilteredPasses analog for the graph strategy.
    */
  @volatile private var lastMemberWideningsVar: Long = 0L
  def lastMemberFallbackScans: Long = lastMemberWideningsVar

  /** Membership-filtered batch top-k (round 17) — the graph-strategy
    * twin of [[graft.operators.IvfIndex.searchMergedAllowed]], closing
    * the last strategy×filter combination that fell back to the
    * per-call exact repack scan. The filter ships as ONE broadcast
    * [[graft.core.MemberTest]] (exact allow/deny set or Bloom — the
    * caller owns Bloom FP verification + refill, as in the IVF twin)
    * and applies at beam RESULT collection inside each shard's graph
    * ([[graft.core.Hnsw.searchFiltered]] — the FAISS
    * `SearchParametersHNSW.sel` shape: traversal never skips nodes, so
    * selective filters cannot disconnect the walk; the beam instead
    * keeps expanding until ef ACCEPTED rows are in hand, the
    * searchMergedAllowed adaptive-widening analog built into the walk
    * itself). A (query, shard) whose beam STILL underfills k has
    * provably exhausted its entry component (see the proof in
    * [[HnswStore.scoreShardMember]]) and snaps to the exact member
    * scan over the slab ([[graft.core.BlockStore.scoreBlockMember]])
    * — so a query returns fewer than k rows ONLY when the filtered
    * store holds fewer than k rows, the exact path's contract.
    * `exact = true` (or `ef >= every shard's rows`) makes the whole
    * call the exact filtered scan — scoring arithmetic identical to
    * [[searchMerged]]`(exact = true)` over the member rows, which is
    * what the q89 oracle hash-matches.
    *
    * Scale terms: one bounded/constant membership broadcast, one
    * depth-2 treeAggregate (shards × Q × k heap traffic — identical
    * to [[searchMerged]]), zero shuffles, zero repacks: the per-call
    * O(matches) candidate repack of the exact filtered path — the
    * scale cliff this twin removes — never happens; filtering rides
    * the CACHED shard slabs.
    */
  def searchMergedMember(queries: Array[(Long, Array[Float])], k: Int,
                         member: graft.core.MemberTest[K], deny: Boolean,
                         ef: Int = 64, exact: Boolean = false)(
      implicit outEnc: org.apache.spark.sql.Encoder[(Long, K, Double, Int)])
      : DataFrame = {
    val d = dim
    if (d > 0) queries.foreach { case (qid, v) =>
      require(v.length == d,
        s"HnswStore.searchMergedMember: query $qid has dim ${v.length}, store dim is $d")
    }
    val (qids, qvecs, qnorms, qunits) =
      HnswStore.prepQueries(queries, normalized, exact)
    if (queries.isEmpty || (member.matchesNothing && !deny)) {
      lastMemberWideningsVar = 0L
      return spark.createDataset(Seq.empty[(Long, K, Double, Int)])(outEnc)
        .toDF("qid", "id", "score", "rank")
    }
    val sc = shards.sparkContext
    val widen = sc.longAccumulator("graft.hnsw.member.fallback.scans")
    val bc = sc.broadcast((qvecs, qnorms, qunits, member, deny))
    val kk = k
    val efk = math.max(ef, k)
    val ex = exact
    val localOrd = ord
    val localCt = ct // bound locally so the closure doesn't capture `this`
    val merged =
      try {
        shards.treeAggregate(null: Array[BoundedTopKG[K]])(
          seqOp = (acc, shard) => {
            val (qv, qn, qu, mem, dny) = bc.value
            val heaps = if (acc != null) acc
                        else Array.fill(qv.length)(new BoundedTopKG[K](kk)(localOrd))
            HnswStore.scoreShardMember(heaps, shard, qv, qn, qu, kk, efk,
              ex, mem, dny, widen)(localCt)
            heaps
          },
          combOp = (a, b) =>
            if (a == null) b
            else if (b == null) a
            else {
              var i = 0
              while (i < a.length) { a(i).absorb(b(i)); i += 1 }
              a
            },
          depth = 2)
      } finally bc.destroy()
    lastMemberWideningsVar = widen.value
    val rows: Seq[(Long, K, Double, Int)] =
      if (merged == null) Seq.empty
      else merged.iterator.zipWithIndex.flatMap { case (h, i) =>
        h.sortedHits().iterator.take(kk).zipWithIndex.map {
          case ((id, s), r) => (qids(i), id, s, r + 1)
        }
      }.toSeq
    spark.createDataset(rows)(outEnc).toDF("qid", "id", "score", "rank")
  }

  /** Dataset-query twin of [[searchMergedMember]] (round 17) — the
    * [[searchPacked]] shape with the membership filter pushed into
    * each (query slab × graph shard) pair's beam searches (and the
    * same underfill → exact-member-scan snap), so bulk pipelines
    * whose query batch is a TABLE get the graph rung too. Same
    * persisted-store precondition as [[searchPacked]] (an uncached
    * shard RDD would rebuild every graph per query partition), same
    * reduction topology, and bit-identical to [[searchMergedMember]]
    * at the same (k, ef, exact) — spec-pinned.
    */
  def searchPackedMember(queries: Dataset[(Long, Array[Float])], k: Int,
                         member: graft.core.MemberTest[K], deny: Boolean,
                         ef: Int = 64, exact: Boolean = false)(
      implicit outEnc: org.apache.spark.sql.Encoder[(Long, K, Double, Int)])
      : DataFrame = {
    val kk = k
    val efk = math.max(ef, k)
    val ex = exact
    val norm = normalized
    val localOrd = ord
    val localCt = ct
    require(HnswStore.effectivelyPersisted(shards),
      "searchPackedMember requires a persisted store (call .persist() and " +
        "materialize once) — every query partition would otherwise " +
        "rebuild every shard graph")
    if (member.matchesNothing && !deny) {
      lastMemberWideningsVar = 0L
      return spark.createDataset(Seq.empty[(Long, K, Double, Int)])(outEnc)
        .toDF("qid", "id", "score", "rank")
    }
    val sc = shards.sparkContext
    val widen = sc.longAccumulator("graft.hnsw.member.fallback.scans")
    val bcMem = sc.broadcast((member, deny))
    val qblocks = queries.rdd.mapPartitionsWithIndex { (pi, it) =>
      val arr = it.toArray
      if (arr.isEmpty) Iterator.empty
      else Iterator((pi, HnswStore.prepQueries(arr, norm, ex)))
    }.setName("graft.hnsw.qprep").persist(StorageLevel.MEMORY_AND_DISK)
    swapQPrep(qblocks)
    qblocks.count()
    materialize()
    val partials = qblocks.cartesian(shards).map {
      case ((pi, (qids, qvecs, qnorms, qunits)), shard) =>
        val (mem, dny) = bcMem.value
        val heaps =
          Array.fill(qids.length)(new BoundedTopKG[K](kk)(localOrd))
        HnswStore.scoreShardMember(heaps, shard, qvecs, qnorms, qunits,
          kk, efk, ex, mem, dny, widen)(localCt)
        (pi, (qids, heaps))
    }
    val merged = partials.reduceByKey { (x, y) =>
      val a = x._2; val b = y._2
      var i = 0
      while (i < a.length) { a(i).absorb(b(i)); i += 1 }
      x
    }
    val rows = merged.flatMap { case (_, (qids, heaps)) =>
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        h.sortedHits().iterator.take(kk).zipWithIndex.map {
          case ((id, s), r) => (qids(qi), id, s, r + 1)
        }
      }
    }.setName("graft.hnsw.member.out")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize eagerly so the fallback telemetry (an accumulator,
    // populated only by task execution) is current when this returns —
    // the review-r17 stale-counter fix; the output is Q × k rows
    rows.count()
    lastMemberWideningsVar = widen.value
    swapQPrep(rows) // latest-call slot: qblocks superseded, rows cached
    spark.createDataset(rows)(outEnc).toDF("qid", "id", "score", "rank")
  }

  /** The int8 composition of [[searchMergedMember]] (round 18 — VERDICT
    * r17 missing #3): each shard's filtered beam walks the graph over
    * an INT8-quantized copy of its unit slab
    * ([[graft.core.Hnsw.searchFilteredQ8]] — 4× less traversal
    * bandwidth, derived lazily per shard and cached with it), keeps
    * `k × overfetch` accepted survivors, and rescores them against the
    * co-resident fp32 slab with the exact engine's double arithmetic —
    * the `searchMergedQ8Allowed` candidate-generation/rescore split,
    * graph-style. Same membership rungs/polarity, underfill →
    * exact-member-scan snap (the component-exhaustion proof carries:
    * quantized sims reorder the walk, never terminate it under `ef`
    * accepted), treeAggregate topology and telemetry as the fp32 twin.
    * At a store-covering `ef` the quantized MEMBER SCAN keeps the int8
    * machinery in the loop (no silent fp32 reroute), and with covering
    * overfetch every member row is a candidate — the result is the
    * exact filtered top-k (double-accumulated), which the q102 catalog
    * entry hash-matches. Bloom callers own verification + refill, as
    * everywhere.
    */
  def searchMergedMemberQ8(queries: Array[(Long, Array[Float])], k: Int,
                           member: graft.core.MemberTest[K], deny: Boolean,
                           ef: Int = 64, overfetch: Int = 4)(
      implicit outEnc: org.apache.spark.sql.Encoder[(Long, K, Double, Int)])
      : DataFrame = {
    val d = dim
    if (d > 0) queries.foreach { case (qid, v) =>
      require(v.length == d,
        s"HnswStore.searchMergedMemberQ8: query $qid has dim ${v.length}, store dim is $d")
    }
    val (qids, qvecs, qnorms, qunits) =
      HnswStore.prepQueries(queries, normalized, exact = false)
    if (queries.isEmpty || (member.matchesNothing && !deny)) {
      lastMemberWideningsVar = 0L
      return spark.createDataset(Seq.empty[(Long, K, Double, Int)])(outEnc)
        .toDF("qid", "id", "score", "rank")
    }
    val sc = shards.sparkContext
    val widen = sc.longAccumulator("graft.hnsw.member.fallback.scans")
    val bc = sc.broadcast((qvecs, qnorms, qunits, member, deny))
    val kk = k
    val efk = math.max(ef, k)
    val scanK = math.min(math.max(k.toLong * math.max(1, overfetch), k.toLong),
      Int.MaxValue.toLong).toInt
    val localOrd = ord
    val localCt = ct
    val merged =
      try {
        q8Shards().treeAggregate(null: Array[BoundedTopKG[K]])(
          seqOp = (acc, pair) => {
            val (qv, qn, qu, mem, dny) = bc.value
            val heaps = if (acc != null) acc
                        else Array.fill(qv.length)(new BoundedTopKG[K](kk)(localOrd))
            HnswStore.scoreShardMemberQ8(heaps, pair._1, pair._2, qv, qn, qu,
              kk, efk, scanK, mem, dny, widen)(localCt, localOrd)
            heaps
          },
          combOp = (a, b) =>
            if (a == null) b
            else if (b == null) a
            else {
              var i = 0
              while (i < a.length) { a(i).absorb(b(i)); i += 1 }
              a
            },
          depth = 2)
      } finally bc.destroy()
    lastMemberWideningsVar = widen.value
    val rows: Seq[(Long, K, Double, Int)] =
      if (merged == null) Seq.empty
      else merged.iterator.zipWithIndex.flatMap { case (h, i) =>
        h.sortedHits().iterator.take(kk).zipWithIndex.map {
          case ((id, s), r) => (qids(i), id, s, r + 1)
        }
      }.toSeq
    spark.createDataset(rows)(outEnc).toDF("qid", "id", "score", "rank")
  }

  /** Dataset-query twin of [[searchMergedMemberQ8]] (round 18) — the
    * [[searchPackedMember]] topology with the int8 beam + fp32 rescore
    * per (query slab × shard) pair; bit-identical to the merged twin
    * at the same (k, ef, overfetch) — spec-pinned. Same persisted-store
    * precondition and latest-call query-prep cache as every packed
    * entry point.
    */
  def searchPackedMemberQ8(queries: Dataset[(Long, Array[Float])], k: Int,
                           member: graft.core.MemberTest[K], deny: Boolean,
                           ef: Int = 64, overfetch: Int = 4)(
      implicit outEnc: org.apache.spark.sql.Encoder[(Long, K, Double, Int)])
      : DataFrame = {
    val kk = k
    val efk = math.max(ef, k)
    val scanK = math.min(math.max(k.toLong * math.max(1, overfetch), k.toLong),
      Int.MaxValue.toLong).toInt
    val norm = normalized
    val localOrd = ord
    val localCt = ct
    require(HnswStore.effectivelyPersisted(shards),
      "searchPackedMemberQ8 requires a persisted store (call .persist() and " +
        "materialize once) — every query partition would otherwise " +
        "rebuild every shard graph")
    if (member.matchesNothing && !deny) {
      lastMemberWideningsVar = 0L
      return spark.createDataset(Seq.empty[(Long, K, Double, Int)])(outEnc)
        .toDF("qid", "id", "score", "rank")
    }
    val sc = shards.sparkContext
    val widen = sc.longAccumulator("graft.hnsw.member.fallback.scans")
    val bcMem = sc.broadcast((member, deny))
    val qblocks = queries.rdd.mapPartitionsWithIndex { (pi, it) =>
      val arr = it.toArray
      if (arr.isEmpty) Iterator.empty
      else Iterator((pi, HnswStore.prepQueries(arr, norm, exact = false)))
    }.setName("graft.hnsw.qprep").persist(StorageLevel.MEMORY_AND_DISK)
    swapQPrep(qblocks)
    qblocks.count()
    materialize()
    val partials = qblocks.cartesian(q8Shards()).map {
      case ((pi, (qids, qvecs, qnorms, qunits)), (shard, q8)) =>
        val (mem, dny) = bcMem.value
        val heaps =
          Array.fill(qids.length)(new BoundedTopKG[K](kk)(localOrd))
        HnswStore.scoreShardMemberQ8(heaps, shard, q8, qvecs, qnorms, qunits,
          kk, efk, scanK, mem, dny, widen)(localCt, localOrd)
        (pi, (qids, heaps))
    }
    val merged = partials.reduceByKey { (x, y) =>
      val a = x._2; val b = y._2
      var i = 0
      while (i < a.length) { a(i).absorb(b(i)); i += 1 }
      x
    }
    val rows = merged.flatMap { case (_, (qids, heaps)) =>
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        h.sortedHits().iterator.take(kk).zipWithIndex.map {
          case ((id, s), r) => (qids(qi), id, s, r + 1)
        }
      }
    }.setName("graft.hnsw.member.q8.out")
      .persist(StorageLevel.MEMORY_AND_DISK)
    rows.count()
    lastMemberWideningsVar = widen.value
    swapQPrep(rows)
    spark.createDataset(rows)(outEnc).toDF("qid", "id", "score", "rank")
  }

  /** Dataset-query twin of [[searchMerged]] — the gemmQueries shape,
    * for query tables beyond driver memory: each query partition packs
    * ONCE (persisted + materialized before the cartesian stage, so the
    * first task wave doesn't race to re-pack it — the r6 lesson),
    * every (query slab × graph shard) pair runs its beam searches (or
    * the exact scoreBlock) into bounded heaps, heaps absorb per query
    * partition in a reduceByKey, and ranked rows come out. Shuffle
    * volume O(qparts × shards × k) candidate heaps — no pruning exists
    * to exploit (a graph store probes every shard by design; IVF's
    * searchPacked prunes to probed buckets instead). The packed query
    * cache is bounded to the latest call (see [[lastQPrep]]).
    *
    * Bit-identical to [[searchMerged]] at the same (k, ef, exact) —
    * the per-(query, shard) work and the merge tie rule are the same
    * code; only the reduction topology differs (spec-pinned).
    */
  def searchPacked(queries: Dataset[(Long, Array[Float])], k: Int,
                   ef: Int = 64, exact: Boolean = false)(
      implicit outEnc: org.apache.spark.sql.Encoder[(Long, K, Double, Int)])
      : DataFrame = {
    val kk = k
    val efk = math.max(ef, k)
    val ex = exact
    val norm = normalized
    val localOrd = ord
    // hard precondition, not gemmQueries' "caller's choice": an
    // uncached BlockStore merely re-PACKS per query partition, but an
    // uncached shard RDD re-runs the HNSW GRAPH BUILD (the dominant
    // cost — ~6 s per 100k rows) once per query partition in the
    // cartesian below (review r13)
    require(HnswStore.effectivelyPersisted(shards),
      "searchPacked requires a persisted store (call .persist() and " +
        "materialize once) — every query partition would otherwise " +
        "rebuild every shard graph")
    val qblocks = queries.rdd.mapPartitionsWithIndex { (pi, it) =>
      val arr = it.toArray
      if (arr.isEmpty) Iterator.empty
      else Iterator((pi, HnswStore.prepQueries(arr, norm, ex)))
    }.setName("graft.hnsw.qprep").persist(StorageLevel.MEMORY_AND_DISK)
    swapQPrep(qblocks)
    qblocks.count()
    materialize()
    val partials = qblocks.cartesian(shards).map {
      case ((pi, (qids, qvecs, qnorms, qunits)), shard) =>
        val heaps =
          Array.fill(qids.length)(new BoundedTopKG[K](kk)(localOrd))
        HnswStore.scoreShard(heaps, shard, qvecs, qnorms, qunits, kk, efk, ex)
        (pi, (qids, heaps))
    }
    val merged = partials.reduceByKey { (x, y) =>
      val a = x._2; val b = y._2
      var i = 0
      while (i < a.length) { a(i).absorb(b(i)); i += 1 }
      x
    }
    val rows = merged.flatMap { case (_, (qids, heaps)) =>
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        h.sortedHits().iterator.take(kk).zipWithIndex.map {
          case ((id, s), r) => (qids(qi), id, s, r + 1)
        }
      }
    }
    spark.createDataset(rows)(outEnc).toDF("qid", "id", "score", "rank")
  }
}

object HnswStore {

  /** Load a [[HnswStore.save]] snapshot — files to graphs, no rebuild
    * ([[graft.core.Hnsw.buildsInJvm]]-pinned). Unpersisted; callers
    * persist + materialize once before serving.
    */
  def load[K: ClassTag: Ordering](spark: SparkSession, path: String)
      : HnswStore[K] = HnswIO.load[K](spark, path)

  /** Shared query prep (searchMerged + searchPacked): zero -> e0 in
    * normalized mode (the write-time invariant's convention); cosine
    * mode keeps raw vectors + norms for exact scoring and derives unit
    * copies for graph traversal (zero-norm queries stay zero so every
    * sim is 0, matching the exact path's zero-score rule).
    */
  private[operators] def prepQueries(
      queries: Array[(Long, Array[Float])],
      normalized: Boolean,
      exact: Boolean): (Array[Long], Array[Array[Float]], Array[Double],
                        Array[Array[Float]]) = {
    val qids = queries.map(_._1)
    val qvecs = queries.map { q =>
      val v = q._2
      if (normalized && Kernels.normSqD(v) == 0.0) {
        val e = new Array[Float](math.max(1, v.length)); e(0) = 1f; e
      } else v
    }
    val qnorms: Array[Double] =
      if (normalized) null else qvecs.map(v => math.sqrt(Kernels.normSqD(v)))
    val qunits: Array[Array[Float]] =
      if (normalized || exact) qvecs
      else qvecs.zipWithIndex.map { case (v, i) =>
        val n = qnorms(i)
        if (n == 0.0) v
        else {
          val out = new Array[Float](v.length)
          val inv = 1.0 / n
          var j = 0
          while (j < v.length) { out(j) = (v(j) * inv).toFloat; j += 1 }
          out
        }
      }
    (qids, qvecs, qnorms, qunits)
  }

  /** True when querying `rdd` recomputes no shard: either it is
    * persisted itself, or it is a union whose constituents all are. A
    * `UnionRDD` reports `StorageLevel.NONE` even when every parent is
    * persisted (its partitions just delegate) — so `append()` results
    * and the streaming segment view were wrongly rejected by a plain
    * storage-level check (ADVICE r13).
    */
  private[graft] def effectivelyPersisted(rdd: RDD[_]): Boolean =
    rdd.getStorageLevel != StorageLevel.NONE ||
      (rdd.isInstanceOf[org.apache.spark.rdd.UnionRDD[_]] &&
        rdd.dependencies.nonEmpty &&
        rdd.dependencies.forall(d => effectivelyPersisted(d.rdd)))

  /** One shard's contribution to every query's heap: the exact
    * sequential-double scoreBlock, or one beam search per query.
    * Validates every query's dimension against the SHARD dim
    * (executor-side — covers the Dataset-query path, whose queries
    * never materialize on the driver; ADVICE r13).
    */
  private[operators] def scoreShard[K](
      heaps: Array[BoundedTopKG[K]],
      shard: HnswShard[K],
      qvecs: Array[Array[Float]],
      qnorms: Array[Double],
      qunits: Array[Array[Float]],
      k: Int, ef: Int, exact: Boolean): Unit = {
    val d = shard.block.dim
    var vi = 0
    while (vi < qvecs.length) {
      require(qvecs(vi).length == d,
        s"HnswStore: query dim ${qvecs(vi).length} != store dim $d — " +
          "a truncated dot product would silently score row prefixes")
      vi += 1
    }
    if (exact) {
      BlockStore.scoreBlock(heaps, shard.block, qvecs, qnorms,
        Double.NegativeInfinity, exact = true)
    } else {
      val ids = shard.block.ids
      var qi = 0
      while (qi < qunits.length) {
        val hits = shard.graph.search(qunits(qi), k, ef)
        var h = 0
        while (h < hits.length) {
          heaps(qi).offer(hits(h)._2, ids(hits(h)._1))
          h += 1
        }
        qi += 1
      }
    }
  }

  /** One shard's contribution to every query's heap under a
    * membership filter — see [[HnswStore!.searchMergedMember]]. In
    * exact mode (or when the beam already covers the slab) this IS the
    * exact member scan; otherwise each query runs the filtered beam
    * search, snapping to the exact member scan on underfill (see the
    * component-exhaustion proof inline) — so a shard under-reports a
    * query only when it truly holds fewer than k member rows.
    */
  private[operators] def scoreShardMember[K](
      heaps: Array[BoundedTopKG[K]],
      shard: HnswShard[K],
      qvecs: Array[Array[Float]],
      qnorms: Array[Double],
      qunits: Array[Array[Float]],
      k: Int, ef: Int, exact: Boolean,
      member: graft.core.MemberTest[K], deny: Boolean,
      widen: org.apache.spark.util.LongAccumulator)(
      implicit ct: ClassTag[K]): Unit = {
    val d = shard.block.dim
    var vi = 0
    while (vi < qvecs.length) {
      require(qvecs(vi).length == d,
        s"HnswStore: query dim ${qvecs(vi).length} != store dim $d — " +
          "a truncated dot product would silently score row prefixes")
      vi += 1
    }
    val rows = shard.block.rows
    if (exact || ef >= rows) {
      BlockStore.scoreBlockMember(heaps, shard.block, qvecs, qnorms,
        member, deny, exact)
    } else {
      val ids = shard.block.ids
      val accept = (i: Int) => member.contains(ids(i)) != deny
      var qi = 0
      while (qi < qunits.length) {
        val hits = shard.graph.searchFiltered(qunits(qi), k, ef, accept)
        if (hits.length >= k) {
          var h = 0
          while (h < hits.length) {
            heaps(qi).offer(hits(h)._2, ids(hits(h)._1))
            h += 1
          }
        } else {
          // underfill proof: searchFiltered's early-exit requires
          // ef accepted nodes in hand, so with FEWER the walk ran the
          // frontier dry — the entire entry component was visited and
          // holds < k accepted nodes. Re-walking at a wider ef would
          // visit the same set; only the exact member scan can add
          // rows (members outside the component), so snap straight to
          // it. This is the completeness half of the contract: a shard
          // under-reports a query only when it truly holds < k member
          // rows.
          if (widen != null) widen.add(1L)
          val qv = Array(qvecs(qi))
          val qn = if (qnorms == null) null else Array(qnorms(qi))
          BlockStore.scoreBlockMember(Array(heaps(qi)), shard.block,
            qv, qn, member, deny, exact)
        }
        qi += 1
      }
    }
  }

  /** One shard's contribution under a membership filter with the INT8
    * traversal composition — see [[HnswStore!.searchMergedMemberQ8]].
    * At a covering beam (`ef >=` shard rows) the quantized MEMBER SCAN
    * over the shard's int8 unit slab replaces the walk (keeping the
    * compressed tier in the covering-parity path, the q84/q95 rule),
    * with ONE fused fp32 double rescore of the `scanK` survivors from
    * the co-resident slab; otherwise each query runs the int8 filtered
    * beam collecting up to `scanK` accepted survivors (beam widened to
    * `max(ef, scanK)` — the candidate cut needs that many accepted in
    * hand) and rescores them in double, snapping to the exact member
    * scan on component exhaustion exactly like [[scoreShardMember]].
    * All scores leaving this method are double-accumulated (rescore or
    * exact snap), the quantized tiers' arithmetic contract.
    */
  private[operators] def scoreShardMemberQ8[K](
      heaps: Array[BoundedTopKG[K]],
      shard: HnswShard[K],
      q8: graft.core.Q8Block[K],
      qvecs: Array[Array[Float]],
      qnorms: Array[Double],
      qunits: Array[Array[Float]],
      k: Int, ef: Int, scanK: Int,
      member: graft.core.MemberTest[K], deny: Boolean,
      widen: org.apache.spark.util.LongAccumulator)(
      implicit ct: ClassTag[K], ord: Ordering[K]): Unit = {
    import graft.core.Q8Store
    val d = shard.block.dim
    var vi = 0
    while (vi < qvecs.length) {
      require(qvecs(vi).length == d,
        s"HnswStore: query dim ${qvecs(vi).length} != store dim $d — " +
          "a truncated dot product would silently score row prefixes")
      vi += 1
    }
    val rows = shard.block.rows
    val ids = shard.block.ids
    if (ef >= rows) {
      // covering beam: int8 member scan (unit rows, so qnorms = null —
      // the dequantized dot IS the cosine estimate) + fused rescore
      val scanHeaps =
        Array.fill(qunits.length)(new BoundedTopKG[K](scanK)(ord))
      Q8Store.scoreBlockMember(scanHeaps, q8, qunits, null, member, deny)
      val cands = Q8Store.CandIndex.build[K](scanHeaps.map(_.sortedHits()))
      Q8Store.rescoreBlock(heaps, shard.block, cands, qvecs, qnorms)
    } else {
      val accept = (i: Int) => member.contains(ids(i)) != deny
      val data = shard.block.data
      val vnorms = shard.block.norms
      var qi = 0
      while (qi < qunits.length) {
        val hits = shard.graph.searchFilteredQ8(qunits(qi), scanK,
          math.max(ef, scanK), accept, q8.codes, q8.scales)
        if (hits.length >= k) {
          // fp32 double rescore of the <= scanK survivors (exact-path
          // arithmetic: unit dot, or raw/raw over the stored norms)
          var h = 0
          while (h < hits.length) {
            val node = hits(h)._1
            var s = Kernels.dotPackedD(qvecs(qi), data, node * d)
            if (vnorms != null) {
              val qn = qnorms(qi)
              val vn = vnorms(node)
              s = if (qn == 0.0 || vn == 0.0) 0.0 else s / (qn * vn)
            }
            heaps(qi).offer(s, ids(node))
            h += 1
          }
        } else {
          // component exhausted (the scoreShardMember proof carries —
          // int8 sims reorder the walk, never end it under ef
          // accepted); exact=true matches the double rescore arithmetic
          if (widen != null) widen.add(1L)
          val qv = Array(qvecs(qi))
          val qn = if (qnorms == null) null else Array(qnorms(qi))
          BlockStore.scoreBlockMember(Array(heaps(qi)), shard.block,
            qv, qn, member, deny, exact = true)
        }
        qi += 1
      }
    }
  }

  /** Pack (id, vector) rows into slab-sized shards and build one HNSW
    * graph per shard — each build runs inside its own task, so shard
    * builds parallelize across the cluster. `numShards > 0` repartitions
    * first (round-robin) to set build parallelism / graph size;
    * otherwise input partitioning decides (one graph per ≤128 MB slab).
    *
    * `normalize=true` applies the write-time L2 invariant while packing
    * (graphs share the slab matrix); `assumeNormalized=true` for rows
    * already unit-length; both false = cosine mode (raw slab + norms
    * for the exact path, a unit copy for the graph).
    */
  def fromDataset[K: ClassTag: Ordering](
      ds: Dataset[(K, Array[Float])],
      normalize: Boolean,
      assumeNormalized: Boolean = false,
      m: Int = 16,
      efConstruction: Int = 100,
      numShards: Int = 0,
      maxBlockFloats: Int = BlockStore.MaxBlockFloats): HnswStore[K] =
    fromRDD(ds.sparkSession, ds.rdd, normalize, assumeNormalized,
      m, efConstruction, numShards, maxBlockFloats)

  def fromRDD[K: ClassTag: Ordering](
      spark: SparkSession,
      rdd0: RDD[(K, Array[Float])],
      normalize: Boolean,
      assumeNormalized: Boolean = false,
      m: Int = 16,
      efConstruction: Int = 100,
      numShards: Int = 0,
      maxBlockFloats: Int = BlockStore.MaxBlockFloats): HnswStore[K] = {
    val rdd = if (numShards > 0) rdd0.repartition(numShards) else rdd0
    val mm = m
    val efc = efConstruction
    val norm = normalize
    val assume = assumeNormalized
    val mbf = maxBlockFloats
    val shards = rdd.mapPartitions { it =>
      BlockStore.packPartition[K](it, norm, assume, mbf).map { block =>
        val unit = unitOf(block)
        new HnswShard[K](block, unit,
          Hnsw.build(unit, block.rows, block.dim, mm, efc))
      }
    }
    new HnswStore[K](spark, shards, norm || assume, m, efConstruction)
  }

  /** Unit-row matrix for graph traversal over `block`: the slab itself
    * when rows carry the write-time L2 invariant (norms == null), else
    * a normalized copy derived with the NormalizeL2 conventions
    * (zero row -> e0). Deterministic from the block alone — the shard
    * codec ([[HnswIO]]) re-derives it on load instead of persisting a
    * second float matrix.
    */
  private[operators] def unitOf[K](block: VecBlock[K]): Array[Float] =
    if (block.norms == null) block.data // already unit rows
    else {
      val dim = block.dim
      val out = new Array[Float](block.data.length)
      var r = 0
      while (r < block.rows) {
        val n = block.norms(r)
        val off = r * dim
        if (n == 0.0) {
          // zero row -> e0, the NormalizeL2 write-time convention
          if (dim > 0) out(off) = 1f
        } else {
          val inv = 1.0 / n
          var j = 0
          while (j < dim) {
            out(off + j) = (block.data(off + j) * inv).toFloat
            j += 1
          }
        }
        r += 1
      }
      out
    }

  // per-dataset store cache (amortizes repeated catalog/bench runs),
  // same SessionLru policy as IvfIndex.cached
  private val cache = new graft.core.SessionLru[String, HnswStore[Long]](
    4, _.spark, _.unpersist())

  def cached(key: String)(mk: => HnswStore[Long]): HnswStore[Long] =
    cache.getOrBuild(key)(mk)
}
