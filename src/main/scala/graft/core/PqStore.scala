package graft.core

import scala.reflect.ClassTag
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel
import graft.functions.NormalizeL2
import graft.operators.LocalKMeans

/** Trained product-quantization codebook: `m` subspaces of `dsub`
  * dims each, `ksub` centroids per subspace (k-means on a bounded
  * content-hashed sample — same determinism contract as
  * `IvfIndex.fitCentroids`). `centroids` is flat row-major:
  * `((sub * ksub) + code) * dsub + t`. The whole codebook is
  * `dim * ksub` floats — ~1 MB at 1024-d/256 codes — broadcast once
  * and shared by every encode and every query table build.
  */
final class PqCodebook(
    val dim: Int,
    val m: Int,
    val ksub: Int,
    val centroids: Array[Float]) extends Serializable {
  require(dim % m == 0, s"PQ subspace count m=$m must divide dim=$dim")
  // codes are ONE byte per subspace: encodeRow stores the centroid
  // index with .toByte and every reader widens with & 0xFF, so
  // ksub > 256 would silently wrap indices modulo 256 — wrong scores,
  // no exception (adcTable/decodeRow are sized by the real ksub)
  require(ksub >= 1 && ksub <= 256,
    s"PQ codebook ksub must be in [1, 256] (one byte per code), got $ksub")
  val dsub: Int = dim / m

  /** Nearest-centroid code per subspace (squared-L2 argmin, first-win
    * ties) for row `rowOff` of a packed float matrix.
    */
  def encodeRow(data: Array[Float], rowOff: Int,
                out: Array[Byte], outOff: Int): Unit = {
    var sub = 0
    while (sub < m) {
      val vOff = rowOff + sub * dsub
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < ksub) {
        val cOff = (sub * ksub + j) * dsub
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val diff = data(vOff + t) - centroids(cOff + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(outOff + sub) = best.toByte
      sub += 1
    }
  }

  /** Asymmetric-distance table for one query: `T[sub*ksub + code] =
    * dot(q_sub, centroid_{sub,code})`, so a row's approximate dot
    * product is `m` table lookups + adds — no float math per row at
    * scan time. `m * ksub` floats (16 KB at m=16/ksub=256).
    */
  def adcTable(q: Array[Float]): Array[Float] = {
    require(q.length == dim,
      s"query dim ${q.length} != codebook dim $dim")
    val tab = new Array[Float](m * ksub)
    var sub = 0
    while (sub < m) {
      val qOff = sub * dsub
      var j = 0
      while (j < ksub) {
        val cOff = (sub * ksub + j) * dsub
        var s = 0f
        var t = 0
        while (t < dsub) { s += q(qOff + t) * centroids(cOff + t); t += 1 }
        tab(sub * ksub + j) = s
        j += 1
      }
      sub += 1
    }
    tab
  }

  /** Decode one code row back to its reconstruction (spec/debug use). */
  def decodeRow(codes: Array[Byte], codeOff: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var sub = 0
    while (sub < m) {
      val cOff = (sub * ksub + (codes(codeOff + sub) & 0xFF)) * dsub
      System.arraycopy(centroids, cOff, out, sub * dsub, dsub)
      sub += 1
    }
    out
  }
}

/** One product-quantized segment: `m` bytes per row instead of
  * `4 * dim` — 256x smaller than the float32 slab at 1024-d/m=16
  * (64 B vs 4 KB at m=64). `norms` carries the ORIGINAL rows' double
  * L2 norms in cosine mode, null for unit-normalized stores (same
  * contract as [[Q8Block]]).
  */
final class PqBlock[K](
    val ids: Array[K],
    val codes: Array[Byte],
    val m: Int,
    val norms: Array[Double]) extends Serializable {
  def rows: Int = ids.length
}

/** Product-quantized vector store (IVF-PQ's compression half, FAISS
  * `IndexPQ` analog): each row is `m` one-byte codes into per-subspace
  * k-means codebooks, so the candidate-generation scan reads `m` bytes
  * per row instead of `4 * dim` — a 16-256x cut in resident footprint
  * and scan traffic where [[Q8Store]]'s int8 cut is a fixed 4x. At
  * 100 TB of raw 1024-d embeddings the PQ codes (m=64) are ~1.6 TB:
  * the difference between "the candidate scan fits in cluster RAM"
  * and "it doesn't". Queries score by asymmetric distance (ADC): one
  * `m * ksub`-float lookup table per query (built once per task from
  * the broadcast codebook), then each row is `m` table lookups + adds.
  *
  * Scan scores are approximate (codebook reconstruction error); exact
  * ranking comes from [[rescoredTopK]], which re-scores only the
  * surviving `k * overfetch` candidates per query against the
  * co-resident full-precision store with the exact engine's arithmetic
  * — the same candidate-generation/rescore split as [[Q8Store]], and
  * the two stores share the rescore machinery verbatim
  * ([[Q8Store.rescoreCandidates]]). With full overfetch the result is
  * bit-equal to the exact engine (the catalog's oracled q79); with
  * small overfetch the recall cost is measured, not guessed (recall
  * floor on q78, bench `pq_*` rows).
  *
  * Scale shape: training is one bounded content-hashed sample
  * (N-independent driver k-means, the `IvfIndex.fitCentroids`
  * pattern); encoding is one map over the packed blocks (no shuffle,
  * codebook broadcast); the scan is the same shuffle-free
  * treeAggregate as [[BlockStore.topKMerged]]; the rescore touches
  * fp32 bytes only for the O(Q*k*overfetch*dim) candidate hits,
  * independent of N.
  */
final class PqStore[K](
    val codebook: PqCodebook,
    val blocks: RDD[PqBlock[K]],
    val normalized: Boolean,
    val source: BlockStore[K])(implicit ct: ClassTag[K], ord: Ordering[K]) {

  /** Persist the code blocks — and, when `cascadeSource` (the default)
    * and the retained fp32 `source` is not already persisted, the
    * source blocks too ([[rescoredTopK]] streams `source` per call; an
    * unpersisted source would recompute its pack lineage every rescore
    * — the Q8Store ADVICE r11 lesson).
    */
  def persist(cascadeSource: Boolean = true): this.type = {
    blocks.persist(StorageLevel.MEMORY_ONLY)
    if (cascadeSource &&
        source.blocks.getStorageLevel == StorageLevel.NONE)
      source.blocks.persist(StorageLevel.MEMORY_ONLY)
    this
  }

  def unpersist(blocking: Boolean = false,
                cascadeSource: Boolean = false): Unit = {
    blocks.unpersist(blocking)
    if (cascadeSource) source.blocks.unpersist(blocking)
    // LatestCallSlot teardown (see Q8Store.unpersist)
    packedSlot.swap(Nil)
  }

  /** Force the build; returns total row count. */
  def materialize(): Long =
    blocks.map(_.rows.toLong).fold(0L)(_ + _)

  /** ADC-scan batch top-k: per-task query tables from the broadcast
    * codebook, per-partition bounded heaps merged up a treeAggregate
    * (the [[BlockStore.topKMerged]] shape). Scores are approximate
    * (PQ reconstruction); use [[rescoredTopK]] when exact ranking
    * matters. Batches whose per-task tables (`nq * m * ksub * 4`
    * bytes) would exceed `graft.pq.table.budget.mb` split into
    * sequential scan chunks — identical results, bounded task memory
    * (the same rule as `IvfIndex.searchMergedPq`; spec-pinned there
    * and in PqStoreSpec here).
    */
  def topKMerged(
      queries: Array[(Long, Array[Float])],
      k: Int,
      normalizeQueries: Boolean = true): Array[Array[(K, Double)]] = {
    val cosineMode = !normalized
    val qvecs: Array[Array[Float]] =
      if (cosineMode || !normalizeQueries) queries.map(_._2)
      else queries.map(q => NormalizeL2.normalize(q._2))
    val qnorms: Array[Double] =
      if (cosineMode) qvecs.map(v => math.sqrt(graft.operators.Kernels.normSqD(v)))
      else null
    val cb = codebook
    val kk = k
    val localOrd = ord
    val nq = queries.length
    val bytesPerQuery = cb.m.toLong * cb.ksub.toLong * 4L
    // budget from the session that OWNS these blocks — in a
    // multi-session JVM the thread-active session may belong to
    // someone else, and letting their graft.pq.table.budget.mb govern
    // THIS store's chunking would be silent cross-tenant config bleed.
    // Ownership is established by SparkContext identity (sessions of
    // other contexts can't own this RDD); a driver thread with no
    // matching session gets the 64 MB default rather than an
    // IllegalStateException on a scan path that previously had no
    // session dependency.
    val budgetMb = org.apache.spark.sql.SparkSession.getActiveSession
      .filter(_.sparkContext eq blocks.sparkContext)
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession
        .filter(_.sparkContext eq blocks.sparkContext))
      .map(s => new GraftConf(s).pqTableBudgetMb)
      .getOrElse(64)
    val budgetBytes = budgetMb.toLong << 20
    val chunkSize = math.max(1,
      math.min(Int.MaxValue.toLong,
        budgetBytes / math.max(1L, bytesPerQuery)).toInt)
    val out = new Array[Array[(K, Double)]](nq)
    // the codebook is loop-invariant: ship it once, not per chunk
    val bcCb = blocks.sparkContext.broadcast(cb)
    try {
    var start = 0
    while (start < nq) {
      val end = math.min(nq, start + chunkSize)
      val qvChunk = java.util.Arrays.copyOfRange(qvecs, start, end)
      val qnChunk =
        if (qnorms == null) null
        else java.util.Arrays.copyOfRange(qnorms, start, end)
      val bc = blocks.sparkContext.broadcast((qvChunk, qnChunk))
      try {
        val merged = blocks.treeAggregate(null: PqStore.PqAcc[K])(
          seqOp = (acc, block) => {
            val (qs, qn) = bc.value
            val cbk = bcCb.value
            val a =
              if (acc != null) acc
              else {
                // ADC tables built ONCE per task, amortized over every
                // block the task scans (m*ksub floats per query)
                val tabs = new Array[Array[Float]](qs.length)
                var i = 0
                while (i < qs.length) { tabs(i) = cbk.adcTable(qs(i)); i += 1 }
                new PqStore.PqAcc[K](
                  Array.fill(qs.length)(new BoundedTopKG[K](kk)(localOrd)), tabs)
              }
            PqStore.scoreBlock(a.heaps, a.tables, cbk.ksub, block, qn)
            a
          },
          combOp = (a, b) =>
            if (a == null) b
            else if (b == null) a
            else {
              var i = 0
              while (i < a.heaps.length) { a.heaps(i).absorb(b.heaps(i)); i += 1 }
              a
            },
          depth = 2)
        var i = start
        while (i < end) {
          out(i) =
            if (merged == null) Array.empty[(K, Double)]
            else merged.heaps(i - start).sortedHits()
          i += 1
        }
      } finally bc.destroy()
      start = end
    }
    } finally bcCb.destroy()
    out
  }

  /** Exact-ranked top-k through the PQ scan: the ADC scan keeps
    * `min(k * overfetch, storeRows)` candidates per query
    * (`overfetch <= 0` = keep ALL — the exact-parity setting: no
    * candidate can be lost, so the rescore IS the exact result), then
    * the candidates re-score in full precision with the exact engine's
    * arithmetic via the machinery [[Q8Store]] and this store share
    * ([[Q8Store.rescoreCandidates]]): one stream of the co-resident
    * fp32 blocks, O(1) id-hash probe per row, float traffic only for
    * the Q x cap hits. Output matches `Q8Store.rescoredTopK`:
    * (qid, id, score, rank), duplicate qids merged.
    */
  def rescoredTopK(
      queries: Array[(Long, Array[Float])],
      k: Int,
      overfetch: Int,
      normalizeQueries: Boolean = true)(implicit
      rowEnc: org.apache.spark.sql.Encoder[(Long, K, Double, Int)]): DataFrame = {
    val qs =
      if (normalized && normalizeQueries)
        queries.map { case (qid, v) => (qid, NormalizeL2.normalize(v)) }
      else queries
    val total = materialize()
    val cap =
      if (overfetch <= 0) {
        require(total <= Int.MaxValue.toLong,
          s"pq keep-all rescore needs an Int candidate cap but the store has " +
            s"$total rows; use overfetch > 0 (bounded candidates) at this size")
        total.toInt
      } else
        math.min(math.min(k.toLong * overfetch, math.max(total, 1L)),
          Int.MaxValue.toLong).toInt
    val approx = topKMerged(qs, cap, normalizeQueries = false)
    Q8Store.rescoreCandidates(source, total, approx, qs, k, normalized)
  }

  // latest-call-only cache for the bulk engine's materialized output
  private val packedSlot = new LatestCallSlot

  /** Bulk (Dataset-query) twin of [[rescoredTopK]] (round 18): the ADC
    * candidate scan + co-resident fp32 rescore over a query TABLE —
    * the flat-pq entry in the tier × {driver-batch, Dataset} matrix
    * (see [[PackedScan]]; oracled as q99). ADC tables are per-query
    * `m * ksub` floats built INSIDE each (query slab × code block)
    * scan task, chunked to `graft.pq.table.budget.mb` exactly like the
    * driver-batch scan — bounded task memory, the table build repeated
    * per code block (the [[graft.operators.IvfIndex.searchPackedPq]]
    * trade, documented there: amortized over the block's rows at slab
    * sizes). The codebook ships once as a broadcast, not per task
    * closure.
    */
  def rescoredTopKPacked(
      queries: org.apache.spark.sql.Dataset[(Long, Array[Float])],
      k: Int,
      overfetch: Int,
      normalizeQueries: Boolean = true,
      dim: Int = -1)(implicit
      rowEnc: org.apache.spark.sql.Encoder[(Long, K, Double, Int)]): DataFrame = {
    val bcCb = blocks.sparkContext.broadcast(codebook)
    // driver-side budget resolution (GraftConf is driver-only), same
    // owner-session rule as topKMerged
    val budgetMb = org.apache.spark.sql.SparkSession.getActiveSession
      .filter(_.sparkContext eq blocks.sparkContext)
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession
        .filter(_.sparkContext eq blocks.sparkContext))
      .map(s => new GraftConf(s).pqTableBudgetMb)
      .getOrElse(64)
    val bytesPerQuery = codebook.m.toLong * codebook.ksub.toLong * 4L
    val chunkSize = math.max(1,
      math.min(Int.MaxValue.toLong,
        (budgetMb.toLong << 20) / math.max(1L, bytesPerQuery)).toInt)
    try PackedScan.rescoredTopKPacked[K, PqBlock[K], Null](
      blocks, source, queries, k, overfetch, normalized, normalizeQueries,
      dim,
      prep = _ => null,
      scan = (heaps, b, qvecs, qnorms, _) => {
        val cb = bcCb.value
        var start = 0
        while (start < qvecs.length) {
          val end = math.min(qvecs.length, start + chunkSize)
          val tabs = new Array[Array[Float]](end - start)
          var i = start
          while (i < end) { tabs(i - start) = cb.adcTable(qvecs(i)); i += 1 }
          val subH = java.util.Arrays.copyOfRange(heaps, start, end)
          val subN =
            if (qnorms == null) null
            else java.util.Arrays.copyOfRange(qnorms, start, end)
          PqStore.scoreBlock(subH, tabs, cb.ksub, b, subN)
          start = end
        }
      },
      slot = packedSlot)
    // unpersist, not destroy: the materialized output's lineage still
    // references the broadcast — an evicted partition recomputing on a
    // real cluster re-fetches it from the driver
    finally bcCb.unpersist(false)
  }
}

object PqStore {

  /** Per-task ADC accumulator: the per-query heaps plus the per-query
    * lookup tables (built once on the task's first block). `tables` is
    * `@transient` — combOp only merges heaps, and WITHOUT the marker
    * every partition would serialize its Q x m x ksub floats of tables
    * (64 MB at the 1000q/m=64 headline — ~2 GB across 32 partitions)
    * up the treeAggregate: measured 9.7 s -> sub-second scan for the
    * identical result. seqOp only ever runs on task-local accs (null
    * start), so a deserialized null `tables` is never read.
    */
  private[graft] final class PqAcc[K](
      val heaps: Array[BoundedTopKG[K]],
      @transient val tables: Array[Array[Float]]) extends Serializable

  /** Train a codebook and encode a packed float store block-by-block:
    * one bounded content-hashed sample + driver k-means per subspace
    * (N-independent, deterministic for a given (data, m, seed) — the
    * `IvfIndex.fitCentroids` sampling/canonical-order contract), then
    * one map over the blocks with the codebook broadcast. No shuffle,
    * no driver traffic beyond the sample. Original row norms are
    * preserved for cosine mode so quantization error never touches the
    * norm denominator.
    */
  def fromBlockStore[K](bs: BlockStore[K], m: Int,
      ksub: Int = 256, sampleCap: Int = 20000, seed: Long = 42L,
      maxIter: Int = 8)(implicit
      ct: ClassTag[K], ord: Ordering[K]): PqStore[K] =
    fromCodebook(bs, train(bs, m, ksub, sampleCap, seed, maxIter))

  /** Encode a packed store under an ALREADY-trained codebook (the
    * persistence/maintenance path: a restored or carried-over codebook
    * re-encodes mutated rows without paying the driver k-means again —
    * codebooks are data-distribution state, not row state, exactly like
    * IVF centroids under `IvfIndex.assign`).
    */
  def fromCodebook[K](bs: BlockStore[K], cb: PqCodebook)(implicit
      ct: ClassTag[K], ord: Ordering[K]): PqStore[K] = {
    val bcb = bs.blocks.sparkContext.broadcast(cb)
    val codeBlocks = bs.blocks.map { b => encode(bcb.value, b) }
    // bcb stays alive with the (lazy, possibly re-computed) code-block
    // lineage; the ContextCleaner reclaims it with the RDD.
    new PqStore[K](cb, codeBlocks, bs.normalized, bs)
  }

  /** JVM-wide codebook-train counter — test instrumentation for the
    * persistence specs (the `Hnsw.buildsInJvm` pattern): a restored
    * store answering PQ queries must not bump it.
    */
  val trainsInJvm = new java.util.concurrent.atomic.AtomicLong(0L)

  /** The fit half of [[fromBlockStore]]: content-hash Bernoulli sample
    * (membership a function of the DATA only — run- and layout-
    * independent), canonical lexicographic order, then an independent
    * seeded k-means per subspace slice.
    */
  def train[K](bs: BlockStore[K], m: Int, ksub: Int,
               sampleCap: Int, seed: Long, maxIter: Int): PqCodebook = {
    val total = bs.blocks.map(_.rows.toLong).fold(0L)(_ + _)
    require(total > 0, "cannot train a PQ codebook on an empty store")
    val thr = sampleThreshold(total, sampleCap)
    val s = seed
    val sampled: Array[Array[Float]] = bs.blocks.flatMap { b =>
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
      val dim = b.dim
      var r = 0
      while (r < b.rows) {
        if (rowHash(b.data, r * dim, dim, s) < thr) {
          val row = new Array[Float](dim)
          System.arraycopy(b.data, r * dim, row, 0, dim)
          out += row
        }
        r += 1
      }
      out.iterator
    }.collect()
    require(sampled.nonEmpty,
      s"PQ sample came back empty (total=$total, cap=$sampleCap)")
    trainOnRows(sampled, m, ksub, seed, maxIter)
  }

  /** Auto subspace count for a store dimension: 8-dim subspaces when
    * they divide evenly, else 4-dim — the ONE sizing rule shared by
    * `VdbStore.enablePq`, `IvfIndex.searchMergedPq`, and
    * `IvfIndex.searchPackedPq` (a drift here would silently produce
    * incompatible codebooks/caches between the store and IVF tiers).
    */
  def autoM(dim: Int): Int = {
    require(dim % 4 == 0,
      s"auto PQ sizing needs dim % 4 == 0 (dim=$dim); pass m explicitly")
    if (dim % 8 == 0) math.max(1, dim / 8) else math.max(1, dim / 4)
  }

  /** Bernoulli acceptance threshold for [[rowHash]] draws targeting
    * ~`sampleCap` of `total` rows.
    */
  private[graft] def sampleThreshold(total: Long, sampleCap: Int): Long =
    if (total <= sampleCap) 1L << 32
    else ((sampleCap.toDouble / total) * (1L << 32)).toLong

  /** K-means half of [[train]], on an already-collected sample (the
    * IVF-PQ residual path collects its own sample — residuals against
    * each row's assigned centroid — then trains here). Canonicalizes
    * the sample order internally, so callers need not sort.
    */
  private[graft] def trainOnRows(sampled: Array[Array[Float]], m: Int,
      ksub: Int, seed: Long, maxIter: Int): PqCodebook = {
    trainsInJvm.incrementAndGet()
    require(sampled.nonEmpty, "cannot train a PQ codebook on an empty sample")
    val dim = sampled(0).length
    require(dim % m == 0, s"PQ subspace count m=$m must divide dim=$dim")
    val dsub = dim / m
    // canonical init order regardless of collect order (the
    // fitCentroids determinism fix)
    java.util.Arrays.sort(sampled, new java.util.Comparator[Array[Float]] {
      def compare(a: Array[Float], b: Array[Float]): Int = {
        var i = 0
        val n = math.min(a.length, b.length)
        while (i < n) {
          val c = java.lang.Float.compare(a(i), b(i))
          if (c != 0) return c
          i += 1
        }
        Integer.compare(a.length, b.length)
      }
    })
    val kk = math.min(ksub, sampled.length)
    val cents = new Array[Float](m * kk * dsub)
    // The m subspace fits are INDEPENDENT (each k-means sees only its
    // own dsub-wide slice, seeds as seed + sub, and writes a disjoint
    // cents range), so they run PARALLEL across subspaces (round 22:
    // the sequential loop dominated the PQ build rows — at m=64 the
    // per-fit work is too fine-grained for LocalKMeans' internal
    // point-parallelism to fill the machine, its seeding rounds and
    // mean accumulations are sequential by design). Every fit is
    // bit-deterministic for its (slice, kk, seed + sub) regardless of
    // scheduling — LocalKMeans' own determinism contract — so the
    // trained codebook is BIT-IDENTICAL to the sequential loop's.
    java.util.stream.IntStream.range(0, m).parallel().forEach { sub =>
      val slice: Array[Array[Double]] = sampled.map { row =>
        val d = new Array[Double](dsub)
        var t = 0
        while (t < dsub) { d(t) = row(sub * dsub + t).toDouble; t += 1 }
        d
      }
      // sequential point loops inside the fit: this loop already
      // saturates the machine across subspaces, and nested parallel
      // streams only add fork-join overhead (see LocalKMeans.fit)
      val fitted = LocalKMeans.fit(slice, kk, maxIter, seed + sub,
        pointParallel = false)
      var j = 0
      while (j < fitted.length) {
        var t = 0
        while (t < dsub) {
          cents((sub * kk + j) * dsub + t) = fitted(j)(t).toFloat
          t += 1
        }
        j += 1
      }
    }
    new PqCodebook(dim, m, kk, cents)
  }

  /** FNV/splitmix content hash of one packed row -> uniform [0, 2^32). */
  private[graft] def rowHash(data: Array[Float], off: Int, dim: Int,
                             seed: Long): Long = {
    var h = seed ^ 0x9E3779B97F4A7C15L
    var i = 0
    while (i < dim) {
      h = (h ^ java.lang.Float.floatToRawIntBits(data(off + i))) * 0x100000001B3L
      i += 1
    }
    h ^= h >>> 33
    h *= 0xFF51AFD7ED558CCDL
    h ^= h >>> 33
    h >>> 32
  }

  private[graft] def encode[K](cb: PqCodebook, b: VecBlock[K]): PqBlock[K] = {
    require(b.dim == cb.dim,
      s"block dim ${b.dim} != codebook dim ${cb.dim}")
    val rows = b.rows
    val codes = new Array[Byte](rows * cb.m)
    var r = 0
    while (r < rows) {
      cb.encodeRow(b.data, r * b.dim, codes, r * cb.m)
      r += 1
    }
    new PqBlock[K](b.ids, codes, cb.m, b.norms)
  }

  /** Encode a block's RESIDUALS against one coarse centroid (the IVF-PQ
    * composition: codes quantize `v - c_cid`, which is much smaller
    * than `v` inside a bucket, so the same `m x ksub` code budget buys
    * far finer resolution). Residuals are materialized as
    * `(v_t - c_t).toFloat` with the centroid in double — the SAME
    * arithmetic the residual training sample uses, so encode and train
    * see identical values.
    */
  private[graft] def encodeResidual[K](cb: PqCodebook, b: VecBlock[K],
      cent: Array[Double]): PqBlock[K] = {
    require(b.dim == cb.dim,
      s"block dim ${b.dim} != codebook dim ${cb.dim}")
    require(cent.length == b.dim,
      s"centroid dim ${cent.length} != block dim ${b.dim}")
    val rows = b.rows
    val d = b.dim
    val codes = new Array[Byte](rows * cb.m)
    val scratch = new Array[Float](d)
    var r = 0
    while (r < rows) {
      val off = r * d
      var t = 0
      while (t < d) { scratch(t) = (b.data(off + t) - cent(t)).toFloat; t += 1 }
      cb.encodeRow(scratch, 0, codes, r * cb.m)
      r += 1
    }
    new PqBlock[K](b.ids, codes, cb.m, b.norms)
  }

  /** Score one code block into the per-query heaps: per row, `m` table
    * lookups + adds against the query's ADC table. Rows are tiled so
    * the code tile (~64 KB) stays cache-resident across the whole
    * query batch; each query's table (m*ksub floats) is L1/L2-sized.
    *
    * `offsets` (null = all-zero): per-query additive constant applied
    * BEFORE any cosine norm division — the residual-encoded IVF-PQ
    * path passes `dot(q, c_cid)` here so the reconstructed score is
    * `dot(q, c) + dot(q, residual)`; the table stays bucket-independent
    * because the residual codebook is shared across buckets (the
    * inner-product advantage over L2's per-bucket tables).
    */
  private[graft] def scoreBlock[K](
      heaps: Array[BoundedTopKG[K]],
      tables: Array[Array[Float]],
      ksub: Int,
      b: PqBlock[K],
      qnorms: Array[Double],
      offsets: Array[Double] = null): Unit = {
    val nq = tables.length
    val cosine = qnorms != null
    val codes = b.codes
    val ids = b.ids
    val m = b.m
    val rows = b.rows
    val vnorms = b.norms
    val tileRows = math.max(1, 65536 / math.max(1, m))
    var t0 = 0
    while (t0 < rows) {
      val tEnd = math.min(t0 + tileRows, rows)
      var qi = 0
      while (qi < nq) {
        val tab = tables(qi)
        val h = heaps(qi)
        val qOff = if (offsets == null) 0.0 else offsets(qi)
        val invQ =
          if (!cosine) 1.0
          else { val qn = qnorms(qi); if (qn == 0.0) 0.0 else 1.0 / qn }
        var r = t0
        while (r < tEnd) {
          val off = r * m
          var s = 0f
          var sub = 0
          var base = 0
          val m4 = m - 3
          while (sub < m4) {
            s += tab(base + (codes(off + sub) & 0xFF)) +
              tab(base + ksub + (codes(off + sub + 1) & 0xFF)) +
              tab(base + 2 * ksub + (codes(off + sub + 2) & 0xFF)) +
              tab(base + 3 * ksub + (codes(off + sub + 3) & 0xFF))
            sub += 4
            base += 4 * ksub
          }
          while (sub < m) {
            s += tab(base + (codes(off + sub) & 0xFF))
            sub += 1
            base += ksub
          }
          var sd = s.toDouble + qOff
          if (cosine) {
            val vn = vnorms(r)
            sd = if (vn == 0.0 || invQ == 0.0) 0.0 else sd * invQ / vn
          }
          h.offer(sd, ids(r))
          r += 1
        }
        qi += 1
      }
      t0 = tEnd
    }
  }
}
