package graft.core

import scala.reflect.ClassTag
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel
import graft.functions.NormalizeL2
import graft.operators.Kernels

/** One int8-quantized segment of the vector store: per-row symmetric
  * scalar quantization (`code = round(v / scale)`, `scale = maxAbs/127`)
  * of a [[VecBlock]] — 4x smaller than the float32 slab at the same row
  * count. `norms` carries the ORIGINAL rows' double L2 norms in cosine
  * mode (un-normalized store), null for unit-normalized stores.
  */
final class Q8Block[K](
    val ids: Array[K],
    val codes: Array[Byte],
    val dim: Int,
    val scales: Array[Float],
    val norms: Array[Double]) extends Serializable {
  def rows: Int = ids.length
}

/** Int8 scalar-quantized vector store (IVF-SQ8-style, FAISS
  * `IndexScalarQuantizer` analog): the candidate-generation scan reads
  * 1 byte per coordinate instead of 4, cutting the store's resident
  * footprint AND the scan's memory traffic 4x — at 100 TB of raw
  * embeddings that is the difference between 25 TB and 100 TB of
  * executor cache. Scores from the scan are approximate (bounded by
  * `scale/2 * sum|q_i|` per row); exact ranking comes from
  * [[rescoredTopK]], which re-scores only the surviving
  * `k * overfetch` candidates per query against the full-precision
  * store with the same double-cosine arithmetic as the exact path —
  * so with full overfetch the result is bit-equal to the exact
  * engine (the catalog's q56 hash-matches the DuckDB oracle through
  * this path), and with small overfetch the recall cost is measured,
  * not guessed (bench `q8_*` rows).
  *
  * Scale shape: quantization is one map over the packed blocks (no
  * shuffle); the scan is the same shuffle-free treeAggregate as
  * [[BlockStore.topKMerged]]; the rescore is a SECOND treeAggregate
  * over the co-resident full-precision blocks (`source`) restricted to
  * the broadcast candidate set — an O(1) id-hash probe per row, with
  * full-precision vector bytes touched ONLY for the
  * Q x k x overfetch candidate hits. No store scan of fp32 data, no
  * shuffle, no join: at 100 TB the rescore's float traffic is
  * O(Q*k*overfetch*dim), independent of N (round-10 verdict item #2 —
  * the previous broadcast-join rescore streamed every fp32 row).
  */
final class Q8Store[K](
    val blocks: RDD[Q8Block[K]],
    val normalized: Boolean,
    val source: BlockStore[K])(implicit ct: ClassTag[K], ord: Ordering[K]) {

  /** Persist the quantized blocks — and, when `cascadeSource` (the
    * default) and the retained fp32 `source` is not already persisted,
    * the source blocks too. [[rescoredTopK]] streams `source`
    * per call: an unpersisted source silently recomputes its full pack
    * lineage every rescore (ADVICE r11), which defeats the store
    * entirely. Pass `cascadeSource = false` only when the caller
    * manages the source's storage itself (e.g. `VdbStore`, whose
    * `blockStore()` persists before handing the source over; the
    * catalog's q8Cache RELIES on the cascade — default persist, and
    * eviction via `unpersist(cascadeSource = true)`).
    */
  def persist(cascadeSource: Boolean = true): this.type = {
    blocks.persist(StorageLevel.MEMORY_ONLY)
    if (cascadeSource &&
        source.blocks.getStorageLevel == StorageLevel.NONE)
      source.blocks.persist(StorageLevel.MEMORY_ONLY)
    this
  }

  /** Release the quantized blocks; `cascadeSource` also releases the
    * fp32 source (only sensible when [[persist]] cascaded or the caller
    * owns both).
    */
  def unpersist(blocking: Boolean = false,
                cascadeSource: Boolean = false): Unit = {
    blocks.unpersist(blocking)
    if (cascadeSource) source.blocks.unpersist(blocking)
    // the LatestCallSlot teardown its scaladoc promises: without this a
    // discarded store instance (version swap, disableQ8) would leak its
    // persisted bulk-output RDD for the SparkContext lifetime
    packedSlot.swap(Nil)
  }

  /** Force the build; returns total row count. */
  def materialize(): Long =
    blocks.map(_.rows.toLong).fold(0L)(_ + _)

  /** Quantized-scan batch top-k: per-partition bounded heaps merged up a
    * treeAggregate (same shuffle-free shape as
    * [[BlockStore.topKMerged]]). Scores are approximate (int8); use
    * [[rescoredTopK]] when exact ranking matters.
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
      if (cosineMode) qvecs.map(v => math.sqrt(Kernels.normSqD(v))) else null
    val bc = blocks.sparkContext.broadcast((qvecs, qnorms))
    val kk = k
    val localOrd = ord
    val nq = queries.length
    try {
      val merged = blocks.treeAggregate(null: Array[BoundedTopKG[K]])(
        seqOp = (acc, block) => {
          val (qs, qn) = bc.value
          val heaps = if (acc != null) acc
                      else Array.fill(qs.length)(new BoundedTopKG[K](kk)(localOrd))
          Q8Store.scoreBlock(heaps, block, qs, qn)
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
      if (merged == null) Array.fill(nq)(Array.empty[(K, Double)])
      else merged.map(_.sortedHits())
    } finally bc.destroy()
  }

  /** Exact-ranked top-k through the quantized scan: the int8 scan keeps
    * `min(k * overfetch, storeRows)` candidates per query
    * (`overfetch <= 0` = keep ALL rows — the exact-parity TEST setting:
    * no candidate can be lost, so the rescore IS the exact result; the
    * production conf path rejects it, see `GraftConf.q8Overfetch`),
    * then the candidates are re-scored in full precision with the same
    * arithmetic as the exact engine — sequential-double `dot_product`
    * for unit-normalized stores, raw/raw double `cosine_sim` in cosine
    * mode — and re-ranked by the same bounded heaps as the exact path.
    *
    * The rescore streams the co-resident fp32 blocks ONCE, probing each
    * row id against a broadcast hash of the Q x cap candidate set;
    * vector bytes are read only on a hit, so full-precision traffic is
    * O(Q*k*overfetch*dim), independent of store size. Nothing shuffles;
    * the per-partition k-heaps merge up a depth-2 treeAggregate exactly
    * like [[BlockStore.topKMerged]].
    *
    * Output matches `IvfIndex.searchDs`: (qid, id, score, rank).
    * Duplicate qids merge into one k-row result (the declarative
    * groupBy, like `searchDs`) — batches needing independent results
    * per duplicate must key them uniquely.
    */
  def rescoredTopK(
      queries: Array[(Long, Array[Float])],
      k: Int,
      overfetch: Int,
      normalizeQueries: Boolean = true)(implicit
      rowEnc: org.apache.spark.sql.Encoder[(Long, K, Double, Int)]): DataFrame = {
    // normalized mode: normalize ONCE up front so the scan and the
    // rescore score the same query values (`source` holds the same
    // normalized rows the packed q8 store was built from); cosine mode
    // scores raw/raw on both sides already
    val qs =
      if (normalized && normalizeQueries)
        queries.map { case (qid, v) => (qid, NormalizeL2.normalize(v)) }
      else queries
    val total = materialize()
    // keep-ALL (overfetch <= 0) needs the whole store in one heap and is
    // the exact-parity TEST setting only — the Int cap is inherent to it.
    // The bounded production path computes its cap in Long and stays
    // N-independent, so it must NOT be rejected on >2.1B-row stores
    // (ADVICE r11).
    val cap =
      if (overfetch <= 0) {
        require(total <= Int.MaxValue.toLong,
          s"q8 keep-all rescore needs an Int candidate cap but the store has " +
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

  /** Bulk (Dataset-query) twin of [[rescoredTopK]] (round 18): the
    * int8 candidate scan + co-resident fp32 rescore for query batches
    * that are themselves a TABLE — the flat-q8 entry in the
    * tier × {driver-batch, Dataset} matrix (see [[PackedScan]] for the
    * shape and the covering-overfetch exactness argument; oracled as
    * q98). `normalizeQueries = false` is the pre-normalized-caller
    * path (VdbStore.queryDF) — zero → e0 still applies. `dim > 0`
    * validates query lengths at pack time. `overfetch` must be
    * positive — keep-all is driver-batch-only by construction.
    */
  def rescoredTopKPacked(
      queries: org.apache.spark.sql.Dataset[(Long, Array[Float])],
      k: Int,
      overfetch: Int,
      normalizeQueries: Boolean = true,
      dim: Int = -1)(implicit
      rowEnc: org.apache.spark.sql.Encoder[(Long, K, Double, Int)]): DataFrame =
    PackedScan.rescoredTopKPacked[K, Q8Block[K], Null](
      blocks, source, queries, k, overfetch, normalized, normalizeQueries,
      dim,
      prep = _ => null,
      scan = (heaps, b, qvecs, qnorms, _) =>
        Q8Store.scoreBlock(heaps, b, qvecs, qnorms),
      slot = packedSlot)
}

object Q8Store {

  /** Quantize a packed float store block-by-block (one map, no shuffle,
    * no driver traffic). Original row norms are preserved for cosine
    * mode so quantization error never touches the norm denominator.
    */
  def fromBlockStore[K](bs: BlockStore[K])(implicit
      ct: ClassTag[K], ord: Ordering[K]): Q8Store[K] =
    new Q8Store[K](bs.blocks.map(quantize[K]), bs.normalized, bs)

  /** The shared exact-rescore half of the quantized stores' candidate-
    * generation/rescore split ([[Q8Store.rescoredTopK]] and
    * [[PqStore.rescoredTopK]] both end here): invert the approximate
    * candidate lists into a broadcast id->queries index, stream the
    * co-resident fp32 `source` blocks ONCE probing each row id (O(1)
    * hash, primitive-long fast path), re-score hits with the exact
    * engine's double arithmetic, merge per-partition k-heaps up a
    * depth-2 treeAggregate, and fold duplicate qids into one k-row
    * result each. Full-precision traffic is O(Q*k*overfetch*dim),
    * independent of store size; nothing shuffles.
    */
  private[graft] def rescoreCandidates[K](
      source: BlockStore[K],
      total: Long,
      approx: Array[Array[(K, Double)]],
      qs: Array[(Long, Array[Float])],
      k: Int,
      normalized: Boolean)(implicit
      ct: ClassTag[K], ord: Ordering[K],
      rowEnc: org.apache.spark.sql.Encoder[(Long, K, Double, Int)]): DataFrame = {
    val spark = SparkSession.active
    // invert the candidate lists: id -> indices of the queries that kept
    // it, via growable buffers (ADVICE r11: per-hit Arrays.copyOf was
    // quadratic when many queries keep the same id) behind a probe
    // interface that avoids per-row key boxing for Long ids
    val candMap = Q8Store.CandIndex.build[K](approx, maxDistinct = total)
    val qvecs = qs.map(_._2)
    val qnorms: Array[Double] =
      if (!normalized) qvecs.map(v => math.sqrt(Kernels.normSqD(v))) else null
    val bc = source.blocks.sparkContext.broadcast((candMap, qvecs, qnorms))
    val kk = k
    val localOrd = ord
    val nEntries = qs.length
    val merged =
      try {
        source.blocks.treeAggregate(null: Array[BoundedTopKG[K]])(
          seqOp = (acc, block) => {
            val (cands, qv, qn) = bc.value
            val heaps = if (acc != null) acc
                        else Array.fill(nEntries)(new BoundedTopKG[K](kk)(localOrd))
            Q8Store.rescoreBlock(heaps, block, cands, qv, qn)
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
    // merge duplicate qids into one k-heap (groupBy-qid semantics of the
    // declarative path), preserving first-appearance order
    val byQid = new java.util.LinkedHashMap[Long, BoundedTopKG[K]]()
    var i = 0
    while (i < nEntries) {
      val qid = qs(i)._1
      var h = byQid.get(qid)
      if (h == null) { h = new BoundedTopKG[K](kk)(localOrd); byQid.put(qid, h) }
      if (merged != null) h.absorb(merged(i))
      i += 1
    }
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, K, Double, Int)]
    val it = byQid.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val hits = e.getValue.sortedHits()
      var r = 0
      while (r < hits.length) {
        rows += ((e.getKey, hits(r)._1, hits(r)._2, r + 1))
        r += 1
      }
    }
    spark.createDataset(rows.toSeq).toDF("qid", "id", "score", "rank")
  }

  /** Rescore one fp32 block against the broadcast candidate set: probe
    * each row id (O(1) hash, no boxing for Long ids — the probe
    * dispatches to the primitive-key index when one was built), and only
    * on a hit read the row's vector to compute the exact double score
    * for each query that kept it — `dotPackedD` (sequential double,
    * DotProduct-expression parity) and in cosine mode the same
    * `dot / (|q| * |v|)` zero-guarded division as `cosine_sim` / the
    * exact engine's scoreBlock.
    */
  private[graft] def rescoreBlock[K](
      heaps: Array[BoundedTopKG[K]],
      b: VecBlock[K],
      cands: CandIndex[K],
      qs: Array[Array[Float]],
      qnorms: Array[Double]): Unit = {
    val cosine = qnorms != null
    val data = b.data
    val ids = b.ids
    val dim = b.dim
    val rows = b.rows
    val vnorms = b.norms
    @inline def scoreHits(r: Int, wanted: IntBuf): Unit = {
      val off = r * dim
      var w = 0
      while (w < wanted.len) {
        val qi = wanted.arr(w)
        var s = Kernels.dotPackedD(qs(qi), data, off)
        if (cosine) {
          val qn = qnorms(qi)
          val vn = vnorms(r)
          s = if (qn == 0.0 || vn == 0.0) 0.0 else s / (qn * vn)
        }
        heaps(qi).offer(s, ids(r))
        w += 1
      }
    }
    cands match {
      case lm: LongCandIndex =>
        // monomorphic primitive-long probe: Array[Long] ids, no boxing
        val lids = ids.asInstanceOf[Array[Long]]
        var r = 0
        while (r < rows) {
          val wanted = lm.getLong(lids(r))
          if (wanted != null) scoreHits(r, wanted)
          r += 1
        }
      case _ =>
        var r = 0
        while (r < rows) {
          val wanted = cands.get(ids(r))
          if (wanted != null) scoreHits(r, wanted)
          r += 1
        }
    }
  }

  /** Growable int list: amortized O(1) append (ADVICE r11 — the per-hit
    * Arrays.copyOf rebuild was quadratic when many queries keep the
    * same candidate id, e.g. near-duplicate query batches).
    */
  private[graft] final class IntBuf extends Serializable {
    var arr: Array[Int] = new Array[Int](4)
    var len: Int = 0
    def add(v: Int): Unit = {
      if (len == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length << 1)
      arr(len) = v
      len += 1
    }
  }

  /** Broadcast candidate index for the rescore pass: id -> indices of
    * the queries whose quantized scan kept that id. Long-keyed stores
    * (the common case: BIGINT ids) get an open-addressing primitive map
    * so the per-row probe in [[rescoreBlock]] never boxes; other key
    * types fall back to a HashMap.
    */
  private[graft] sealed trait CandIndex[K] extends Serializable {
    def get(id: K): IntBuf
  }

  private[graft] final class MapCandIndex[K](
      m: java.util.HashMap[K, IntBuf]) extends CandIndex[K] {
    def get(id: K): IntBuf = m.get(id)
  }

  /** Linear-probing long->IntBuf map; slot occupancy = non-null value
    * (so key 0 needs no sentinel). Capacity fixed at build (power of
    * two, load factor <= 0.5).
    */
  private[graft] final class LongCandIndex(capPow2: Int)
      extends CandIndex[Long] {
    private val mask = capPow2 - 1
    private val keys = new Array[Long](capPow2)
    private val vals = new Array[IntBuf](capPow2)
    @inline private def slot(k: Long): Int = {
      var h = k * -7046029254386353131L // splitmix64 odd multiplier
      h ^= (h >>> 32)
      h.toInt & mask
    }
    private var used = 0
    def add(k: Long, qi: Int): Unit = {
      var i = slot(k)
      while (vals(i) != null && keys(i) != k) i = (i + 1) & mask
      if (vals(i) == null) {
        // full-table guard: without it a capacity-ceiling build would
        // linear-probe forever on the insert that can't fit
        used += 1
        require(used <= mask,
          s"LongCandIndex full: > $mask distinct candidate ids at capacity " +
            s"${mask + 1}; bound the candidate set (overfetch > 0)")
        keys(i) = k
        vals(i) = new IntBuf
      }
      vals(i).add(qi)
    }
    def getLong(k: Long): IntBuf = {
      var i = slot(k)
      while (vals(i) != null) {
        if (keys(i) == k) return vals(i)
        i = (i + 1) & mask
      }
      null
    }
    def get(id: Long): IntBuf = getLong(id)
  }

  private[graft] object CandIndex {
    /** `maxDistinct`: caller-known bound on distinct candidate ids
      * (e.g. the store row count) — without it a keep-all build over Q
      * queries would size the table from Q x N total hits instead of
      * the N distinct ids they share (a ~2Q-times oversized broadcast).
      */
    def build[K](approx: Array[Array[(K, Double)]],
                 maxDistinct: Long = Long.MaxValue): CandIndex[K] = {
      var totalHits = 0L
      var firstId: Any = null
      var qi = 0
      while (qi < approx.length) {
        val hits = approx(qi)
        if (firstId == null && hits.nonEmpty) firstId = hits(0)._1
        totalHits += hits.length
        qi += 1
      }
      if (firstId.isInstanceOf[java.lang.Long]) {
        // capacity: next pow2 >= 2x the distinct-id bound
        val distinctBound = math.min(totalHits, maxDistinct)
        var cap = 16
        while (cap.toLong < distinctBound * 2 && cap < (1 << 30)) cap <<= 1
        val m = new LongCandIndex(cap)
        var q = 0
        while (q < approx.length) {
          val hits = approx(q)
          var h = 0
          while (h < hits.length) {
            m.add(hits(h)._1.asInstanceOf[java.lang.Long].longValue(), q)
            h += 1
          }
          q += 1
        }
        m.asInstanceOf[CandIndex[K]]
      } else {
        val m = new java.util.HashMap[K, IntBuf]()
        var q = 0
        while (q < approx.length) {
          val hits = approx(q)
          var h = 0
          while (h < hits.length) {
            var buf = m.get(hits(h)._1)
            if (buf == null) { buf = new IntBuf; m.put(hits(h)._1, buf) }
            buf.add(q)
            h += 1
          }
          q += 1
        }
        new MapCandIndex(m)
      }
    }
  }

  /** [[scoreBlock]] restricted to rows passing a membership test — the
    * int8 twin of `BlockStore.scoreBlockMember` (round 16 filtered-ANN
    * composition). Survivors compact into a temp Q8Block first so the
    * tiled dequantize-scratch kernels still apply; all-pass blocks skip
    * the copy.
    */
  private[graft] def scoreBlockMember[K](
      heaps: Array[BoundedTopKG[K]],
      b: Q8Block[K],
      qs: Array[Array[Float]],
      qnorms: Array[Double],
      member: MemberTest[K],
      deny: Boolean)(implicit ct: ClassTag[K]): Unit = {
    val rows = b.rows
    val keep = new Array[Int](rows)
    var n = 0
    var r = 0
    while (r < rows) {
      if (member.contains(b.ids(r)) != deny) { keep(n) = r; n += 1 }
      r += 1
    }
    if (n == 0) return
    if (n == rows) {
      scoreBlock(heaps, b, qs, qnorms)
      return
    }
    val dim = b.dim
    val ids2 = new Array[K](n)
    val codes2 = new Array[Byte](n * dim)
    val scales2 = new Array[Float](n)
    val norms2 = if (b.norms == null) null else new Array[Double](n)
    var i = 0
    while (i < n) {
      val src = keep(i)
      ids2(i) = b.ids(src)
      System.arraycopy(b.codes, src * dim, codes2, i * dim, dim)
      scales2(i) = b.scales(src)
      if (norms2 != null) norms2(i) = b.norms(src)
      i += 1
    }
    scoreBlock(heaps, new Q8Block[K](ids2, codes2, dim, scales2, norms2),
      qs, qnorms)
  }

  private[graft] def quantize[K](b: VecBlock[K]): Q8Block[K] = {
    val rows = b.rows
    val dim = b.dim
    val data = b.data
    val codes = new Array[Byte](rows * dim)
    val scales = new Array[Float](rows)
    var r = 0
    while (r < rows) {
      val off = r * dim
      var maxAbs = 0f
      var i = 0
      while (i < dim) {
        val a = math.abs(data(off + i))
        if (a > maxAbs) maxAbs = a
        i += 1
      }
      if (maxAbs > 0f) {
        val scale = maxAbs / 127f
        scales(r) = scale
        val inv = 1f / scale
        var j = 0
        while (j < dim) {
          val c = math.round(data(off + j) * inv)
          codes(off + j) = (if (c > 127) 127 else if (c < -127) -127 else c).toByte
          j += 1
        }
      } // else: scale 0, codes stay 0 -> dot 0
      r += 1
    }
    new Q8Block[K](b.ids, codes, dim, scales, b.norms)
  }

  /** Score one quantized block into the per-query heaps.
    *
    * DRAM streams 1 byte/coordinate (the whole point); compute runs at
    * the float path's FMA rate: each ~128 KB code tile is dequantized
    * ONCE into a 512 KB float scratch (scale applied during the
    * expansion — one multiply per element, amortized over every query
    * in the batch), and the batch then streams the scratch with the
    * same tiled dot4 kernels as [[BlockStore.scoreBlock]]. Direct
    * per-query byte-FMA kernels (`Kernels.dotQ8F`/`dot4Q8F`) measured
    * ~4x slower per element at batch sizes (the B2F convert repeats
    * per query); they remain the right shape only for tiny batches and
    * the error-bound spec.
    */
  private[graft] def scoreBlock[K](
      heaps: Array[BoundedTopKG[K]],
      b: Q8Block[K],
      qs: Array[Array[Float]],
      qnorms: Array[Double]): Unit = {
    val nq = qs.length
    val cosine = qnorms != null
    val codes = b.codes
    val ids = b.ids
    val dim = b.dim
    val rows = b.rows
    val scales = b.scales
    val vnorms = b.norms
    val invQ: Array[Double] =
      if (cosine) qnorms.map(qn => if (qn == 0.0) 0.0 else 1.0 / qn) else null
    val out = new Array[Float](4)
    // 512 KB float scratch per tile (128 KB of codes)
    val tileRows = math.max(1, 524288 / math.max(4, dim * 4))
    val scratch = new Array[Float](math.min(tileRows, rows) * dim)
    var t0 = 0
    while (t0 < rows) {
      val tEnd = math.min(t0 + tileRows, rows)
      val nRows = tEnd - t0
      var dr = 0
      while (dr < nRows) {
        val srcOff = (t0 + dr) * dim
        val dstOff = dr * dim
        val sc = scales(t0 + dr)
        var i = 0
        while (i < dim) { scratch(dstOff + i) = codes(srcOff + i) * sc; i += 1 }
        dr += 1
      }
      var qi = 0
      val nq4 = nq - 3
      while (qi < nq4) {
        val q0 = qs(qi); val q1 = qs(qi + 1); val q2 = qs(qi + 2); val q3 = qs(qi + 3)
        val h0 = heaps(qi); val h1 = heaps(qi + 1); val h2 = heaps(qi + 2); val h3 = heaps(qi + 3)
        var r = 0
        var off = 0
        while (r < nRows) {
          Kernels.dot4PackedF(q0, q1, q2, q3, scratch, off, out)
          val row = t0 + r
          var s0 = out(0).toDouble
          var s1 = out(1).toDouble
          var s2 = out(2).toDouble
          var s3 = out(3).toDouble
          if (cosine) {
            val vn = vnorms(row)
            val inv = if (vn == 0.0) 0.0 else 1.0 / vn
            s0 = s0 * inv * invQ(qi)
            s1 = s1 * inv * invQ(qi + 1)
            s2 = s2 * inv * invQ(qi + 2)
            s3 = s3 * inv * invQ(qi + 3)
          }
          h0.offer(s0, ids(row)); h1.offer(s1, ids(row))
          h2.offer(s2, ids(row)); h3.offer(s3, ids(row))
          r += 1
          off += dim
        }
        qi += 4
      }
      while (qi < nq) {
        val q = qs(qi)
        val h = heaps(qi)
        var r = 0
        var off = 0
        while (r < nRows) {
          val row = t0 + r
          var s = Kernels.dotPackedF(q, scratch, off).toDouble
          if (cosine) {
            val vn = vnorms(row)
            s = if (vn == 0.0) 0.0 else s * invQ(qi) / vn
          }
          h.offer(s, ids(row))
          r += 1
          off += dim
        }
        qi += 1
      }
      t0 = tEnd
    }
  }
}
