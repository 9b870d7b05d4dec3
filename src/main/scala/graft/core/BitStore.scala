package graft.core

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel
import graft.functions.NormalizeL2

import scala.reflect.ClassTag

/** One binary-sketch block: `words` longs per row (`bits` sign bits of
  * random-hyperplane projections, packed little-endian within each
  * long), co-indexed with `ids`. `dim` is the SOURCE row dimension the
  * sketch was taken at — query sketches must use the same hyperplanes,
  * so scans validate it task-side (a mismatched-dim query would
  * otherwise compare codes from different projections and return
  * silent garbage). The row layout mirrors [[Q8Block]]/[[PqBlock]]:
  * row r's code words live at `words * r until words * (r + 1)`.
  */
final class BitBlock[K](
    val ids: Array[K],
    val codes: Array[Long],
    val words: Int,
    val dim: Int) extends Serializable {
  def rows: Int = ids.length
}

/** Binary-sketch tier below PQ (the classic random-hyperplane /
  * SimHash-for-vectors sketch: Charikar 2002, FAISS's `IndexLSH`
  * family): each row is `bits` SIGN bits of fixed seeded random
  * projections — 32 B/row at the default 256 bits, 4x below PQ's
  * m=64 codes, 32x below int8, 128x below fp32 at 256-d. At 100 TB
  * of raw embeddings the sketch set is ~0.8 TB. There is NO training
  * step at all (the hyperplanes are pseudorandom from a seed), so the
  * tier is distribution-free: nothing to retrain on drift, bit codes
  * valid under any mutation. Candidate ranking is Hamming distance
  * (XOR + popcount over longs — branch-free, SIMD-friendly), which
  * estimates the ANGLE between vectors (P[bit differs] = theta/pi),
  * so ranking quality is cosine-aligned by construction and
  * scale-invariant — the same sketch serves normalized and cosine
  * stores. Exact ranking reuses the SHARED fp32 rescore
  * ([[Q8Store.rescoreCandidates]]), so overfetch-all is bit-equal to
  * the exact engine (the q79/q82 contract).
  *
  * Scan scores are the angle estimate `cos(pi * hamming / bits)` —
  * monotone in Hamming, roughly comparable to a cosine, documented
  * approximate. Heavy score ties are inherent (integer Hamming);
  * the shared heap tie rule (id order) keeps results deterministic.
  */
final class BitStore[K](
    val blocks: RDD[BitBlock[K]],
    val bits: Int,
    val seed: Long,
    val normalized: Boolean,
    val source: BlockStore[K])(implicit ct: ClassTag[K], ord: Ordering[K]) {

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

  /** Hamming-scan batch top-k: queries sketch under the SAME seeded
    * hyperplanes, per-partition bounded heaps merged up a
    * treeAggregate (the [[BlockStore.topKMerged]] shape — nothing
    * shuffles). Scores are the angle estimate; use [[rescoredTopK]]
    * when exact ranking matters.
    */
  def topKMerged(
      queries: Array[(Long, Array[Float])],
      k: Int,
      normalizeQueries: Boolean = true): Array[Array[(K, Double)]] = {
    if (queries.isEmpty) return Array.empty
    // sign bits are scale-invariant, so normalization cannot change a
    // query's sketch — skip it entirely (zero vectors sketch to the
    // all-sign-of-zero row either way; the rescore handles exactness)
    val qvecs: Array[Array[Float]] = queries.map(_._2)
    val dim = qvecs(0).length
    queries.foreach { case (qid, v) =>
      require(v.length == dim,
        s"BitStore.topKMerged: query $qid has dim ${v.length}, batch dim is $dim")
    }
    val planes = BitStore.hyperplanes(bits, dim, seed)
    val w = (bits + 63) >>> 6
    val qcodes = new Array[Long](qvecs.length * w)
    java.util.stream.IntStream.range(0, qvecs.length).parallel().forEach { i =>
      BitStore.encodeRow(qvecs(i), 0, dim, planes, bits, qcodes, i * w)
    }
    val bc = blocks.sparkContext.broadcast((qcodes, dim))
    val kk = k
    val localOrd = ord
    val nq = queries.length
    val nBits = bits
    try {
      val merged = blocks.treeAggregate(null: Array[BoundedTopKG[K]])(
        seqOp = (acc, block) => {
          val (qc, qDim) = bc.value
          // mismatched hyperplanes = silent garbage, so fail loudly
          // (the fp32/q8 scans at least crash on the same misuse)
          require(block.dim == qDim,
            s"BitStore scan: query dim $qDim != store sketch dim ${block.dim}")
          val heaps = if (acc != null) acc
                      else Array.fill(qc.length / w)(new BoundedTopKG[K](kk)(localOrd))
          BitStore.scoreBlock(heaps, block, qc, nBits)
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

  /** Exact-ranked top-k through the Hamming scan: keep
    * `min(k * overfetch, storeRows)` candidates per query
    * (`overfetch <= 0` = keep ALL — the exact-parity setting), then
    * rescore in full precision via the machinery all quantized tiers
    * share ([[Q8Store.rescoreCandidates]]). Output:
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
          s"bit keep-all rescore needs an Int candidate cap but the store has " +
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
    * Hamming candidate scan + co-resident fp32 rescore over a query
    * TABLE — the flat-bit entry in the tier × {driver-batch, Dataset}
    * matrix (see [[PackedScan]]; oracled as q100). Query sketches are
    * built ONCE per packed query partition (the `prep` stage — the
    * hyperplane matrix regenerates from the seed inside the pack task,
    * ~1 MB, never shuffled), so the scan streams only code words.
    * Sketch dims are validated against each code block task-side, the
    * [[topKMerged]] rule — mismatched hyperplanes are silent garbage.
    */
  def rescoredTopKPacked(
      queries: org.apache.spark.sql.Dataset[(Long, Array[Float])],
      k: Int,
      overfetch: Int,
      normalizeQueries: Boolean = true,
      dim: Int = -1)(implicit
      rowEnc: org.apache.spark.sql.Encoder[(Long, K, Double, Int)]): DataFrame = {
    val b = bits
    val s = seed
    val w = (bits + 63) >>> 6
    PackedScan.rescoredTopKPacked[K, BitBlock[K], Array[Long]](
      blocks, source, queries, k, overfetch, normalized, normalizeQueries,
      dim,
      prep = qvecs => {
        val d = qvecs(0).length
        val planes = BitStore.hyperplanes(b, d, s)
        val qc = new Array[Long](qvecs.length * w)
        var i = 0
        while (i < qvecs.length) {
          BitStore.encodeRow(qvecs(i), 0, d, planes, b, qc, i * w)
          i += 1
        }
        qc
      },
      scan = (heaps, blk, qvecs, _, qcodes) => {
        require(blk.dim == qvecs(0).length,
          s"BitStore packed scan: query dim ${qvecs(0).length} != store " +
            s"sketch dim ${blk.dim}")
        BitStore.scoreBlock(heaps, blk, qcodes, b)
      },
      slot = packedSlot)
  }
}

object BitStore {

  /** The one hyperplane seed every un-parameterized sketch site uses.
    * The PACK-side sketch and the QUERY-side sketch must agree on the
    * seed or Hamming ranking silently degrades to noise (no dim-style
    * task-side validation can catch a seed drift, because the code
    * shapes stay identical) — so [[fromBlockStore]]'s default, the
    * IVF pack sketch ([[graft.operators.IvfIndex]] packedBitBuckets)
    * and its query sketch (searchMergedBit) all reference THIS
    * constant rather than repeating the literal.
    */
  val DefaultSeed: Long = 42L

  /** Deterministic seeded hyperplanes, `bits x dim` floats packed
    * row-major (~1 MB at 256 bits x 1024-d) — regenerated identically
    * on any driver/executor from (bits, dim, seed); never persisted,
    * never shuffled. Gaussian components so the sign-bit estimator is
    * the textbook one (uniform hyperplane directions).
    */
  private[graft] def hyperplanes(bits: Int, dim: Int, seed: Long): Array[Float] = {
    val out = new Array[Float](bits * dim)
    java.util.stream.IntStream.range(0, bits).parallel().forEach { b =>
      val rng = new java.util.Random(seed * 0x9E3779B97F4A7C15L + b * 0xBF58476D1CE4E5B9L + 1)
      var t = 0
      while (t < dim) { out(b * dim + t) = rng.nextGaussian().toFloat; t += 1 }
    }
    out
  }

  /** Sketch one row: bit b = sign of dot(v, plane_b) (>= 0 -> 1). */
  private[graft] def encodeRow(data: Array[Float], off: Int, dim: Int,
      planes: Array[Float], bits: Int, out: Array[Long], outOff: Int): Unit = {
    var b = 0
    while (b < bits) {
      var s = 0.0
      var t = 0
      val pOff = b * dim
      while (t < dim) { s += data(off + t) * planes(pOff + t); t += 1 }
      if (s >= 0.0) out(outOff + (b >>> 6)) |= 1L << (b & 63)
      b += 1
    }
  }

  /** Score one sketch block into the per-query heaps: per (query, row),
    * `words` XOR+popcounts, score = cos(pi * hamming / bits). Rows are
    * tiled so the code tile stays cache-resident across the query
    * batch (the [[PqStore.scoreBlock]] loop shape).
    */
  private[graft] def scoreBlock[K](
      heaps: Array[BoundedTopKG[K]],
      block: BitBlock[K],
      qcodes: Array[Long],
      bits: Int): Unit = {
    val w = block.words
    val nq = heaps.length
    val rows = block.rows
    val codes = block.codes
    val ids = block.ids
    val invB = math.Pi / bits
    val tile = math.max(1, 65536 / math.max(1, w * 8))
    var r0 = 0
    while (r0 < rows) {
      val r1 = math.min(rows, r0 + tile)
      var qi = 0
      while (qi < nq) {
        val h = heaps(qi)
        val qOff = qi * w
        var r = r0
        while (r < r1) {
          var ham = 0
          var t = 0
          val cOff = r * w
          while (t < w) {
            ham += java.lang.Long.bitCount(codes(cOff + t) ^ qcodes(qOff + t))
            t += 1
          }
          h.offer(math.cos(ham * invB), ids(r))
          r += 1
        }
        qi += 1
      }
      r0 = r1
    }
  }

  /** Sketch a packed float store block-by-block: no training, no
    * sampling, no shuffle — one seeded-hyperplane map over the packed
    * slabs (the hyperplane matrix is rebuilt per task from the seed,
    * ~1 MB, cheaper than broadcasting for typical shapes).
    */
  def fromBlockStore[K](bs: BlockStore[K], bits: Int = 256,
      seed: Long = DefaultSeed)(implicit
      ct: ClassTag[K], ord: Ordering[K]): BitStore[K] = {
    require(bits >= 1 && bits <= (1 << 16),
      s"bit sketch width must be in [1, 65536], got $bits")
    val b = bits
    val s = seed
    val sketched = bs.blocks.map { blk =>
      val planes = hyperplanes(b, blk.dim, s)
      val w = (b + 63) >>> 6
      val codes = new Array[Long](blk.rows * w)
      var r = 0
      while (r < blk.rows) {
        encodeRow(blk.data, r * blk.dim, blk.dim, planes, b, codes, r * w)
        r += 1
      }
      new BitBlock[K](blk.ids, codes, w, blk.dim)
    }
    new BitStore[K](sketched, bits, seed, bs.normalized, bs)
  }
}
