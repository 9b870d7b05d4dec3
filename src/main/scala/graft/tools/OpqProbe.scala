package graft.tools

import breeze.linalg.{svd, DenseMatrix}
import graft.core.{PqCodebook, PqStore}

/** Round-16 measurement probe: does an OPQ rotation (Ge et al.,
  * "Optimized Product Quantization", CVPR 2013 — learn an orthogonal
  * R minimizing PQ reconstruction error on rotated data, alternating
  * codebook-fit / orthogonal-Procrustes steps) buy recall on THIS
  * repo's corpora shapes before we commit integration complexity?
  *
  * Driver-side only (no Spark): clustered and uniform fixtures,
  * PQ-vs-OPQ ADC-scan recall@10 against the exact double ranking.
  * Inner products are rotation-invariant (R orthogonal), so scoring
  * rotated codes against rotated queries approximates the ORIGINAL
  * dot product — the fp32 rescore tail would stay untouched by an
  * integration. Run by hand; prints one line per configuration.
  */
object OpqProbe {
  private def mkClustered(n: Int, dim: Int, k: Int, jitter: Float,
                          seed: Long): Array[Array[Float]] = {
    val rng = new java.util.Random(seed)
    val centers = Array.fill(k) {
      val c = Array.fill(dim)(rng.nextFloat() - 0.5f)
      val nn = math.sqrt(c.map(x => x.toDouble * x).sum)
      c.map(x => (x / nn).toFloat)
    }
    Array.tabulate(n) { i =>
      val c = centers(i % k)
      val v = Array.tabulate(dim)(j =>
        c(j) + (rng.nextFloat() - 0.5f) * jitter)
      val nn = math.sqrt(v.map(x => x.toDouble * x).sum)
      v.map(x => (x / nn).toFloat)
    }
  }

  private def mkUniform(n: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    val rng = new java.util.Random(seed)
    Array.fill(n) {
      val v = Array.fill(dim)(rng.nextFloat())
      val nn = math.sqrt(v.map(x => x.toDouble * x).sum)
      v.map(x => (x / nn).toFloat)
    }
  }

  private def exactTop(rows: Array[Array[Float]], q: Array[Float],
                       k: Int): Set[Int] =
    rows.zipWithIndex.map { case (v, i) =>
      var s = 0.0
      var j = 0
      while (j < v.length) { s += q(j).toDouble * v(j); j += 1 }
      (i, s)
    }.sortBy(t => (-t._2, t._1)).take(k).map(_._1).toSet

  private def adcTop(book: PqCodebook, codes: Array[Byte],
                     n: Int, q: Array[Float], k: Int): Set[Int] = {
    val tab = book.adcTable(q)
    val m = book.m
    val ksub = book.ksub
    (0 until n).map { r =>
      var s = 0f
      var sub = 0
      while (sub < m) {
        s += tab(sub * ksub + (codes(r * m + sub) & 0xFF))
        sub += 1
      }
      (r, s.toDouble)
    }.sortBy(t => (-t._2, t._1)).take(k).map(_._1).toSet
  }

  private def encodeAll(book: PqCodebook,
                        rows: Array[Array[Float]]): Array[Byte] = {
    val m = book.m
    val out = new Array[Byte](rows.length * m)
    java.util.stream.IntStream.range(0, rows.length).parallel().forEach { r =>
      book.encodeRow(rows(r), 0, out, r * m)
    }
    out
  }

  /** rows · R, with R a d×d breeze matrix (double). */
  private def rotate(rows: Array[Array[Float]],
                     r: DenseMatrix[Double]): Array[Array[Float]] = {
    val d = rows(0).length
    val out = new Array[Array[Float]](rows.length)
    java.util.stream.IntStream.range(0, rows.length).parallel().forEach { i =>
      val v = rows(i)
      val o = new Array[Float](d)
      var c = 0
      while (c < d) {
        var s = 0.0
        var j = 0
        while (j < d) { s += v(j) * r(j, c); j += 1 }
        o(c) = s.toFloat
        c += 1
      }
      out(i) = o
    }
    out
  }

  /** OPQ-NP alternation: returns the learned rotation. */
  private def trainRotation(rows: Array[Array[Float]], m: Int,
                            iters: Int): DenseMatrix[Double] = {
    val n = rows.length
    val d = rows(0).length
    var r = DenseMatrix.eye[Double](d)
    for (_ <- 0 until iters) {
      val y = rotate(rows, r)
      val book = PqStore.trainOnRows(y.map(_.clone), m, 256, 42L, 4)
      val codes = encodeAll(book, y)
      // M = Xᵀ·Ŷ, R = U·Vᵀ (orthogonal Procrustes for min ||XR − Ŷ||)
      val mMat = DenseMatrix.zeros[Double](d, d)
      var i = 0
      while (i < n) {
        val x = rows(i)
        val yh = book.decodeRow(codes, i * m)
        var a = 0
        while (a < d) {
          val xa = x(a).toDouble
          if (xa != 0.0) {
            var b = 0
            while (b < d) { mMat(a, b) += xa * yh(b); b += 1 }
          }
          a += 1
        }
        i += 1
      }
      val svd.SVD(u, _, vt) = svd(mMat)
      r = u * vt
    }
    r
  }

  def main(args: Array[String]): Unit = {
    val n = 20000
    val dim = 256
    val m = 16
    val nq = 200
    val topK = 10
    Seq(
      ("clustered(k=64,jit=0.15)", mkClustered(n, dim, 64, 0.15f, 5L)),
      ("clustered(k=256,jit=0.35)", mkClustered(n, dim, 256, 0.35f, 6L)),
      ("uniform", mkUniform(n, dim, 7L))
    ).foreach { case (label, rows) =>
      val qrng = new java.util.Random(99)
      val queries = Array.fill(nq) {
        // perturbed copies of stored rows — the realistic query shape
        val base = rows(qrng.nextInt(n))
        val v = base.map(x => x + (qrng.nextFloat() - 0.5f) * 0.05f)
        val nn = math.sqrt(v.map(x => x.toDouble * x).sum)
        v.map(x => (x / nn).toFloat)
      }
      val exact = queries.map(q => exactTop(rows, q, topK))

      def recallOf(book: PqCodebook, codes: Array[Byte],
                   qs: Array[Array[Float]]): Double =
        qs.zipWithIndex.map { case (q, i) =>
          adcTop(book, codes, n, q, topK).count(exact(i)).toDouble / topK
        }.sum / qs.length

      var t0 = System.nanoTime()
      val pqBook = PqStore.trainOnRows(rows.map(_.clone), m, 256, 42L, 8)
      val pqCodes = encodeAll(pqBook, rows)
      val pqRecall = recallOf(pqBook, pqCodes, queries)
      val pqSec = (System.nanoTime() - t0) / 1e9

      t0 = System.nanoTime()
      val rot = trainRotation(rows, m, iters = 6)
      val rotRows = rotate(rows, rot)
      val opqBook = PqStore.trainOnRows(rotRows.map(_.clone), m, 256, 42L, 8)
      val opqCodes = encodeAll(opqBook, rotRows)
      val rotQueries = rotate(queries, rot)
      val opqRecall = recallOf(opqBook, opqCodes, rotQueries)
      val opqSec = (System.nanoTime() - t0) / 1e9

      println(f"OPQPROBE $label%-26s m=$m recall@10  PQ ${pqRecall}%.4f " +
        f"(train ${pqSec}%.1f s)  OPQ ${opqRecall}%.4f (train ${opqSec}%.1f s)")
    }
  }
}
