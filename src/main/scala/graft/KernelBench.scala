package graft
object KernelBench {
  def dot4(q: Array[Double], v: Array[Float]): Double = {
    val n = v.length
    var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
    var i = 0
    val n4 = n - 3
    while (i < n4) {
      s0 += q(i) * v(i)
      s1 += q(i + 1) * v(i + 1)
      s2 += q(i + 2) * v(i + 2)
      s3 += q(i + 3) * v(i + 3)
      i += 4
    }
    while (i < n) { s0 += q(i) * v(i); i += 1 }
    (s0 + s1) + (s2 + s3)
  }

  def dotF(q: Array[Float], v: Array[Float]): Float = {
    val n = v.length
    var s0 = 0f; var s1 = 0f; var s2 = 0f; var s3 = 0f
    var i = 0
    val n4 = n - 3
    while (i < n4) {
      s0 += q(i) * v(i)
      s1 += q(i + 1) * v(i + 1)
      s2 += q(i + 2) * v(i + 2)
      s3 += q(i + 3) * v(i + 3)
      i += 4
    }
    while (i < n) { s0 += q(i) * v(i); i += 1 }
    (s0 + s1) + (s2 + s3)
  }

  def dot1(q: Array[Double], v: Array[Float]): Double = {
    val n = v.length
    var s = 0.0; var i = 0
    while (i < n) { s += q(i) * v(i); i += 1 }
    s
  }

  def main(args: Array[String]): Unit = {
    val dim = 1024
    val nv = 3125   // one partition's share of 100k over 32
    val nq = 1000
    val rng = new java.util.Random(7)
    val vs = Array.fill(nv)(Array.fill(dim)(rng.nextFloat()))
    val qd = Array.fill(nq)(Array.fill(dim)(rng.nextDouble()))
    val qf = qd.map(_.map(_.toFloat))

    def time(label: String)(f: => Double): Unit = {
      var best = Double.MaxValue
      var sink = 0.0
      for (_ <- 0 until 3) {
        val t0 = System.nanoTime()
        sink += f
        val dt = (System.nanoTime() - t0) / 1e9
        if (dt < best) best = dt
      }
      val macs = nv.toLong * nq * dim
      println(f"$label%-12s $best%.3f s   ${macs / best / 1e9}%.2f GMAC/s   (sink=$sink%.1f)")
    }

    time("dot1") {
      var acc = 0.0
      var qi = 0
      while (qi < nq) { val q = qd(qi); var r = 0; while (r < nv) { acc += dot1(q, vs(r)); r += 1 }; qi += 1 }
      acc
    }
    time("dot4") {
      var acc = 0.0
      var qi = 0
      while (qi < nq) { val q = qd(qi); var r = 0; while (r < nv) { acc += dot4(q, vs(r)); r += 1 }; qi += 1 }
      acc
    }
    time("dotF") {
      var acc = 0.0
      var qi = 0
      while (qi < nq) { val q = qf(qi); var r = 0; while (r < nv) { acc += dotF(q, vs(r)); r += 1 }; qi += 1 }
      acc
    }
    println(s"simdAvailable=${graft.operators.Kernels.simdAvailable}")
    time("simd") {
      var acc = 0.0
      var qi = 0
      while (qi < nq) { val q = qf(qi); var r = 0; while (r < nv) { acc += graft.operators.Kernels.dotF(q, vs(r)); r += 1 }; qi += 1 }
      acc
    }
    time("simd4q") {
      var acc = 0.0
      val out = new Array[Float](4)
      var qi = 0
      while (qi + 3 < nq) {
        var r = 0
        while (r < nv) {
          graft.kernels.VectorKernels.dot4(qf(qi), qf(qi + 1), qf(qi + 2), qf(qi + 3), vs(r), out)
          acc += out(0) + out(1) + out(2) + out(3)
          r += 1
        }
        qi += 4
      }
      acc
    }
  }
}
