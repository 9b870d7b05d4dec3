package graft.tools

import graft.operators.Kernels

/** In-JVM kernel micro-bench (no Spark): per-element throughput of the
  * float dot4 path vs the q8 variants, on a cache-busting slab. Drives
  * kernel selection for graft.core.Q8Store — run by hand:
  * `sbt "runMain graft.tools.Q8KernelBench"`.
  */
object Q8KernelBench {
  def main(args: Array[String]): Unit = {
    val dim = 256
    val rows = 200000 // 200 MB float slab / 50 MB codes: past L3 either way
    val rng = new java.util.Random(7)
    val data = Array.fill(rows * dim)(rng.nextFloat() * 2f - 1f)
    val codes = new Array[Byte](rows * dim)
    var i = 0
    while (i < codes.length) { codes(i) = (rng.nextInt(255) - 127).toByte; i += 1 }
    val qs = Array.fill(4)(Array.fill(dim)(rng.nextFloat() * 2f - 1f))
    val out = new Array[Float](4)
    var sink = 0f

    def time(name: String, reps: Int)(body: => Unit): Unit = {
      body // warmup through C2
      body
      val t0 = System.nanoTime()
      var r = 0
      while (r < reps) { body; r += 1 }
      val dt = (System.nanoTime() - t0) / 1e9
      val elems = rows.toDouble * dim * reps
      println(f"$name%-22s ${dt / reps}%7.3f s/pass  ${elems / dt / 1e9}%6.2f Gelem/s  (4q shared)")
    }

    time("float dot4Packed", 3) {
      var r = 0; var off = 0
      while (r < rows) {
        Kernels.dot4PackedF(qs(0), qs(1), qs(2), qs(3), data, off, out)
        sink += out(0)
        r += 1; off += dim
      }
    }
    time("q8 dot4 (256b)", 3) {
      var r = 0; var off = 0
      while (r < rows) {
        graft.kernels.VectorKernels.dot4Q8(qs(0), qs(1), qs(2), qs(3), codes, off, out)
        sink += out(0)
        r += 1; off += dim
      }
    }
    time("q8 dot4 (512b)", 3) {
      var r = 0; var off = 0
      while (r < rows) {
        graft.kernels.VectorKernels.dot4Q8Wide(qs(0), qs(1), qs(2), qs(3), codes, off, out)
        sink += out(0)
        r += 1; off += dim
      }
    }
    time("q8 dot1 (256b)", 3) {
      var r = 0; var off = 0
      while (r < rows) {
        sink += graft.kernels.VectorKernels.dotQ8(qs(0), codes, off)
        r += 1; off += dim
      }
    }
    println(s"(sink $sink, simd=${Kernels.simdAvailable}, preferred=${
      jdk.incubator.vector.FloatVector.SPECIES_PREFERRED.length()} lanes)")
  }
}
