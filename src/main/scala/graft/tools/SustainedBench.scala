package graft.tools

import java.util.concurrent.{Executors, TimeUnit}

/** Sustained all-core kernel bench: repeats the full 1000q x 100k scan
  * several times on a thread pool and prints per-pass wall time, to
  * expose frequency throttling / hypervisor steal under sustained SIMD
  * load. Run with -Dgraft.simd.bits=256|512 and -Dgraft.bench.threads=N.
  */
object SustainedBench {
  def main(args: Array[String]): Unit = {
    val dim = 1024
    val n = 100000
    val nq = 1000
    val threads = Integer.getInteger("graft.bench.threads", 32).intValue()
    val passes = Integer.getInteger("graft.bench.passes", 8).intValue()
    println(s"threads=$threads simdBits=${System.getProperty("graft.simd.bits", "preferred")} simd=${graft.operators.Kernels.simdAvailable}")

    val parts = threads
    val perPart = n / parts
    val rng = new java.util.Random(7)
    // packed per-partition matrices, like VecBlock
    val mats = Array.fill(parts)(Array.fill(perPart * dim)(rng.nextFloat()))
    val qs = Array.fill(nq)(Array.fill(dim)(rng.nextFloat()))

    val pool = Executors.newFixedThreadPool(threads)
    for (p <- 1 to passes) {
      val t0 = System.nanoTime()
      val futs = mats.map { m =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            val out = new Array[Float](4)
            var acc = 0f
            val tileRows = 128
            var t0r = 0
            while (t0r < perPart) {
              val tEnd = math.min(t0r + tileRows, perPart)
              var qi = 0
              while (qi + 4 <= nq) {
                val q0 = qs(qi); val q1 = qs(qi + 1); val q2 = qs(qi + 2); val q3 = qs(qi + 3)
                var r = t0r
                var off = t0r * dim
                while (r < tEnd) {
                  graft.operators.Kernels.dot4PackedF(q0, q1, q2, q3, m, off, out)
                  acc += out(0) + out(1) + out(2) + out(3)
                  r += 1; off += dim
                }
                qi += 4
              }
              t0r = tEnd
            }
            if (acc == Float.MinValue) println("x")
          }
        })
      }
      futs.foreach(_.get())
      val dt = (System.nanoTime() - t0) / 1e9
      val gmacs = n.toLong * nq * dim / dt / 1e9
      println(f"pass $p%2d  $dt%6.3f s   $gmacs%7.1f GMAC/s")
    }
    pool.shutdown()
    pool.awaitTermination(1, TimeUnit.SECONDS)
  }
}
