package graft.tools

/** Driver-fit microbench backing SCALING.md's ANN build-cost split:
  * `LocalKMeans.fit` at the 10M-store shape (sampleCap = 20000 points,
  * √N = 3162 lists, 256-d, 8 Lloyd iterations). The ScaleSmoke ANN
  * build phase conflates this driver-side fit with the distributed
  * 10M-row assignment pass; this isolates the fit so the round-9
  * parallel-loop change carries its own measured number. Run by hand:
  * `sbt "runMain graft.tools.FitBench"`.
  */
object FitBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("FITBENCH_N", "20000").toInt
    val k = sys.env.getOrElse("FITBENCH_K", "3162").toInt
    val dim = sys.env.getOrElse("FITBENCH_DIM", "256").toInt
    val rng = new java.util.Random(7)
    val sample = Array.fill(n)(Array.fill(dim)(rng.nextDouble()))
    (1 to 2).foreach { pass =>
      val t0 = System.nanoTime()
      val c = graft.operators.LocalKMeans.fit(sample, k, 8, 42L)
      println(f"FITBENCH pass $pass  ${(System.nanoTime() - t0) / 1e9}%6.1f s  (k=${c.length})")
    }
  }
}
