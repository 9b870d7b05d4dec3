package graft.tools

/** Driver-side PQ codebook-train microbench (round 22): isolates
  * `PqStore.trainOnRows` at the headline shape (20k sample, 1024-d,
  * m=64, ksub=256, 8 Lloyd iterations) so the subspace-parallel
  * change carries its own measured number, separate from the bench
  * rows that fold in sample collection + the distributed encode.
  * Also asserts two runs produce bit-identical codebooks (the
  * determinism contract the parallel loop must keep). Run by hand:
  * `sbt "runMain graft.tools.PqTrainBench [n] [dim] [m]"`.
  */
object PqTrainBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val dim = args.drop(1).headOption.map(_.toInt).getOrElse(1024)
    val m = args.drop(2).headOption.map(_.toInt).getOrElse(64)
    val rng = new java.util.Random(7)
    val sample = Array.fill(n)(Array.fill(dim)((rng.nextDouble() - 0.5).toFloat))
    var last: graft.core.PqCodebook = null
    (1 to 3).foreach { pass =>
      val t0 = System.nanoTime()
      val cb = graft.core.PqStore.trainOnRows(sample.map(_.clone()), m, 256, 42L, 8)
      println(f"PQTRAINBENCH pass $pass  ${(System.nanoTime() - t0) / 1e9}%6.2f s" +
        f"  (n=$n dim=$dim m=$m ksub=${cb.ksub})")
      if (last != null)
        require(java.util.Arrays.equals(cb.centroids, last.centroids),
          "trainOnRows must be deterministic run-to-run")
      last = cb
    }
    println("PQTRAINBENCH determinism ok")
  }
}
