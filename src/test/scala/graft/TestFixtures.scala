package graft

import graft.core.VdbRecord

/** Shared spec fixtures (round-19 review: the two-cluster corpus was
  * copy-pasted per test; new tests use this instead).
  */
object TestFixtures {

  /** The standard two-planted-cluster corpus: `perCluster` unit vectors
    * around axis 0 tagged `{"c": "a"}` and around axis 4 tagged
    * `{"c": "b"}`, with deterministic jitter from `seed`. Covers every
    * accelerator route: clusters are separable (ANN/graph recall), the
    * tag filter selects exactly one cluster (membership rungs), and
    * both the match set and its complement are equal-sized (bloom
    * forcing via a tiny `graft.ann.filtered.max`).
    */
  def twoClusterRecs(seed: Int, dim: Int = 8,
                     perCluster: Int = 60): Seq[VdbRecord] = {
    val rng = new scala.util.Random(seed)
    def mk(base: Int, tag: String) = (0 until perCluster).map { i =>
      val v = new Array[Float](dim)
      v(base) = 1f
      (0 until dim).foreach(j => v(j) = v(j) + (rng.nextFloat() - 0.5f) * 0.05f)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      VdbRecord(f"$tag$i%03d", v.map(x => (x / n).toFloat),
        s"""{"c": "$tag"}""")
    }
    mk(0, "a") ++ mk(4, "b")
  }
}
