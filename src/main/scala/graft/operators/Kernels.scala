package graft.operators

/** Dispatch for the hot float32 kernels: SIMD (JDK Vector API) when the
  * JVM was started with `--add-modules jdk.incubator.vector` (build.sbt
  * adds it for forked run/test), scalar multi-accumulator otherwise.
  *
  * Float accumulation matches the reference's float32 GEMM
  * (pico_vdb.py:26, 686-689); exact/oracled paths use the codegen'd
  * double-precision expressions instead, so this kernel only serves the
  * throughput path where scores are rounded before comparison.
  */
object Kernels {

  val simdAvailable: Boolean =
    try {
      Class.forName("jdk.incubator.vector.FloatVector")
      // link + warm the kernel class; throws if the module is absent
      graft.kernels.VectorKernels.dot(Array(1f, 2f), Array(3f, 4f)) == 11f
    } catch { case _: Throwable => false }

  /** Dot product, float accumulation. */
  def dotF(q: Array[Float], v: Array[Float]): Float =
    if (simdAvailable) graft.kernels.VectorKernels.dot(q, v)
    else dotScalar(q, v)

  /** Scalar fallback: 4 independent accumulators break the FP add
    * dependency chain (~4x over a single-accumulator loop).
    */
  def dotScalar(q: Array[Float], v: Array[Float]): Float = {
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

  /** Sum of squares (L2 norm squared), float accumulation. */
  def normSqF(v: Array[Float]): Float =
    if (simdAvailable) graft.kernels.VectorKernels.normSq(v)
    else dotScalar(v, v)

  /** Four dot products sharing one store vector — the bandwidth-optimal
    * shape for batch scoring (store vector loaded once per 4 queries).
    */
  def dot4F(q0: Array[Float], q1: Array[Float], q2: Array[Float],
            q3: Array[Float], v: Array[Float], out: Array[Float]): Unit =
    if (simdAvailable) graft.kernels.VectorKernels.dot4(q0, q1, q2, q3, v, out)
    else {
      out(0) = dotScalar(q0, v); out(1) = dotScalar(q1, v)
      out(2) = dotScalar(q2, v); out(3) = dotScalar(q3, v)
    }

  // ---- packed row-major matrix kernels (graft.core.VecBlock layout) ----

  /** Dot of q against row at `off` in a packed matrix, float accumulation. */
  def dotPackedF(q: Array[Float], m: Array[Float], off: Int): Float =
    if (simdAvailable) graft.kernels.VectorKernels.dotPacked(q, m, off)
    else dotPackedScalar(q, m, off)

  private def dotPackedScalar(q: Array[Float], m: Array[Float], off: Int): Float = {
    val n = q.length
    var s0 = 0f; var s1 = 0f; var s2 = 0f; var s3 = 0f
    var i = 0
    val n4 = n - 3
    while (i < n4) {
      s0 += q(i) * m(off + i)
      s1 += q(i + 1) * m(off + i + 1)
      s2 += q(i + 2) * m(off + i + 2)
      s3 += q(i + 3) * m(off + i + 3)
      i += 4
    }
    while (i < n) { s0 += q(i) * m(off + i); i += 1 }
    (s0 + s1) + (s2 + s3)
  }

  /** Four dots sharing one packed matrix row. */
  def dot4PackedF(q0: Array[Float], q1: Array[Float], q2: Array[Float],
                  q3: Array[Float], m: Array[Float], off: Int,
                  out: Array[Float]): Unit =
    if (simdAvailable) graft.kernels.VectorKernels.dot4Packed(q0, q1, q2, q3, m, off, out)
    else {
      out(0) = dotPackedScalar(q0, m, off); out(1) = dotPackedScalar(q1, m, off)
      out(2) = dotPackedScalar(q2, m, off); out(3) = dotPackedScalar(q3, m, off)
    }

  // ---- int8-quantized row kernels (graft.core.Q8Block layout) ----

  /** Dot of a float query against an int8-coded row at `off` (codes are
    * `round(v/scale)`; caller multiplies the result by the row's scale).
    * SIMD (byte->float convert + FMA) when available, 4-accumulator
    * scalar otherwise. Approximate by construction — exact ranking comes
    * from the rescore stage, never from this kernel.
    */
  def dotQ8F(q: Array[Float], codes: Array[Byte], off: Int): Float =
    if (simdAvailable) graft.kernels.VectorKernels.dotQ8(q, codes, off)
    else dotQ8Scalar(q, codes, off)

  private def dotQ8Scalar(q: Array[Float], codes: Array[Byte], off: Int): Float = {
    val n = q.length
    var s0 = 0f; var s1 = 0f; var s2 = 0f; var s3 = 0f
    var i = 0
    val n4 = n - 3
    while (i < n4) {
      s0 += q(i) * codes(off + i)
      s1 += q(i + 1) * codes(off + i + 1)
      s2 += q(i + 2) * codes(off + i + 2)
      s3 += q(i + 3) * codes(off + i + 3)
      i += 4
    }
    while (i < n) { s0 += q(i) * codes(off + i); i += 1 }
    (s0 + s1) + (s2 + s3)
  }

  /** Four dots sharing one int8-coded row (conversion amortized 4x). */
  def dot4Q8F(q0: Array[Float], q1: Array[Float], q2: Array[Float],
              q3: Array[Float], codes: Array[Byte], off: Int,
              out: Array[Float]): Unit =
    if (simdAvailable)
      graft.kernels.VectorKernels.dot4Q8(q0, q1, q2, q3, codes, off, out)
    else {
      out(0) = dotQ8Scalar(q0, codes, off); out(1) = dotQ8Scalar(q1, codes, off)
      out(2) = dotQ8Scalar(q2, codes, off); out(3) = dotQ8Scalar(q3, codes, off)
    }

  /** Sequential double-accumulated dot against a packed row — bit-identical
    * to the codegen'd DotProduct expression (same accumulation order), so
    * results can hash-match the declarative/oracle path.
    */
  def dotPackedD(q: Array[Float], m: Array[Float], off: Int): Double = {
    val n = q.length
    var s = 0.0
    var i = 0
    while (i < n) { s += q(i).toDouble * m(off + i).toDouble; i += 1 }
    s
  }

  /** Sequential double sum of squares over a packed row — matches the
    * L2NormSq expression's accumulation order.
    */
  def normSqPackedD(m: Array[Float], off: Int, n: Int): Double = {
    var s = 0.0
    var i = 0
    while (i < n) { val x = m(off + i).toDouble; s += x * x; i += 1 }
    s
  }

  /** Sequential double sum of squares of a float vector (L2NormSq parity). */
  def normSqD(v: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < v.length) { val x = v(i).toDouble; s += x * x; i += 1 }
    s
  }
}
