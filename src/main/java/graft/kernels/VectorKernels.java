package graft.kernels;

import jdk.incubator.vector.FloatVector;
import jdk.incubator.vector.VectorOperators;
import jdk.incubator.vector.VectorSpecies;

/**
 * SIMD dot-product kernels (JDK Vector API, jdk.incubator.vector).
 *
 * Mirrors the reference's single BLAS GEMM for query scoring
 * (pico_vdb.py:686-689): on the JVM the same job is a float32 dot
 * product in the innermost loop of the per-partition top-k pass.
 * Loaded reflectively via {@link graft.operators.Kernels} so the
 * engine still runs (scalar fallback) when the JVM was started
 * without {@code --add-modules jdk.incubator.vector}.
 */
public final class VectorKernels {
    // Lane width is tunable (-Dgraft.simd.bits=256|512): on some Xeons,
    // sustained all-core 512-bit FMA trips the AVX-512 frequency license
    // and 256-bit ends up faster in wall-clock.
    private static final VectorSpecies<Float> S = pickSpecies();

    private static VectorSpecies<Float> pickSpecies() {
        String bits = System.getProperty("graft.simd.bits", "");
        if ("256".equals(bits)) return FloatVector.SPECIES_256;
        if ("512".equals(bits)) return FloatVector.SPECIES_512;
        if ("128".equals(bits)) return FloatVector.SPECIES_128;
        return FloatVector.SPECIES_PREFERRED;
    }

    private VectorKernels() {}

    /** Dot product of two equal-length float vectors, float accumulation. */
    public static float dot(float[] q, float[] v) {
        int n = v.length;
        int upper = S.loopBound(n);
        FloatVector acc0 = FloatVector.zero(S);
        FloatVector acc1 = FloatVector.zero(S);
        int step = S.length() * 2;
        int i = 0;
        int upper2 = n - (n % step);
        for (; i < upper2; i += step) {
            acc0 = FloatVector.fromArray(S, q, i).fma(FloatVector.fromArray(S, v, i), acc0);
            acc1 = FloatVector.fromArray(S, q, i + S.length())
                    .fma(FloatVector.fromArray(S, v, i + S.length()), acc1);
        }
        for (; i < upper; i += S.length()) {
            acc0 = FloatVector.fromArray(S, q, i).fma(FloatVector.fromArray(S, v, i), acc0);
        }
        float s = acc0.add(acc1).reduceLanes(VectorOperators.ADD);
        for (; i < n; i++) s += q[i] * v[i];
        return s;
    }

    /** Sum of squares (for L2 norms), float accumulation. */
    public static float normSq(float[] v) {
        return dot(v, v);
    }

    /** Dot product of q against a row embedded in a packed row-major
     *  matrix at offset {@code off} (row length = q.length). */
    public static float dotPacked(float[] q, float[] m, int off) {
        int n = q.length;
        int upper = S.loopBound(n);
        FloatVector acc0 = FloatVector.zero(S);
        FloatVector acc1 = FloatVector.zero(S);
        int step = S.length() * 2;
        int i = 0;
        int upper2 = n - (n % step);
        for (; i < upper2; i += step) {
            acc0 = FloatVector.fromArray(S, q, i).fma(FloatVector.fromArray(S, m, off + i), acc0);
            acc1 = FloatVector.fromArray(S, q, i + S.length())
                    .fma(FloatVector.fromArray(S, m, off + i + S.length()), acc1);
        }
        for (; i < upper; i += S.length()) {
            acc0 = FloatVector.fromArray(S, q, i).fma(FloatVector.fromArray(S, m, off + i), acc0);
        }
        float s = acc0.add(acc1).reduceLanes(VectorOperators.ADD);
        for (; i < n; i++) s += q[i] * m[off + i];
        return s;
    }

    /**
     * Four dot products against one shared packed matrix row: the row is
     * loaded once per lane-step and reused across the 4 query rows,
     * cutting the streamed-side bandwidth 4x. out[0..3] receive results.
     */
    public static void dot4Packed(float[] q0, float[] q1, float[] q2, float[] q3,
                                  float[] m, int off, float[] out) {
        int n = q0.length;
        int upper = S.loopBound(n);
        FloatVector a0 = FloatVector.zero(S);
        FloatVector a1 = FloatVector.zero(S);
        FloatVector a2 = FloatVector.zero(S);
        FloatVector a3 = FloatVector.zero(S);
        int i = 0;
        for (; i < upper; i += S.length()) {
            FloatVector vv = FloatVector.fromArray(S, m, off + i);
            a0 = FloatVector.fromArray(S, q0, i).fma(vv, a0);
            a1 = FloatVector.fromArray(S, q1, i).fma(vv, a1);
            a2 = FloatVector.fromArray(S, q2, i).fma(vv, a2);
            a3 = FloatVector.fromArray(S, q3, i).fma(vv, a3);
        }
        float s0 = a0.reduceLanes(VectorOperators.ADD);
        float s1 = a1.reduceLanes(VectorOperators.ADD);
        float s2 = a2.reduceLanes(VectorOperators.ADD);
        float s3 = a3.reduceLanes(VectorOperators.ADD);
        for (; i < n; i++) {
            float x = m[off + i];
            s0 += q0[i] * x; s1 += q1[i] * x; s2 += q2[i] * x; s3 += q3[i] * x;
        }
        out[0] = s0; out[1] = s1; out[2] = s2; out[3] = s3;
    }

    // int8 path uses fixed 64-bit byte lanes -> 256-bit float lanes so the
    // B2F convertShape is a single full-width part (part-number juggling
    // for SPECIES_PREFERRED=512 isn't worth it: the q8 scan is
    // bandwidth-bound and 8 bytes/step already streams 4x less data than
    // the float path).
    private static final jdk.incubator.vector.VectorSpecies<Byte> B8 =
            jdk.incubator.vector.ByteVector.SPECIES_64;
    private static final VectorSpecies<Float> F8 = FloatVector.SPECIES_256;

    /** Dot of a float query against an int8-coded row at {@code off}
     *  (row length = q.length); caller scales the result. */
    public static float dotQ8(float[] q, byte[] codes, int off) {
        int n = q.length;
        int step = 16;
        int upper2 = n - (n % step);
        FloatVector a0 = FloatVector.zero(F8);
        FloatVector a1 = FloatVector.zero(F8);
        int i = 0;
        for (; i < upper2; i += step) {
            FloatVector c0 = (FloatVector) jdk.incubator.vector.ByteVector
                    .fromArray(B8, codes, off + i)
                    .convertShape(VectorOperators.B2F, F8, 0);
            FloatVector c1 = (FloatVector) jdk.incubator.vector.ByteVector
                    .fromArray(B8, codes, off + i + 8)
                    .convertShape(VectorOperators.B2F, F8, 0);
            a0 = FloatVector.fromArray(F8, q, i).fma(c0, a0);
            a1 = FloatVector.fromArray(F8, q, i + 8).fma(c1, a1);
        }
        float s = a0.add(a1).reduceLanes(VectorOperators.ADD);
        for (; i < n; i++) s += q[i] * codes[off + i];
        return s;
    }

    // wider q8 lanes when the host prefers 512-bit: 16 bytes -> 16
    // floats per convert keeps the FMA width at parity with the float
    // path's preferred species.
    private static final jdk.incubator.vector.VectorSpecies<Byte> B16 =
            jdk.incubator.vector.ByteVector.SPECIES_128;
    private static final VectorSpecies<Float> F16 = FloatVector.SPECIES_512;
    private static final boolean WIDE_Q8 =
            FloatVector.SPECIES_PREFERRED.length() >= 16 &&
            !"256".equals(System.getProperty("graft.simd.bits", ""));

    /** 512-bit q8 4-dot: one 16-byte load + one B2F convert shared by 4
     *  FMA rows per step. */
    public static void dot4Q8Wide(float[] q0, float[] q1, float[] q2, float[] q3,
                                  byte[] codes, int off, float[] out) {
        int n = q0.length;
        int step = 16;
        int upper = n - (n % step);
        FloatVector a0 = FloatVector.zero(F16);
        FloatVector a1 = FloatVector.zero(F16);
        FloatVector a2 = FloatVector.zero(F16);
        FloatVector a3 = FloatVector.zero(F16);
        int i = 0;
        for (; i < upper; i += step) {
            FloatVector c = (FloatVector) jdk.incubator.vector.ByteVector
                    .fromArray(B16, codes, off + i)
                    .convertShape(VectorOperators.B2F, F16, 0);
            a0 = FloatVector.fromArray(F16, q0, i).fma(c, a0);
            a1 = FloatVector.fromArray(F16, q1, i).fma(c, a1);
            a2 = FloatVector.fromArray(F16, q2, i).fma(c, a2);
            a3 = FloatVector.fromArray(F16, q3, i).fma(c, a3);
        }
        float s0 = a0.reduceLanes(VectorOperators.ADD);
        float s1 = a1.reduceLanes(VectorOperators.ADD);
        float s2 = a2.reduceLanes(VectorOperators.ADD);
        float s3 = a3.reduceLanes(VectorOperators.ADD);
        for (; i < n; i++) {
            float x = codes[off + i];
            s0 += q0[i] * x; s1 += q1[i] * x; s2 += q2[i] * x; s3 += q3[i] * x;
        }
        out[0] = s0; out[1] = s1; out[2] = s2; out[3] = s3;
    }

    /** Preferred-width q8 4-dot dispatch. */
    public static void dot4Q8Auto(float[] q0, float[] q1, float[] q2, float[] q3,
                                  byte[] codes, int off, float[] out) {
        if (WIDE_Q8) dot4Q8Wide(q0, q1, q2, q3, codes, off, out);
        else dot4Q8(q0, q1, q2, q3, codes, off, out);
    }

    /** Four dots against one shared int8-coded row: the byte load AND
     *  the B2F conversion happen once per lane-step and are reused
     *  across the 4 query rows — the conversion is the q8 scan's extra
     *  arithmetic vs the float path, so amortizing it 4x brings the
     *  per-element compute back to ~FMA parity while keeping the 4x
     *  bandwidth advantage. out[0..3] receive the unscaled sums. */
    public static void dot4Q8(float[] q0, float[] q1, float[] q2, float[] q3,
                              byte[] codes, int off, float[] out) {
        int n = q0.length;
        int step = 8;
        int upper = n - (n % step);
        FloatVector a0 = FloatVector.zero(F8);
        FloatVector a1 = FloatVector.zero(F8);
        FloatVector a2 = FloatVector.zero(F8);
        FloatVector a3 = FloatVector.zero(F8);
        int i = 0;
        for (; i < upper; i += step) {
            FloatVector c = (FloatVector) jdk.incubator.vector.ByteVector
                    .fromArray(B8, codes, off + i)
                    .convertShape(VectorOperators.B2F, F8, 0);
            a0 = FloatVector.fromArray(F8, q0, i).fma(c, a0);
            a1 = FloatVector.fromArray(F8, q1, i).fma(c, a1);
            a2 = FloatVector.fromArray(F8, q2, i).fma(c, a2);
            a3 = FloatVector.fromArray(F8, q3, i).fma(c, a3);
        }
        float s0 = a0.reduceLanes(VectorOperators.ADD);
        float s1 = a1.reduceLanes(VectorOperators.ADD);
        float s2 = a2.reduceLanes(VectorOperators.ADD);
        float s3 = a3.reduceLanes(VectorOperators.ADD);
        for (; i < n; i++) {
            float x = codes[off + i];
            s0 += q0[i] * x; s1 += q1[i] * x; s2 += q2[i] * x; s3 += q3[i] * x;
        }
        out[0] = s0; out[1] = s1; out[2] = s2; out[3] = s3;
    }

    /**
     * Four dot products against one shared store vector: v is loaded
     * once per lane-step and reused across the 4 query rows, cutting
     * the streamed-side bandwidth 4x (the binding constraint once the
     * FMA chain is vectorized). out[0..3] receive the results.
     */
    public static void dot4(float[] q0, float[] q1, float[] q2, float[] q3,
                            float[] v, float[] out) {
        int n = v.length;
        int upper = S.loopBound(n);
        FloatVector a0 = FloatVector.zero(S);
        FloatVector a1 = FloatVector.zero(S);
        FloatVector a2 = FloatVector.zero(S);
        FloatVector a3 = FloatVector.zero(S);
        int i = 0;
        for (; i < upper; i += S.length()) {
            FloatVector vv = FloatVector.fromArray(S, v, i);
            a0 = FloatVector.fromArray(S, q0, i).fma(vv, a0);
            a1 = FloatVector.fromArray(S, q1, i).fma(vv, a1);
            a2 = FloatVector.fromArray(S, q2, i).fma(vv, a2);
            a3 = FloatVector.fromArray(S, q3, i).fma(vv, a3);
        }
        float s0 = a0.reduceLanes(VectorOperators.ADD);
        float s1 = a1.reduceLanes(VectorOperators.ADD);
        float s2 = a2.reduceLanes(VectorOperators.ADD);
        float s3 = a3.reduceLanes(VectorOperators.ADD);
        for (; i < n; i++) {
            float x = v[i];
            s0 += q0[i] * x; s1 += q1[i] * x; s2 += q2[i] * x; s3 += q3[i] * x;
        }
        out[0] = s0; out[1] = s1; out[2] = s2; out[3] = s3;
    }
}
